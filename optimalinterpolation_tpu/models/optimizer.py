"""Batched marginal-likelihood hyperparameter optimization.

Replaces the reference's per-cell ``scipy.optimize.minimize(SMLII, x0,
method='CG', jac=True)`` (``/root/reference/2021_paper_production/
GPR_CS2S3.py:166``) with a vmappable L-BFGS (zoom line-search, via optax) over
the 5 log-hyperparameters, gradients from autodiff. Thousands of grid cells
optimize simultaneously: ``vmap`` turns the per-iteration kernel build +
Cholesky into batched MXU work, and ``lax.while_loop``'s batching rule gives
per-cell early stopping (finished cells are frozen via select while the
slowest cells finish).

An ``adam`` method is provided as a fixed-step fallback (useful in bf16 or
when line searches misbehave near non-PSD regions).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from optimalinterpolation_tpu.models import exact_gp
from optimalinterpolation_tpu.ops import kernels as K

__all__ = ["OptimizeConfig", "OptimizeResult", "optimize_mll", "optimize_mll_batch"]


@dataclasses.dataclass(frozen=True)
class OptimizeConfig:
    """Knobs for the per-cell MLL optimization.

    ``max_iters`` bounds the L-BFGS outer iterations (scipy CG in the
    reference runs to its own default tolerances; dozens of iterations with a
    few function evals each — same regime).
    """

    method: str = "lbfgs"  # "lbfgs" | "adam"
    max_iters: int = 60
    grad_tol: float = 1e-4
    adam_lr: float = 0.2  # peak lr; cosine-decayed to 0 over max_iters
    jitter: float = 0.0
    kind: K.Kernel = K.Kernel.MATERN32
    # NLL evaluation backend for the batched path:
    #   "auto"    — on TPU: fused Pallas kernel for N <= 1024, block-tensor
    #               einsum path (ops.blocked_gp) for larger buckets; XLA
    #               elsewhere
    #   "xla"     — vmapped jnp/lax implementation (models.exact_gp)
    #   "pallas"  — force the fused kernel (interpret mode off-TPU: test-only)
    #   "blocked" — force the block-tensor path
    backend: str = "auto"
    # Multi-restart (SURVEY.md section 7 hard part (b)): the MLL has a
    # degenerate noise-only local optimum some cells fall into from the
    # reference x0; restarts re-run the optimization from deterministic
    # log-space offsets and keep the best NLL per cell. 1 = reference
    # behaviour (single scipy-CG-style trajectory from x0).
    restarts: int = 1

    def __post_init__(self):
        if self.method not in ("lbfgs", "adam"):
            raise ValueError(f"unknown method {self.method!r}")
        if self.backend not in ("auto", "xla", "pallas", "blocked"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if not 1 <= self.restarts <= len(_RESTART_OFFSETS):
            raise ValueError(f"restarts must be in [1, {len(_RESTART_OFFSETS)}]")


# Deterministic restart offsets in log-hyperparameter space
# [log ell_x, log ell_y, log ell_t, log sf2, log sn2]:
# 0: the reference x0 itself; 1: longer spatial scales; 2: shorter scales +
# more signal; 3: low-noise high-signal corner.
_RESTART_OFFSETS = (
    (0.0, 0.0, 0.0, 0.0, 0.0),
    (1.0, 1.0, 0.7, 0.0, 0.0),
    (-1.0, -1.0, -0.7, 1.0, 0.0),
    (0.5, 0.5, 0.0, 1.5, -1.5),
)


class OptimizeResult(NamedTuple):
    log_hypers: jax.Array  # (5,) — or (B, 5) from the batched path
    nll: jax.Array  # final negative log marginal likelihood (scalar | (B,))
    iters: jax.Array  # iterations taken (batched: lockstep count, shared)
    converged: jax.Array  # grad-norm tolerance reached (scalar | (B,))


_LBFGS_HISTORY = 8
_LS_MAX_STEPS = 12
_LS_C1 = 1e-4
# Max initial step length in log-hyperparameter space. Uncapped full L-BFGS
# steps can jump into the degenerate noise-only basin (sf2 -> 0, NLL ~6 nats
# worse than the data-fit optimum on typical cells); a <=1-nat first trial
# step keeps the trajectory in the same basin scipy-CG finds, at the cost of
# a few extra iterations.
_MAX_STEP = 1.0


def optimize_mll(
    log_hypers0: jax.Array,
    x: jax.Array,
    y: jax.Array,
    mask: jax.Array,
    config: OptimizeConfig = OptimizeConfig(),
) -> OptimizeResult:
    """Minimize the masked NLL for one padded cell.

    ``y`` must be centered (prior mean subtracted), matching the reference's
    ``SMLII(hypers, inputs, outputs, mX)`` call where the quadratic form uses
    ``y - mX`` (``GPR_CS2S3.py:127``). Thin wrapper over the batched
    optimizer with B = 1 (one implementation to maintain and test).
    """
    r = optimize_mll_batch(
        log_hypers0[None], x[None], y[None], mask[None], config
    )
    return OptimizeResult(
        log_hypers=r.log_hypers[0],
        nll=r.nll[0],
        iters=r.iters if r.iters.ndim == 0 else r.iters[0],
        converged=r.converged[0],
    )


def _resolve_backend(config: OptimizeConfig, n: int, dtype) -> str:
    if config.backend != "auto":
        return config.backend
    from optimalinterpolation_tpu.ops import pallas_gp

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and dtype == jnp.float32:
        if pallas_gp.supported(n):
            return "pallas"
        if n % 128 == 0:
            return "blocked"
    return "xla"


def _batched_fns(config: OptimizeConfig, backend: str, x, y, mask):
    """(value_fn, value_and_grad_fn) mapping (B, 5) log-hypers -> (B,) / (B, 5)."""
    if backend == "pallas":
        from optimalinterpolation_tpu.ops import pallas_gp

        interp = jax.default_backend() != "tpu"

        def value_fn(h):
            return pallas_gp.gp_nll(
                h, x, y, mask, kind=config.kind, jitter=config.jitter,
                interpret=interp,
            )

        def vg_fn(h):
            return pallas_gp.gp_nll_and_grad(
                h, x, y, mask, kind=config.kind, jitter=config.jitter,
                interpret=interp,
            )

        return value_fn, vg_fn

    if backend == "blocked":
        from optimalinterpolation_tpu.ops import blocked_gp

        def value_fn(h):
            return blocked_gp.gp_nll_blocked(
                h, x, y, mask, kind=config.kind, jitter=config.jitter
            )

        def vg_fn(h):
            return blocked_gp.gp_nll_and_grad_blocked(
                h, x, y, mask, kind=config.kind, jitter=config.jitter
            )

        return value_fn, vg_fn

    scalar = lambda h, xi, yi, mi: exact_gp.neg_log_marginal_likelihood(  # noqa: E731
        h, xi, yi, mi, kind=config.kind, jitter=config.jitter
    )
    value_fn = lambda h: jax.vmap(scalar)(h, x, y, mask)  # noqa: E731
    vg_fn = lambda h: jax.vmap(jax.value_and_grad(scalar))(h, x, y, mask)  # noqa: E731
    return value_fn, vg_fn


def _optimize_lbfgs_batched(value_fn, vg_fn, h0, config: OptimizeConfig):
    """Batched L-BFGS over (B, 5) parameters, lockstep with per-cell selects.

    Semantically identical to vmapping :func:`_optimize_lbfgs` (vmap of a
    while_loop IS lockstep-with-select), but expressed batched so the NLL
    evaluations can go through the fused Pallas kernel, which handles its own
    batching and cannot sit under vmap.
    """
    m = _LBFGS_HISTORY
    dt = h0.dtype
    b, nparam = h0.shape

    def direction(grad, s_h, y_h, rho_h, n_st):
        # s_h, y_h: (m, B, P); rho_h: (m, B); n_st: (B,)
        q = grad
        alphas = []
        for k in range(m - 1, -1, -1):
            valid = (k >= (m - n_st))[:, None]  # (B, 1)
            a = rho_h[k][:, None] * jnp.sum(s_h[k] * q, axis=1, keepdims=True)
            a = jnp.where(valid, a, 0.0)
            q = q - a * y_h[k]
            alphas.append((k, a))
        sy = jnp.sum(s_h[m - 1] * y_h[m - 1], axis=1, keepdims=True)
        yy = jnp.sum(y_h[m - 1] * y_h[m - 1], axis=1, keepdims=True)
        gamma = jnp.where(
            jnp.logical_and((n_st > 0)[:, None], yy > 0.0),
            sy / jnp.maximum(yy, 1e-300),
            1.0,
        )
        r = gamma * q
        for k, a in reversed(alphas):
            valid = (k >= (m - n_st))[:, None]
            bb = rho_h[k][:, None] * jnp.sum(y_h[k] * r, axis=1, keepdims=True)
            bb = jnp.where(valid, bb, 0.0)
            r = r + (a - bb) * s_h[k]
        return -r

    def line_search(params, value, grad, d, live, t_carry):
        gd = jnp.sum(grad * d, axis=1)  # (B,)
        dnorm = jnp.linalg.norm(d, axis=1)
        # First trial step: the norm cap, warm-started from ~2x the last
        # accepted step. On hard (large-N, clustered-data) cells the search
        # otherwise re-discovers a small step from t=1 every iteration —
        # measured ~7 wasted NLL evaluations per iteration on real data.
        t0 = jnp.minimum(jnp.asarray(1.0, dt), _MAX_STEP / jnp.maximum(dnorm, 1e-30))
        t0 = jnp.minimum(t0, 2.0 * t_carry)

        def armijo(t, v):
            return v <= value + _LS_C1 * t * gd

        def cond(c):
            t, v, tries = c
            active = jnp.logical_and(live, jnp.logical_not(armijo(t, v)))
            return jnp.any(jnp.logical_and(tries < _LS_MAX_STEPS, active))

        def body(c):
            t, v, tries = c
            active = jnp.logical_and(
                jnp.logical_and(tries < _LS_MAX_STEPS, live),
                jnp.logical_not(armijo(t, v)),
            )
            t2 = jnp.where(active, t * 0.5, t)
            v2 = value_fn(params + t2[:, None] * d)
            v = jnp.where(active, v2, v)
            return t2, v, tries + active.astype(tries.dtype)

        v0 = value_fn(params + t0[:, None] * d)
        t, new_v, _ = jax.lax.while_loop(
            cond, body, (t0, v0, jnp.zeros((b,), jnp.int32))
        )
        ok = armijo(t, new_v)
        return t, new_v, ok

    def cond(carry):
        *_, it, gnorm, stop, _t = carry
        live = jnp.logical_and(gnorm > config.grad_tol, jnp.logical_not(stop))
        return jnp.logical_and(it < config.max_iters, jnp.any(live))

    def body(carry):
        params, value, grad, s_h, y_h, rho_h, n_st, it, gnorm, stop, t_carry = carry
        live = jnp.logical_and(gnorm > config.grad_tol, jnp.logical_not(stop))
        d = direction(grad, s_h, y_h, rho_h, n_st)
        descent = (jnp.sum(grad * d, axis=1) < 0.0)[:, None]
        d = jnp.where(descent, d, -grad)

        t, new_v, ls_ok = line_search(params, value, grad, d, live, t_carry)
        new_p = params + t[:, None] * d
        _, new_g = vg_fn(new_p)
        g_ok = jnp.all(jnp.isfinite(new_g), axis=1)
        accept = jnp.logical_and(jnp.logical_and(ls_ok, g_ok), live)

        s = new_p - params
        yv = new_g - grad
        sy = jnp.sum(s * yv, axis=1)
        keep = jnp.logical_and(accept, sy > 1e-30)[:, None]  # (B, 1)
        s_h2 = jnp.concatenate([s_h[1:], s[None]], axis=0)
        y_h2 = jnp.concatenate([y_h[1:], yv[None]], axis=0)
        rho2 = jnp.concatenate(
            [rho_h[1:], (1.0 / jnp.maximum(sy, 1e-300))[None]], axis=0
        )
        s_h = jnp.where(keep[None], s_h2, s_h)
        y_h = jnp.where(keep[None], y_h2, y_h)
        rho_h = jnp.where(keep[None, :, 0], rho2, rho_h)
        n_st = jnp.where(keep[:, 0], jnp.minimum(n_st + 1, m), n_st)

        acc2 = accept[:, None]
        params = jnp.where(acc2, new_p, params)
        value = jnp.where(accept, new_v, value)
        grad = jnp.where(acc2, new_g, grad)
        gnorm = jnp.where(live, jnp.linalg.norm(grad, axis=1), gnorm)
        stop = jnp.where(live, jnp.logical_not(accept), stop)
        t_carry = jnp.where(accept, t, t_carry)
        return params, value, grad, s_h, y_h, rho_h, n_st, it + 1, gnorm, stop, t_carry

    v0, g0 = vg_fn(h0)
    g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)
    init = (
        h0,
        v0,
        g0,
        jnp.zeros((m, b, nparam), dt),
        jnp.zeros((m, b, nparam), dt),
        jnp.zeros((m, b), dt),
        jnp.zeros((b,), jnp.int32),
        jnp.asarray(0),
        jnp.linalg.norm(g0, axis=1),
        jnp.logical_not(jnp.isfinite(v0)),
        jnp.ones((b,), dt),  # t_carry
    )
    params, value, grad, *_, iters, gnorm, _stop, _t = jax.lax.while_loop(cond, body, init)
    its = jnp.full((b,), iters)
    return params, value, its, gnorm <= config.grad_tol


def _optimize_adam_batched(vg_fn, h0, config: OptimizeConfig):
    opt = optax.adam(optax.cosine_decay_schedule(config.adam_lr, config.max_iters))

    def body(carry, _):
        params, state = carry
        value, grad = vg_fn(params)
        grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
        updates, state = opt.update(grad, state, params)
        params = optax.apply_updates(params, updates)
        return (params, state), jnp.linalg.norm(grad, axis=1)

    (params, _), gnorms = jax.lax.scan(
        body, (h0, opt.init(h0)), None, length=config.max_iters
    )
    b = h0.shape[0]
    its = jnp.full((b,), config.max_iters)
    return params, None, its, gnorms[-1] <= config.grad_tol


@partial(jax.jit, static_argnames=("config", "backend"))
def _optimize_mll_batch_impl(log_hypers0, x, y, mask, config, backend):
    value_fn, vg_fn = _batched_fns(config, backend, x, y, mask)
    if config.method == "lbfgs":
        params, value, iters, converged = _optimize_lbfgs_batched(
            value_fn, vg_fn, log_hypers0, config
        )
    else:
        params, value, iters, converged = _optimize_adam_batched(
            vg_fn, log_hypers0, config
        )
    return OptimizeResult(params, value_fn(params), iters, converged)


def optimize_mll_batch(
    log_hypers0: jax.Array,  # (B, 5)
    x: jax.Array,  # (B, N, d)
    y: jax.Array,  # (B, N) centered
    mask: jax.Array,  # (B, N)
    config: OptimizeConfig = OptimizeConfig(),
) -> OptimizeResult:
    """Batched MLL optimization over a bucket of cells.

    This is the TPU replacement for the reference's MPI task farm
    (``GPR_CS2S3.py:248-262``): all cells in the bucket advance one L-BFGS
    iteration per step as one batched kernel-build + batched Cholesky —
    through the fused Pallas kernel on TPU (``backend="auto"``), the
    block-tensor einsum path for the largest buckets, or the vmapped XLA NLL
    otherwise. With ``config.restarts > 1`` every cell is optimized from
    several deterministic initializations (stacked into the batch) and the
    best NLL wins.
    """
    backend = _resolve_backend(config, x.shape[1], x.dtype)
    r = config.restarts
    if r == 1:
        return _optimize_mll_batch_impl(log_hypers0, x, y, mask, config, backend)

    b = log_hypers0.shape[0]
    offs = jnp.asarray(_RESTART_OFFSETS[:r], log_hypers0.dtype)  # (R, 5)
    h0 = (log_hypers0[None, :, :] + offs[:, None, :]).reshape(r * b, -1)
    tile = lambda a: jnp.concatenate([a] * r, axis=0)  # noqa: E731
    res = _optimize_mll_batch_impl(h0, tile(x), tile(y), tile(mask), config, backend)
    nll = res.nll.reshape(r, b)
    nll_for_pick = jnp.where(jnp.isfinite(nll), nll, jnp.inf)
    best = jnp.argmin(nll_for_pick, axis=0)  # (B,)
    pick = lambda a: a.reshape((r, b) + a.shape[1:])[best, jnp.arange(b)]  # noqa: E731
    return OptimizeResult(
        log_hypers=pick(res.log_hypers),
        nll=pick(res.nll),
        iters=res.iters if res.iters.ndim == 0 else pick(res.iters),
        converged=pick(res.converged),
    )
