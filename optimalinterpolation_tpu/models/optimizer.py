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
import os
import sys
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from optimalinterpolation_tpu.models import exact_gp
from optimalinterpolation_tpu.ops import kernels as K

__all__ = [
    "OptimizeConfig",
    "OptimizeResult",
    "optimize_mll",
    "optimize_mll_batch",
    "optimize_mll_chunked",
    "launch_tiles",
    "TILE_MENU",
]


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
    # Plateau stop: a cell stops once ``ftol_patience`` consecutive accepted
    # L-BFGS steps each improve the NLL by less than ``ftol_abs`` nats.
    # 0.0 disables it (run to grad_tol/max_iters, the reference-strict mode).
    # Production cells have NLLs of O(1e3) nats and sit in flat basins where
    # the gradient norm stays above any reasonable grad_tol for tens of
    # iterations while the NLL moves by < 1e-2 nats — far below any effect
    # on the predictions (see tests/test_optimizer.py plateau test).
    ftol_abs: float = 0.0
    ftol_patience: int = 3
    adam_lr: float = 0.2  # peak lr; cosine-decayed to 0 over max_iters
    jitter: float = 0.0
    kind: K.Kernel = K.Kernel.MATERN32
    # NLL evaluation backend for the batched path:
    #   "auto"    — Nystrom objective for N >= nystroem_min_n; on TPU: fused
    #               Pallas kernel for N <= 1024, block-tensor einsum path
    #               (ops.blocked_gp) for larger buckets; XLA elsewhere
    #   "xla"     — vmapped jnp/lax implementation (models.exact_gp)
    #   "pallas"  — force the fused kernel (interpret mode off-TPU: test-only)
    #   "blocked" — force the block-tensor path
    #   "nystroem" — force the rank-M approximate objective (ops.nystroem_gp)
    backend: str = "auto"
    # Nystrom-objective routing (the reference's own large-n answer,
    # GP_example.ipynb cell-5): buckets with N >= nystroem_min_n optimize the
    # rank-nystroem_m approximate marginal likelihood (O(N M^2), all MXU
    # matmuls) instead of the exact O(N^3) one; prediction stays exact.
    # 0 disables. Routed only when N >= 2 * nystroem_m (below that the exact
    # objective is comparably cheap and strictly better). OI_NYSTROEM_MIN_N
    # overrides the threshold end-to-end without code edits (like
    # OI_BLOCKED_MIN_N); hyper/prediction parity vs the exact objective is
    # pinned in tests/test_nystroem_backend.py.
    # Default 1024 (lowered from 2048 in r3): the v5e A/B on the real N=1024
    # bucket (tools/r3_n1024.py, warm reps) measured the m=512 objective
    # 3.1x faster than the exact blocked fine pass (18.3 s vs 57.2 s for
    # 2024 cells from a shared n=512 warm start) at ~0.7 nats mean exact-NLL
    # cost, and the end-to-end pipeline A/B (tools/r3_ab.py, scale 0.12)
    # held rmse_vs_truth within 0.1 mm (0.01212 -> 0.01220). The exact
    # N=1024 fine pass was 46% of the full-scale daily field (VERDICT r2).
    nystroem_min_n: int = 1024
    nystroem_m: int = 512
    # Multi-restart (SURVEY.md section 7 hard part (b)): the MLL has a
    # degenerate noise-only local optimum some cells fall into from the
    # reference x0; restarts re-run the optimization from deterministic
    # log-space offsets and keep the best NLL per cell. 1 = reference
    # behaviour (single scipy-CG-style trajectory from x0).
    restarts: int = 1

    def __post_init__(self):
        if self.method not in ("lbfgs", "adam"):
            raise ValueError(f"unknown method {self.method!r}")
        if self.backend not in ("auto", "xla", "pallas", "blocked", "nystroem"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.nystroem_m % 128 != 0:
            raise ValueError("nystroem_m must be a multiple of 128")
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


def blocked_min_n() -> int:
    """Crossover size above which auto routing prefers the blocked einsum
    backend over the fused Pallas kernel (v5e-measured default 512). The
    microbench behind the default excluded per-launch overheads, so
    OI_BLOCKED_MIN_N exists to A/B the crossover end-to-end without code
    edits (e.g. =2049 restores pallas-first routing). The pipeline's chunk
    memory model (pipeline.daily._chunk_rows) keys off the same value."""
    return int(os.environ.get("OI_BLOCKED_MIN_N", "512"))


def routed_nystroem_m(config: OptimizeConfig, n: int) -> int:
    """The Nystrom rank this problem size will optimize with under auto
    routing (0 = exact objective). Exposed for pipeline.daily's chunk memory
    model and stats tagging."""
    if config.backend == "nystroem":
        return config.nystroem_m
    if config.backend != "auto":
        return 0
    env = os.environ.get("OI_NYSTROEM_MIN_N")
    min_n = int(env) if env is not None else config.nystroem_min_n
    if min_n and n >= min_n and n >= 2 * config.nystroem_m:
        return config.nystroem_m
    return 0


def _resolve_backend(config: OptimizeConfig, n: int, dtype) -> str:
    m = routed_nystroem_m(config, n)
    if m:
        return f"nystroem:{m}"
    if config.backend != "auto":
        return config.backend
    from optimalinterpolation_tpu.ops import pallas_gp

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and dtype == jnp.float32:
        # Measured on v5e (ms/cell-iter, NLL+grad): the block-tensor einsum
        # path beats the fused Pallas kernel at every production size —
        # 0.063 vs 0.091 at N=512, 0.215 vs 0.427 at N=1024 (XLA batches
        # each block matmul across ALL cells of the chunk, while the fused
        # kernel's serial per-128-block chain limits it to its cell tile).
        # The fused kernel keeps the small-N sizes where one cell's whole
        # problem fits VMEM and einsum fixed costs dominate.
        if n % 128 == 0 and n >= blocked_min_n():
            return "blocked"
        if pallas_gp.supported(n):
            return "pallas"
        if n % 128 == 0:
            return "blocked"
    return "xla"


def _batched_fns(kind: K.Kernel, jitter: float, backend: str, x, y, mask):
    """(value_fn, value_and_grad_fn, factor_pair) for (B, 5) log-hypers.

    ``factor_pair`` is ``(value_and_factors_fn, grad_from_factors_fn)`` on
    backends whose factorization can be reused (blocked), else ``None``: the
    L-BFGS line search's last value evaluation is at the accepted iterate, so
    the follow-up gradient can reuse that evaluation's Cholesky instead of
    refactorizing — one fewer O(N^3) factorization per accepted iteration.
    The fused Pallas kernel keeps its factorization VMEM-resident (never
    written to HBM, the whole point of the fusion), so it cannot export one.

    Keyed by (kind, jitter, backend) only — convergence knobs are TRACED
    runtime values (see ``_Knobs``), so warm-start cascade stages, the fine
    pass, and season-chained runs with different tolerances all share one
    compiled executable per launch shape. On the tunneled TPU runtime each
    distinct executable costs ~10-40 s of per-process load on first
    execution (measured; independent of the persistent compile cache), so
    executable count — not compile time — is what this factoring minimizes.
    """
    if backend == "pallas":
        from optimalinterpolation_tpu.ops import pallas_gp

        interp = jax.default_backend() != "tpu"

        def value_fn(h):
            return pallas_gp.gp_nll(
                h, x, y, mask, kind=kind, jitter=jitter, interpret=interp,
            )

        def vg_fn(h):
            return pallas_gp.gp_nll_and_grad(
                h, x, y, mask, kind=kind, jitter=jitter, interpret=interp,
            )

        return value_fn, vg_fn, None

    if backend.startswith("nystroem:"):
        from optimalinterpolation_tpu.ops import nystroem_gp

        m_ind = int(backend.split(":", 1)[1])

        def value_fn(h):
            return nystroem_gp.gp_nll_nystroem(
                h, x, y, mask, m_ind, kind=kind, jitter=jitter
            )

        def vg_fn(h):
            return nystroem_gp.gp_nll_and_grad_nystroem(
                h, x, y, mask, m_ind, kind=kind, jitter=jitter
            )

        return value_fn, vg_fn, None

    if backend == "blocked":
        from optimalinterpolation_tpu.ops import blocked_gp

        def value_fn(h):
            return blocked_gp.gp_nll_blocked(
                h, x, y, mask, kind=kind, jitter=jitter
            )

        def vg_fn(h):
            return blocked_gp.gp_nll_and_grad_blocked(
                h, x, y, mask, kind=kind, jitter=jitter
            )

        def vf_fn(h):
            return blocked_gp.gp_nll_blocked_with_factors(
                h, x, y, mask, kind=kind, jitter=jitter
            )

        def gf_fn(h, factors):
            return blocked_gp.gp_grad_blocked_from_factors(
                h, x, y, mask, factors, kind=kind, jitter=jitter
            )

        return value_fn, vg_fn, (vf_fn, gf_fn)

    scalar = lambda h, xi, yi, mi: exact_gp.neg_log_marginal_likelihood(  # noqa: E731
        h, xi, yi, mi, kind=kind, jitter=jitter
    )
    value_fn = lambda h: jax.vmap(scalar)(h, x, y, mask)  # noqa: E731
    vg_fn = lambda h: jax.vmap(jax.value_and_grad(scalar))(h, x, y, mask)  # noqa: E731
    return value_fn, vg_fn, None


class _Knobs(NamedTuple):
    """Traced convergence knobs (see ``_batched_fns`` on why not static)."""

    grad_tol: jax.Array  # ()
    ftol_abs: jax.Array  # ()
    patience: jax.Array  # () int32

    @staticmethod
    def of(config: "OptimizeConfig", dtype) -> "_Knobs":
        return _Knobs(
            grad_tol=jnp.asarray(config.grad_tol, dtype),
            ftol_abs=jnp.asarray(config.ftol_abs, dtype),
            patience=jnp.asarray(config.ftol_patience, jnp.int32),
        )


class LbfgsState(NamedTuple):
    """Full per-cell L-BFGS state, resumable across program launches.

    Every field's leading batch axis is independent per cell (all updates are
    row-wise selects), so rows can be gathered/compacted/re-packed between
    segments without changing any cell's trajectory — that is what
    :func:`optimize_mll_chunked` exploits to stop paying lockstep time for
    converged cells.
    """

    params: jax.Array  # (B, P)
    value: jax.Array  # (B,) NLL at params (kept in sync on acceptance)
    grad: jax.Array  # (B, P)
    s_h: jax.Array  # (m, B, P) history of steps
    y_h: jax.Array  # (m, B, P) history of gradient differences
    rho_h: jax.Array  # (m, B)
    n_st: jax.Array  # (B,) int32 history fill count
    it_cell: jax.Array  # (B,) int32 iterations this cell has advanced
    gnorm: jax.Array  # (B,)
    stop: jax.Array  # (B,) bool: line-search failure / nonfinite start
    t_carry: jax.Array  # (B,) last accepted step length (line-search warm start)
    plateau: jax.Array  # (B,) int32 consecutive sub-ftol_abs improvements

    def live(self, knobs: "_Knobs") -> jax.Array:
        going = jnp.logical_and(self.gnorm > knobs.grad_tol, jnp.logical_not(self.stop))
        return jnp.logical_and(going, self.plateau < knobs.patience)

    def converged_mask(self, knobs: "_Knobs") -> jax.Array:
        return jnp.logical_or(
            self.gnorm <= knobs.grad_tol, self.plateau >= knobs.patience
        )


def _lbfgs_init(vg_fn, h0) -> LbfgsState:
    m = _LBFGS_HISTORY
    b, nparam = h0.shape
    dt = h0.dtype
    v0, g0 = vg_fn(h0)
    g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)
    return LbfgsState(
        params=h0,
        value=v0,
        grad=g0,
        s_h=jnp.zeros((m, b, nparam), dt),
        y_h=jnp.zeros((m, b, nparam), dt),
        rho_h=jnp.zeros((m, b), dt),
        n_st=jnp.zeros((b,), jnp.int32),
        it_cell=jnp.zeros((b,), jnp.int32),
        gnorm=jnp.linalg.norm(g0, axis=1),
        stop=jnp.logical_not(jnp.isfinite(v0)),
        t_carry=jnp.ones((b,), dt),
        plateau=jnp.zeros((b,), jnp.int32),
    )


def _lbfgs_segment(value_fn, vg_fn, state: LbfgsState, knobs: _Knobs,
                   seg_iters, pair=None) -> LbfgsState:
    """Advance every live cell by up to ``seg_iters`` (traced) iterations.

    With ``pair = (value_and_factors_fn, grad_from_factors_fn)`` (the blocked
    backend), the line search carries each trial evaluation's factorization
    and the post-search gradient reuses the accepted iterate's factors — one
    fewer O(N^3) factorization per iteration. Same math as refactorizing at
    the accepted point (tests pin the two within last-ulp compilation
    differences), so the trajectory is unchanged."""
    m = _LBFGS_HISTORY
    dt = state.params.dtype
    b, nparam = state.params.shape

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
            t, v, tries = c[0], c[1], c[2]
            active = jnp.logical_and(live, jnp.logical_not(armijo(t, v)))
            return jnp.any(jnp.logical_and(tries < _LS_MAX_STEPS, active))

        def body(c):
            t, v, tries = c[0], c[1], c[2]
            active = jnp.logical_and(
                jnp.logical_and(tries < _LS_MAX_STEPS, live),
                jnp.logical_not(armijo(t, v)),
            )
            t2 = jnp.where(active, t * 0.5, t)
            if pair is None:
                v2 = value_fn(params + t2[:, None] * d)
                tail = ()
            else:
                # Inactive cells re-evaluate at their unchanged point, so
                # taking the new factors wholesale keeps every cell's carried
                # factors consistent with its current trial iterate.
                v2, f2 = pair[0](params + t2[:, None] * d)
                tail = (f2,)
            v = jnp.where(active, v2, v)
            return (t2, v, tries + active.astype(tries.dtype)) + tail

        if pair is None:
            v0 = value_fn(params + t0[:, None] * d)
            tail0 = ()
        else:
            v0, f0 = pair[0](params + t0[:, None] * d)
            tail0 = (f0,)
        out = jax.lax.while_loop(
            cond, body, (t0, v0, jnp.zeros((b,), jnp.int32)) + tail0
        )
        t, new_v = out[0], out[1]
        ok = armijo(t, new_v)
        return t, new_v, ok, (out[3] if pair is not None else None)

    def cond(carry):
        st, it = carry
        return jnp.logical_and(it < seg_iters, jnp.any(st.live(knobs)))

    def body(carry):
        st, it = carry
        params, value, grad = st.params, st.value, st.grad
        s_h, y_h, rho_h, n_st = st.s_h, st.y_h, st.rho_h, st.n_st
        gnorm, stop, t_carry = st.gnorm, st.stop, st.t_carry
        live = st.live(knobs)
        d = direction(grad, s_h, y_h, rho_h, n_st)
        descent = (jnp.sum(grad * d, axis=1) < 0.0)[:, None]
        d = jnp.where(descent, d, -grad)

        t, new_v, ls_ok, factors = line_search(params, value, grad, d, live, t_carry)
        new_p = params + t[:, None] * d
        if pair is None:
            _, new_g = vg_fn(new_p)
        else:
            # The line search's final evaluation was at new_p (per cell);
            # reuse its factorization instead of refactorizing.
            new_g = pair[1](new_p, factors)
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
        # Plateau accounting: accepted steps with < ftol_abs improvement
        # count up; a real improvement resets the counter.
        small = (value - new_v) < knobs.ftol_abs
        plateau = jnp.where(
            accept, jnp.where(small, st.plateau + 1, 0), st.plateau
        )
        params = jnp.where(acc2, new_p, params)
        value = jnp.where(accept, new_v, value)
        grad = jnp.where(acc2, new_g, grad)
        gnorm = jnp.where(live, jnp.linalg.norm(grad, axis=1), gnorm)
        stop = jnp.where(live, jnp.logical_not(accept), stop)
        t_carry = jnp.where(accept, t, t_carry)
        it_cell = st.it_cell + live.astype(jnp.int32)
        new_st = LbfgsState(
            params, value, grad, s_h, y_h, rho_h, n_st, it_cell, gnorm, stop,
            t_carry, plateau,
        )
        return new_st, it + 1

    out, _ = jax.lax.while_loop(cond, body, (state, jnp.asarray(0)))
    return out


def _blank_state(h0) -> LbfgsState:
    """A shape/dtype template state for the ``fresh=True`` branch of
    :func:`_lbfgs_sweep_impl` (contents other than ``params`` are ignored —
    the init branch rebuilds everything from ``params``)."""
    m = _LBFGS_HISTORY
    b, nparam = h0.shape
    dt = h0.dtype
    z = jnp.zeros
    return LbfgsState(
        params=h0, value=z((b,), dt), grad=z((b, nparam), dt),
        s_h=z((m, b, nparam), dt), y_h=z((m, b, nparam), dt),
        rho_h=z((m, b), dt), n_st=z((b,), jnp.int32),
        it_cell=z((b,), jnp.int32), gnorm=z((b,), dt),
        stop=z((b,), bool), t_carry=jnp.ones((b,), dt),
        plateau=z((b,), jnp.int32),
    )


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
def _adam_run_impl(log_hypers0, x, y, mask, config, backend):
    value_fn, vg_fn, _pair = _batched_fns(config.kind, config.jitter, backend, x, y, mask)
    params, _, iters, converged = _optimize_adam_batched(
        vg_fn, log_hypers0, config
    )
    return OptimizeResult(params, value_fn(params), iters, converged)


@partial(jax.jit, static_argnames=("kind", "jitter", "backend"))
def _lbfgs_sweep_impl(state, x, y, mask, fresh, knobs, seg_iters,
                      kind, jitter, backend):
    """One segment-sweep program: optionally (re)initialize from
    ``state.params`` (``fresh`` is a traced bool — both branches live in ONE
    executable, halving per-process program loads vs a separate init
    program), then advance live cells by up to ``seg_iters`` iterations."""
    value_fn, vg_fn, pair = _batched_fns(kind, jitter, backend, x, y, mask)
    st = jax.lax.cond(
        fresh, lambda s: _lbfgs_init(vg_fn, s.params), lambda s: s, state
    )
    return _lbfgs_segment(value_fn, vg_fn, st, knobs, seg_iters, pair=pair)


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

    def run(h0, xi, yi, mi):
        if config.method == "lbfgs":
            # Whole-run = ONE sweep with fresh init and seg_iters =
            # max_iters: the SAME executable as optimize_mll_chunked's
            # segment sweeps at this launch shape (identical math — the
            # sweep's fresh branch is exactly init + segment), so the
            # monolithic and segmented paths stop costing separate
            # per-process program loads on the tunneled TPU runtime.
            knobs = _Knobs.of(config, h0.dtype)
            st = _lbfgs_sweep_impl(
                _blank_state(h0), xi, yi, mi, jnp.asarray(True), knobs,
                jnp.asarray(config.max_iters, jnp.int32),
                config.kind, config.jitter, backend,
            )
            return OptimizeResult(
                st.params, st.value, st.it_cell, st.converged_mask(knobs)
            )
        return _adam_run_impl(h0, xi, yi, mi, config, backend)

    r = config.restarts
    if r == 1:
        return run(log_hypers0, x, y, mask)

    b = log_hypers0.shape[0]
    offs = jnp.asarray(_RESTART_OFFSETS[:r], log_hypers0.dtype)  # (R, 5)
    h0 = (log_hypers0[None, :, :] + offs[:, None, :]).reshape(r * b, -1)
    tile = lambda a: jnp.concatenate([a] * r, axis=0)  # noqa: E731
    res = run(h0, tile(x), tile(y), tile(mask))
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


# ---------------------------------------------------------------------------
# Segmented + compacted driver (the production pass-1 path)
# ---------------------------------------------------------------------------

# Launch-tile size menu. Deliberately COARSE (powers of 4, not 2): every
# (program, tile, N) triple is a distinct executable, and on the tunneled
# TPU runtime each distinct executable costs ~10-40 s of per-process load on
# its first execution (measured; independent of the persistent compile
# cache). Halving the menu halves that fixed cost per process; the price is
# a few extra launches per sweep (up to 3 per level, ~0.3 s each warm).
TILE_MENU = (8, 32, 128, 512, 2048)


def launch_tiles(n: int, cap: int):
    """Yield (start, size) launch tiles covering ``n`` rows.

    Sizes come from ``TILE_MENU`` trimmed to ``cap``, greedy largest-fitting
    first, with one final padded 8-row tile for any remainder — so compiled
    program shapes form a small fixed set shared across days/runs/compaction
    states, while padding waste stays < 8 rows (an up-quantized single chunk
    can waste up to 50%: 1080 live cells in one 2048-row launch is 47%
    padding; this yields 512+512+32+8x3 instead).
    """
    sizes = [t for t in reversed(TILE_MENU) if t <= cap] or [8]
    menu_asc = sorted(sizes)
    s = 0
    for size in sizes:
        while n - s >= size:
            yield s, size
            s += size
        r = n - s
        if r > 0:
            # Roll the tail into ONE padded tile when padding stays under
            # half the real rows (fit <= 1.5r): launches cost real time in
            # the tunnel's degraded phases, padded rows converge in
            # lockstep with their duplicated source row.
            fit = next((t for t in menu_asc if t >= r), None)
            if fit is not None and 2 * fit <= 3 * r:
                yield s, fit
                return
    if n - s > 0:
        yield s, 8


# Host-side state layout: batch axis first for row gather/scatter. These
# fields are (m, B, ...) on device.
_HIST_FIELDS = ("s_h", "y_h", "rho_h")


def _state_to_host(st: LbfgsState) -> dict:
    # ONE pytree fetch: jax.device_get issues copy_to_host_async on every
    # leaf BEFORE blocking, so the 12 state fields pay one tunnel round-trip
    # latency instead of 12 sequential ones. Measured on the tunneled TPU
    # runtime (r5 OI_OPT_TRACE): per-field np.asarray cost a flat ~0.29 s
    # PER LAUNCH regardless of rows — the dominant per-launch cost of every
    # segmented stage (launches are many, state is ~100 KB).
    d = jax.device_get(st._asdict())
    for k in _HIST_FIELDS:
        d[k] = np.moveaxis(d[k], 1, 0)  # (B, m, ...)
    return d


def _host_rows_to_state(host: dict, rows: np.ndarray) -> LbfgsState:
    d = {k: v[rows] for k, v in host.items()}
    for k in _HIST_FIELDS:
        d[k] = np.moveaxis(d[k], 0, 1)  # back to (m, B, ...)
    # ONE pytree upload (uncommitted, default device — history fields must
    # NOT get an axis-0 cells sharding; jit/GSPMD reshards as needed): 12
    # per-field transfers each pay tunnel dispatch latency, one batched
    # device_put pays it once (see _state_to_host on the fetch side).
    return LbfgsState(
        **jax.device_put({k: np.ascontiguousarray(v) for k, v in d.items()})
    )


def _writeback(host: dict, rows: np.ndarray, st: LbfgsState) -> None:
    n = rows.size
    out = jax.device_get(st._asdict())  # one async-batched fetch (see above)
    for k, v in out.items():
        if k in _HIST_FIELDS:
            v = np.moveaxis(v, 1, 0)
        host[k][rows] = v[:n]


# Leading segment lengths for optimize_mll_chunked's sweeps (see the
# in-loop comment): sweep k runs _SEG_SCHEDULE[k] iterations, later sweeps
# the caller's segment_iters. Warm-rep A/Bs at scale 0.12 measured the
# dominant warm-started stage (opt:n1024:m512, ~1740 cells) at 29.9 s
# with full-length first sweeps, 22.1 s with a 4-iteration first sweep,
# and 16.2 s with a 1-iteration first sweep (eff 0.48 -> 0.64 -> 0.90),
# with cold (seed) and cascade stages unchanged — converged-at-init cells
# exit after one cheap sweep and the stragglers compact into narrow
# chunks. The second entry (4) catches the median-~4-iteration bulk of
# cascade stages before the full-length straggler sweeps.
# OI_SEG_SCHEDULE="a,b,..." overrides for hardware A/Bs (resolved at call
# time, so setting it after import works — VERDICT r4 weak #4).
def _seg_schedule() -> tuple:
    return tuple(
        int(x) for x in os.environ.get("OI_SEG_SCHEDULE", "1,4").split(",") if x
    )


def optimize_mll_chunked(
    log_hypers0: np.ndarray,  # (B, 5)
    x: np.ndarray,  # (B, N, d)
    y: np.ndarray,  # (B, N) centered
    mask: np.ndarray,  # (B, N)
    config: OptimizeConfig,
    chunk_rows: int,
    segment_iters: int = 10,
    sharding=None,
    lead_schedule: tuple | None = None,
) -> OptimizeResult:
    """Host-driven segmented L-BFGS with compaction of converged cells.

    Runs the lockstep batched L-BFGS in fixed-shape chunks of
    ``chunk_rows`` cells, ``segment_iters`` iterations per program launch.
    Between segments, converged/stopped cells are dropped and the surviving
    cells re-packed into fewer chunks — per-cell trajectories are identical
    to the monolithic :func:`optimize_mll_batch` (every in-program update is
    a row-wise select; batch composition is unobservable to a cell), but the
    total device time approaches the *sum of per-cell work* instead of
    ``n_chunks x max(per-cell work)``. Also keeps every launched program
    short, which matters on watchdogged runtimes.

    ``lead_schedule`` overrides the leading segment lengths (default:
    ``_seg_schedule()``, env-overridable). A LEADING 0 runs a pure
    verify-and-drain first sweep — the fresh-init NLL+grad evaluation with
    ZERO L-BFGS iterations — so cells already converged at their
    initialization (gnorm <= grad_tol: the common case for day-chained and
    cascade-drained warm starts, median-zero-iteration stages in the r4
    bench) compact away before paying even one lockstep line-search
    iteration. The init evaluation is not wasted: the next sweep resumes
    from the round-tripped state without re-initializing, so total NLL/grad
    evaluations for surviving cells are unchanged (trajectory parity is
    pinned in tests/test_optimizer.py).

    Inputs/outputs are host (numpy) arrays. ``sharding`` optionally places
    each chunk's arrays on a device mesh (cells-axis sharding).
    """
    if config.method != "lbfgs":
        raise ValueError("optimize_mll_chunked supports method='lbfgs' only")
    backend = _resolve_backend(config, x.shape[1], x.dtype)
    n_rows_tot = config.restarts * log_hypers0.shape[0]
    # Monolithic fast path for small buckets, at ONE canonical shape per
    # (restarts, N): 128 total rows. Compaction cannot shrink a <=128-row
    # launch enough to beat the per-launch overhead of the segment sweeps
    # (~6-11 launches vs 1), so run one monolithic program, padded by
    # duplicating row 0 (which converges in lockstep and is sliced away).
    # The pad target is FIXED at 128 rather than the snuggest TILE_MENU fit:
    # a menu-fit shape tracks the bucket's population (8 cells one day, 16
    # the next -> distinct (8, N) and (32, N) executables), and on the
    # tunneled TPU runtime every distinct executable costs ~10-40 s of
    # per-process load on first execution — shape-canonicalization is worth
    # far more than the trivial lockstep compute of the padded rows.
    _MONO_ROWS = 128
    if n_rows_tot <= _MONO_ROWS and _MONO_ROWS <= chunk_rows:
        b_real = log_hypers0.shape[0]
        pad = _MONO_ROWS // config.restarts - b_real
        if pad > 0:
            rep = lambda a: np.concatenate(  # noqa: E731
                [np.asarray(a), np.repeat(np.asarray(a[:1]), pad, axis=0)]
            )
            h0p, xp, yp, mp = rep(log_hypers0), rep(x), rep(y), rep(mask)
        else:
            h0p, xp, yp, mp = np.asarray(log_hypers0), x, y, mask
        put1 = (
            (lambda a: jax.device_put(a, sharding))
            if sharding is not None
            else jnp.asarray
        )
        res = optimize_mll_batch(put1(h0p), put1(xp), put1(yp), put1(mp), config)
        return OptimizeResult(*(f[:b_real] for f in jax.device_get(res)))
    b = log_hypers0.shape[0]
    r = config.restarts
    offs = np.asarray(_RESTART_OFFSETS[:r], dtype=log_hypers0.dtype)
    h0 = (log_hypers0[None, :, :] + offs[:, None, :]).reshape(r * b, -1)
    b_tot = r * b
    base = np.arange(b_tot) % b  # expanded row -> source cell

    put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else jnp.asarray

    def chunks_over(idx):
        for s, size in launch_tiles(idx.size, chunk_rows):
            rows = idx[s : s + size]
            n_real = rows.size
            if n_real < size:
                rows = np.concatenate([rows, np.repeat(rows[-1:], size - n_real)])
            yield rows[:n_real], rows

    def live_mask():
        return (
            (host["gnorm"] > config.grad_tol)
            & ~host["stop"]
            & (host["plateau"] < config.ftol_patience)
        )

    # Synchronous launch->fetch per chunk. Do NOT queue multiple in-flight
    # executions: measured on the tunneled TPU runtime, enqueue-all-then-
    # drain made identical cached programs 10-16x slower (the tunnel
    # serializes pathologically under concurrent pending executions), while
    # per-launch overhead in synchronous order is a few hundred ms.
    # The first sweep passes fresh=True — the sweep program initializes the
    # L-BFGS state from params in-branch (no separate init executable).
    knobs = _Knobs.of(config, log_hypers0.dtype)
    # OI_OPT_TRACE=1: per-launch phase timing (upload / execute / writeback)
    # to stderr. Execution is forced with a 1-element host readback — the
    # tunneled runtime's block_until_ready is a no-op.
    trace = bool(os.environ.get("OI_OPT_TRACE"))
    host = None
    live = None
    iters_done = 0
    fresh = True
    sweep = 0
    while fresh or (iters_done < config.max_iters and live.any()):
        # LEADING sweeps are short (verify-and-drain passes): production
        # stages mostly run warm-started (chained/seeded inits, cascade
        # stages) with MEDIAN ZERO-to-4 iterations per cell but a long
        # straggler tail (r4 bench: max 36-46), and inside one chunk a
        # single straggler carries every row through the segment in
        # lockstep — at full segment length the first sweep's idle-row
        # compute dominated the dominant stage's wall (opt:n1024:m512,
        # 218 s of a 482 s wave pass). Short leading segments converge/
        # drain the bulk cheaply and compact the stragglers into narrow
        # chunks for the full-length later sweeps; for cold starts they
        # merely add sweep boundaries (a few launches). Per-cell
        # trajectories are unchanged (segmentation is unobservable to a
        # cell — see docstring).
        schedule = lead_schedule if lead_schedule is not None else _seg_schedule()
        seg_cap = (
            min(schedule[sweep], segment_iters)
            if sweep < len(schedule) else segment_iters
        )
        seg = max(0, min(seg_cap, config.max_iters - iters_done))
        idx = np.arange(b_tot) if fresh else np.nonzero(live)[0]
        for real, rows in chunks_over(idx):
            t0 = time.perf_counter()
            if fresh:
                st = _blank_state(put(h0[rows]))
            else:
                st = _host_rows_to_state(host, rows)
            # one batched 3-array upload (tunnel dispatch latency)
            xd, yd, md = jax.device_put(
                (x[base[rows]], y[base[rows]], mask[base[rows]]), sharding
            ) if sharding is not None else jax.device_put(
                (x[base[rows]], y[base[rows]], mask[base[rows]])
            )
            if trace:
                np.asarray(jax.device_get(md.ravel()[-1]))  # force uploads
                t1 = time.perf_counter()
            out = _lbfgs_sweep_impl(
                st, xd, yd, md,
                jnp.asarray(fresh), knobs, jnp.asarray(seg, jnp.int32),
                config.kind, config.jitter, backend,
            )
            if trace:
                np.asarray(jax.device_get(out.value[-1]))  # force execution
                t2 = time.perf_counter()
            if host is None:
                hd = _state_to_host(out)
                host = {
                    k: np.zeros((b_tot,) + v.shape[1:], v.dtype)
                    for k, v in hd.items()
                }
            _writeback(host, real, out)
            if trace:
                t3 = time.perf_counter()
                print(
                    f"[opt-trace] n={x.shape[1]} rows={rows.size} "
                    f"real={real.size} seg={seg} fresh={fresh} "
                    f"upload={t1 - t0:.2f}s exec={t2 - t1:.2f}s "
                    f"writeback={t3 - t2:.2f}s",
                    file=sys.stderr, flush=True,
                )
        live = live_mask()
        iters_done += seg
        fresh = False
        sweep += 1

    params = host["params"]
    value = host["value"]
    it_cell = host["it_cell"]
    converged = (host["gnorm"] <= config.grad_tol) | (
        host["plateau"] >= config.ftol_patience
    )
    if r > 1:
        nll = np.where(np.isfinite(value), value, np.inf).reshape(r, b)
        best = np.argmin(nll, axis=0)
        sel = best * b + np.arange(b)
        params, value, it_cell, converged = (
            params[sel], value[sel], it_cell[sel], converged[sel]
        )
    return OptimizeResult(
        log_hypers=params, nll=value, iters=it_cell, converged=converged
    )
