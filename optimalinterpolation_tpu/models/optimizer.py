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
    adam_lr: float = 0.05
    jitter: float = 0.0
    kind: K.Kernel = K.Kernel.MATERN32

    def __post_init__(self):
        if self.method not in ("lbfgs", "adam"):
            raise ValueError(f"unknown method {self.method!r}")


class OptimizeResult(NamedTuple):
    log_hypers: jax.Array  # (5,) optimized log-hyperparameters
    nll: jax.Array  # final negative log marginal likelihood
    iters: jax.Array  # iterations taken
    converged: jax.Array  # grad-norm tolerance reached


def _nll_fn(config: OptimizeConfig, x, y, mask):
    def fn(log_hypers):
        return exact_gp.neg_log_marginal_likelihood(
            log_hypers, x, y, mask, kind=config.kind, jitter=config.jitter
        )

    return fn


def _optimize_lbfgs(fn, log_hypers0, config: OptimizeConfig):
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(fn)

    def cond(carry):
        params, state, best_p, best_v, it, gnorm = carry
        return jnp.logical_and(it < config.max_iters, gnorm > config.grad_tol)

    def body(carry):
        params, state, best_p, best_v, it, _ = carry
        value, grad = value_and_grad(params, state=state)
        # Track the best finite iterate: the line search can occasionally
        # accept a step onto a failed-Cholesky (inf NLL) point in float32;
        # the reference's scipy CG would raise/return inf for that cell.
        # Returning the best-so-far instead keeps the cell usable.
        better = jnp.logical_and(jnp.isfinite(value), value < best_v)
        best_p = jnp.where(better, params, best_p)
        best_v = jnp.where(better, value, best_v)
        grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=fn
        )
        new_params = optax.apply_updates(params, updates)
        step_ok = jnp.all(jnp.isfinite(new_params))
        params = jnp.where(step_ok, new_params, params)
        gnorm = jnp.linalg.norm(grad)
        gnorm = jnp.where(step_ok, gnorm, 0.0)  # stop if stuck on bad step
        return params, state, best_p, best_v, it + 1, gnorm

    state0 = opt.init(log_hypers0)
    dt = log_hypers0.dtype
    big = jnp.asarray(jnp.inf, dtype=dt)
    params, state, best_p, best_v, iters, gnorm = jax.lax.while_loop(
        cond,
        body,
        (log_hypers0, state0, log_hypers0, big, jnp.asarray(0), big),
    )
    # Final evaluation: prefer the last iterate if it is at least as good.
    final_v = fn(params)
    use_last = jnp.logical_and(jnp.isfinite(final_v), final_v <= best_v)
    params = jnp.where(use_last, params, best_p)
    return params, iters, gnorm <= config.grad_tol


def _optimize_adam(fn, log_hypers0, config: OptimizeConfig):
    opt = optax.adam(config.adam_lr)
    vg = jax.value_and_grad(fn)

    def body(carry, _):
        params, state = carry
        value, grad = vg(params)
        grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
        updates, state = opt.update(grad, state, params)
        params = optax.apply_updates(params, updates)
        return (params, state), jnp.linalg.norm(grad)

    (params, _), gnorms = jax.lax.scan(
        body, (log_hypers0, opt.init(log_hypers0)), None, length=config.max_iters
    )
    converged = gnorms[-1] <= config.grad_tol
    return params, jnp.asarray(config.max_iters), converged


@partial(jax.jit, static_argnames=("config",))
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
    ``y - mX`` (``GPR_CS2S3.py:127``).
    """
    fn = _nll_fn(config, x, y, mask)
    if config.method == "lbfgs":
        params, iters, converged = _optimize_lbfgs(fn, log_hypers0, config)
    else:
        params, iters, converged = _optimize_adam(fn, log_hypers0, config)
    return OptimizeResult(params, fn(params), iters, converged)


@partial(jax.jit, static_argnames=("config",))
def optimize_mll_batch(
    log_hypers0: jax.Array,  # (B, 5)
    x: jax.Array,  # (B, N, d)
    y: jax.Array,  # (B, N) centered
    mask: jax.Array,  # (B, N)
    config: OptimizeConfig = OptimizeConfig(),
) -> OptimizeResult:
    """vmap of :func:`optimize_mll` over a bucket of cells.

    This is the TPU replacement for the reference's MPI task farm
    (``GPR_CS2S3.py:248-262``): all cells in the bucket advance one L-BFGS
    iteration per step as one batched kernel-build + batched Cholesky.
    """
    return jax.vmap(lambda h0, xi, yi, mi: optimize_mll(h0, xi, yi, mi, config))(
        log_hypers0, x, y, mask
    )
