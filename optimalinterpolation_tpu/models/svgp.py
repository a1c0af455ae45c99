"""Sparse variational GP (SVGP) — native JAX rebuild of reference C14.

The reference's dev branch uses GPflow: ``SVGP(Matern32, Gaussian likelihood,
50 inducing points on a per-dim linspace, Constant mean)`` trained with Adam
(default lr 1e-3) on the ELBO for 10k steps with minibatch 100
(``/root/reference/dev/sparseGP_example.ipynb`` cell-5). Measured there:
20.09 s/cell, prediction 0.30020767 m / sigma 0.03766990 m.

This is a from-scratch implementation with *whitened* variational parameters
(u = L_z v, q(v) = N(nu, S S^T)) — better conditioned than GPflow's default
unwhitened q_mu/q_sqrt and standard practice for SVGP on accelerators. All
trainables (nu, S, inducing locations Z, the 5 log-hypers, constant mean) are
one flat pytree optimized by optax Adam; the entire 10k-step loop is a single
``lax.scan`` inside one XLA program — no per-step Python/TF-graph boundary —
and the whole fit vmaps over cells.

Gaussian likelihood => analytic variational expectations:
  E_q[log N(y_i | f_i, sn2)] = log N(y_i | mu_i, sn2) - 0.5 var_i / sn2
ELBO = (n/b) sum_batch E_q[...] - KL(q||p),
KL(whitened) = 0.5 (||nu||^2 + ||S||_F^2 - M - 2 sum log |diag S|).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from optimalinterpolation_tpu.ops import kernels as K

__all__ = ["SVGPConfig", "SVGPParams", "svgp_init", "svgp_fit", "svgp_predict"]

_LOG2PI = 1.8378770664093453


@dataclasses.dataclass(frozen=True)
class SVGPConfig:
    num_inducing: int = 50
    iterations: int = 10_000
    batch_size: int = 100
    learning_rate: float = 1e-3  # tf.optimizers.Adam() default, as reference
    kind: K.Kernel = K.Kernel.MATERN32
    jitter: float = 1e-6
    elbo_log_every: int = 10  # reference logs ELBO every 10 steps


class SVGPParams(NamedTuple):
    log_hypers: jax.Array  # (5,) [log ell_xyz, log sf2, log sn2]
    z: jax.Array  # (M, 3) inducing locations
    nu: jax.Array  # (M,) whitened variational mean
    s: jax.Array  # (M, M) whitened variational sqrt (lower tri used)
    mean: jax.Array  # scalar constant mean function


def svgp_init(
    x: jax.Array,
    mask: jax.Array,
    num_inducing: int,
    init_log_hypers: jax.Array,
    mean: float,
) -> SVGPParams:
    """Inducing points on a per-dimension linspace across the data range —
    the reference's Z initialization (sparseGP_example.ipynb cell-5)."""
    m = mask.astype(x.dtype)
    big = jnp.where(m[:, None] > 0, x, jnp.inf)
    small = jnp.where(m[:, None] > 0, x, -jnp.inf)
    lo = jnp.min(big, axis=0)
    hi = jnp.max(small, axis=0)
    frac = jnp.linspace(0.0, 1.0, num_inducing, dtype=x.dtype)[:, None]
    z = lo[None, :] + frac * (hi - lo)[None, :]
    return SVGPParams(
        log_hypers=jnp.asarray(init_log_hypers, dtype=x.dtype),
        z=z,
        nu=jnp.zeros((num_inducing,), dtype=x.dtype),
        s=jnp.eye(num_inducing, dtype=x.dtype),
        mean=jnp.asarray(mean, dtype=x.dtype),
    )


def _marginals(params: SVGPParams, xb: jax.Array, kind: K.Kernel, jitter: float):
    """q(f) marginals at inputs xb: (mu, var), whitened parameterization."""
    ell = jnp.exp(params.log_hypers[:3])
    sf2 = jnp.exp(params.log_hypers[3])
    m = params.z.shape[0]
    kzz = K.kernel_matrix(params.z, ell, sf2, kind=kind) + jitter * jnp.eye(
        m, dtype=xb.dtype
    )
    lz = jnp.linalg.cholesky(kzz)
    kzx = K.cross_kernel(params.z, xb, ell, sf2, kind=kind)  # (M, b)
    a = jax.scipy.linalg.solve_triangular(lz, kzx, lower=True)  # (M, b)
    s_tril = jnp.tril(params.s)
    mu = params.mean + a.T @ params.nu
    sa = s_tril.T @ a  # (M, b)
    var = sf2 - jnp.sum(a * a, axis=0) + jnp.sum(sa * sa, axis=0)
    return mu, jnp.maximum(var, 1e-12)


def _kl(params: SVGPParams) -> jax.Array:
    s_tril = jnp.tril(params.s)
    m = params.nu.shape[0]
    diag = jnp.abs(jnp.diagonal(s_tril)) + 1e-20
    return 0.5 * (
        jnp.dot(params.nu, params.nu)
        + jnp.sum(s_tril * s_tril)
        - m
        - 2.0 * jnp.sum(jnp.log(diag))
    )


def elbo(
    params: SVGPParams,
    xb: jax.Array,
    yb: jax.Array,
    wb: jax.Array,  # per-point weights (0 for padded rows of the batch)
    n_data: jax.Array,
    kind: K.Kernel,
    jitter: float,
) -> jax.Array:
    sn2 = jnp.exp(params.log_hypers[4])
    mu, var = _marginals(params, xb, kind, jitter)
    ve = -0.5 * (_LOG2PI + jnp.log(sn2) + ((yb - mu) ** 2 + var) / sn2)
    b_eff = jnp.maximum(jnp.sum(wb), 1.0)
    return (n_data / b_eff) * jnp.sum(wb * ve) - _kl(params)


class SVGPFit(NamedTuple):
    params: SVGPParams
    elbo_log: jax.Array  # ELBO trace, sampled every `elbo_log_every` steps


@partial(jax.jit, static_argnames=("config",))
def svgp_fit(
    params0: SVGPParams,
    x: jax.Array,  # (n_pad, 3)
    y: jax.Array,  # (n_pad,) raw observations
    mask: jax.Array,  # (n_pad,)
    key: jax.Array,
    config: SVGPConfig = SVGPConfig(),
) -> SVGPFit:
    """Adam on -ELBO with uniform random minibatches.

    The reference streams minibatches from a shuffled-repeat tf.data pipeline;
    here each step draws ``batch_size`` indices from the valid points (with
    replacement — statistically equivalent for SGD, and shape-static).
    """
    mval = mask.astype(x.dtype)
    n_data = jnp.sum(mval)
    probs = mval / n_data
    opt = optax.adam(config.learning_rate)

    def loss_fn(p, xb, yb, wb):
        return -elbo(p, xb, yb, wb, n_data, config.kind, config.jitter)

    def step(carry, k):
        p, opt_state = carry
        idx = jax.random.choice(k, x.shape[0], (config.batch_size,), p=probs)
        xb, yb, wb = x[idx], y[idx], mval[idx]
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb, wb)
        grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return (p, opt_state), -loss

    keys = jax.random.split(key, config.iterations)
    (params, _), elbos = jax.lax.scan(step, (params0, opt.init(params0)), keys)
    return SVGPFit(params=params, elbo_log=elbos[:: config.elbo_log_every])


class SVGPPredict(NamedTuple):
    mean: jax.Array
    std: jax.Array


@partial(jax.jit, static_argnames=("kind",))
def svgp_predict(
    params: SVGPParams,
    xstar: jax.Array,
    kind: K.Kernel = K.Kernel.MATERN32,
    jitter: float = 1e-6,
) -> SVGPPredict:
    """predict_f: latent-function posterior marginals at xstar (q, 3)."""
    mu, var = _marginals(params, xstar, kind, jitter)
    return SVGPPredict(mean=mu, std=jnp.sqrt(var))
