"""Exact Gaussian-process regression on masked/padded neighborhoods.

Re-implements, as batched JAX programs, the math of the reference's
  * ``SMLII``  — negative log marginal likelihood + gradients
    (``/root/reference/2021_paper_production/GPR_CS2S3.py:107-141``),
  * ``GPR3D``  — per-cell train/predict
    (``GPR_CS2S3.py:143-191``) and the notebook ``GPR``
    (``GP_example.ipynb`` cell-1).

Differences by design (TPU-first):
  * Gradients come from ``jax.grad`` of the NLL instead of hand-coded trace
    identities. Note the reference's ``SMLII`` gradient is 2x the true
    gradient in the sf2 AND sn2 coordinates (``2*Kx`` at ``GPR_CS2S3.py:136``;
    missing 1/2 at ``:138``) — effectively d/dlog(sigma) instead of
    d/dlog(sigma^2). That changes scipy-CG's trajectory but not the optimum;
    our optimizer uses the true gradient. The oracle in ``tests/oracle.py``
    replicates the quirk for trajectory-parity tests.
  * One cell is a fixed-size padded problem (N_max points + {0,1} mask), so
    everything vmaps over cells and lowers to batched MXU matmuls + batched
    Cholesky. See ``ops.linalg`` for why padding is exact.
  * Hyperparameters live in log-space as a 5-vector
    ``[log ell_x, log ell_y, log ell_t, log sf2, log sn2]`` exactly like the
    reference's ``hypers`` (``GPR_CS2S3.py:120-122``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from optimalinterpolation_tpu.ops import kernels as K
from optimalinterpolation_tpu.ops import linalg as L

__all__ = [
    "N_HYPERS",
    "HYPER_INIT_LOG",
    "neg_log_marginal_likelihood",
    "predict",
    "PredictResult",
]

N_HYPERS = 5

# Reference init x0 (notebook 5-vector form, ``GP_example.ipynb`` cell-3):
# [log(res_m), log(res_m), log 1, log 1, log 0.1] — res_m filled by caller.
_LOG2PI = 1.8378770664093453


def HYPER_INIT_LOG(grid_res_m: float, dtype=jnp.float32) -> jax.Array:
    """The reference's x0 initial hyperparameter guess."""
    import numpy as np

    return jnp.asarray(
        [np.log(grid_res_m), np.log(grid_res_m), 0.0, 0.0, np.log(0.1)], dtype=dtype
    )


def _unpack(log_hypers: jax.Array):
    ell = jnp.exp(log_hypers[:3])
    sf2 = jnp.exp(log_hypers[3])
    sn2 = jnp.exp(log_hypers[4])
    return ell, sf2, sn2


@partial(jax.jit, static_argnames=("kind",))
def neg_log_marginal_likelihood(
    log_hypers: jax.Array,
    x: jax.Array,
    y: jax.Array,
    mask: jax.Array,
    kind: K.Kernel = K.Kernel.MATERN32,
    jitter: float = 0.0,
) -> jax.Array:
    """Masked negative log marginal likelihood (the reference's ``SMLII`` value).

    nlZ = y^T (K + sn2 I)^-1 y / 2 + sum log diag L + n_valid * log(2 pi) / 2
    (``GPR_CS2S3.py:126-128``), where n_valid = sum(mask) so padding changes
    nothing. ``y`` must already be centered (reference passes ``y - mX``).

    Returns +inf when the Cholesky fails, matching the LinAlgError -> inf path
    (``GPR_CS2S3.py:139-140``); with jax.grad this yields NaN gradients which
    the optimizer treats as "reject step".
    """
    ell, sf2, sn2 = _unpack(log_hypers)
    m = mask.astype(x.dtype)
    ym = y * m
    kx = K.kernel_matrix(x, ell, sf2, kind=kind, mask=mask)
    # jitter scales with sf2: an absolute stabilizer becomes meaningless when
    # the optimizer rescales the signal variance (float32 production path).
    a = L.masked_psd_matrix(kx, sn2, mask, jitter=jitter * sf2)
    chol, ok = L.masked_cholesky(a)
    alpha = L.chol_solve(chol, ym)
    n_valid = jnp.sum(m)
    quad = jnp.dot(ym, alpha)
    logdet = jnp.sum(jnp.log(jnp.diagonal(chol)))
    nlz = 0.5 * quad + logdet + 0.5 * n_valid * _LOG2PI
    return jnp.where(ok, nlz, jnp.inf)


class PredictResult(NamedTuple):
    """Per-cell outputs, mirroring ``GPR3D``'s return tuple
    (``GPR_CS2S3.py:184``): prediction, 1-sigma uncertainty, log marginal
    likelihood, plus validity."""

    mean: jax.Array  # fs  — posterior mean at the test point(s)
    std: jax.Array  # sfs — posterior std (1 sigma)
    lZ: jax.Array  # log marginal likelihood of the training set
    prior_std: jax.Array  # sqrt(K**) — prior std (notebook ``returnprior``)
    ok: jax.Array  # Cholesky success flag


@partial(jax.jit, static_argnames=("kind",))
def predict(
    log_hypers: jax.Array,
    x: jax.Array,
    y: jax.Array,
    xstar: jax.Array,
    mask: jax.Array,
    mean: jax.Array,
    kind: K.Kernel = K.Kernel.MATERN32,
    jitter: float = 0.0,
) -> PredictResult:
    """Posterior mean/std at ``xstar`` plus training lZ.

    Parity target: the predict block of ``GPR3D`` (``GPR_CS2S3.py:173-184``):
      fs  = mean + Kxsx^T alpha
      sfs = sqrt(diag(Kxs - v^T v)),  v = L^-1 Kxsx
      lZ  = -(y-m)^T alpha / 2 - sum log diag L - n log(2 pi) / 2

    Args:
      y: raw (uncentered) observations; ``mean`` is the scalar prior mean
        (the reference's ``mX`` is constant per cell, ``GPR_CS2S3.py:163``).
      xstar: (q, d) test inputs (q = 1 for the production pipeline).
    """
    ell, sf2, sn2 = _unpack(log_hypers)
    m = mask.astype(x.dtype)
    ym = (y - mean) * m
    kx = K.kernel_matrix(x, ell, sf2, kind=kind, mask=mask)
    a = L.masked_psd_matrix(kx, sn2, mask, jitter=jitter * sf2)
    chol, ok = L.masked_cholesky(a)
    alpha = L.chol_solve(chol, ym)

    ks = K.cross_kernel(x, xstar, ell, sf2, kind=kind, mask=mask)  # (n, q)
    v = L.tri_solve(chol, ks)  # (n, q)
    fs = mean + ks.T @ alpha  # (q,)
    kss = sf2  # stationary: diag K** = sf2
    var = kss - jnp.sum(v * v, axis=0)  # (q,)
    std = jnp.sqrt(jnp.maximum(var, 0.0))

    n_valid = jnp.sum(m)
    lz = -0.5 * jnp.dot(ym, alpha) - jnp.sum(jnp.log(jnp.diagonal(chol))) - 0.5 * n_valid * _LOG2PI

    nan = jnp.full_like(fs, jnp.nan)
    return PredictResult(
        mean=jnp.where(ok, fs, nan),
        std=jnp.where(ok, std, nan),
        lZ=jnp.where(ok, lz, jnp.nan),
        prior_std=jnp.sqrt(kss) * jnp.ones_like(fs),
        ok=ok,
    )
