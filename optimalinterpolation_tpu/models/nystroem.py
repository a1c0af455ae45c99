"""Nystrom low-rank approximation of the local GP (reference C13).

Rebuilds the capability of the notebook ``Nystroem`` function
(``/root/reference/GP_example.ipynb`` cell-1; demo M=925 in cell-5): a rank-M
approximation of the Gram matrix K ~ Knm Kmm^-1 Kmn (Williams & Seeger 2001),
with the inverse of (K_tilde + sn2 I) via the Woodbury identity and the
log-determinant via the matrix-determinant lemma.

Derivation note: the reference builds eigen-features
``u_tilde = sqrt(M/n) Knm U / s`` with scaled eigenvalues ``s_tilde = n s/M``
— the n/M factors cancel exactly, so its K_tilde is plain
``Knm Kmm^-1 Kmn``. Dividing by small eigenvalues is numerically explosive
for smooth kernels (spectra decay to ~eps; the reference clamps s <= 0 to
1e-12 but small *positive* eigenvalues still amplify noise by ~1/s). Here the
same matrix is factored through Cholesky features instead:

  Lm = chol(Kmm + jitter I),   Phi = Knm Lm^-T           (n, M)
  K_tilde = Phi Phi^T
  (K_tilde + sn2 I)^-1 v = v/sn2 - Phi (sn2 I_M + Phi^T Phi)^-1 Phi^T v / sn2
  log det(K_tilde + sn2 I) = log det(sn2 I_M + Phi^T Phi) + (n - M) log sn2

— identical math, stable in float32, and all matmuls (MXU). O(n M) memory and
O(n M^2) FLOPs end-to-end: unlike the reference's ``SMLII(approx=True)``,
which still builds the dense (n, n) K and gradient stacks, the NLL here never
materializes an (n, n) matrix, and its gradients come from jax.grad.

Everything is masked for padding and vmappable over cells, like
models.exact_gp.

NOTE the reference's approx-NLL det term omits ``(n - M)/2 log sn2``
(``Nystroem(..., opt=True)`` returns only the M-dimensional slogdet); since
that offset depends on a hyperparameter it biases the optimization objective.
We implement the correct determinant; ``ref_det_convention=True`` reproduces
the reference objective for parity tests.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from optimalinterpolation_tpu.ops import kernels as K

__all__ = ["nystroem_nll", "nystroem_predict", "NystroemPredict"]

_LOG2PI = 1.8378770664093453


def _phi(x, landmark_idx, ell, sf2, kind, mask, jitter):
    """Cholesky Nystrom features Phi = Knm Lm^-T, masked rows zeroed."""
    m = landmark_idx.shape[0]
    xm = x[landmark_idx]
    kmm = K.kernel_matrix(xm, ell, sf2, kind=kind) + jitter * sf2 * jnp.eye(
        m, dtype=x.dtype
    )
    lm = jnp.linalg.cholesky(kmm)
    knm = K.cross_kernel(x, xm, ell, sf2, kind=kind, mask=mask)  # (n_pad, M)
    phi = jax.scipy.linalg.solve_triangular(lm, knm.T, lower=True).T
    ok = jnp.all(jnp.isfinite(jnp.diagonal(lm)))
    return phi, ok


def _woodbury(phi, sn2):
    """Returns (apply_Ki, half_logdet_M, ok): the Woodbury inverse operator
    and the M-dimensional half log-det piece."""
    m = phi.shape[1]
    core = sn2 * jnp.eye(m, dtype=phi.dtype) + phi.T @ phi
    lc = jnp.linalg.cholesky(core)

    def apply_ki(v):
        pv = phi.T @ v
        w = jax.scipy.linalg.cho_solve((lc, True), pv)
        return (v - phi @ w) / sn2

    half_logdet_m = jnp.sum(jnp.log(jnp.diagonal(lc)))  # 0.5*logdet(core)
    ok = jnp.all(jnp.isfinite(jnp.diagonal(lc)))
    return apply_ki, half_logdet_m, ok


@partial(jax.jit, static_argnames=("kind", "ref_det_convention"))
def nystroem_nll(
    log_hypers: jax.Array,
    x: jax.Array,  # (n_pad, 3)
    y: jax.Array,  # (n_pad,) centered targets
    landmark_idx: jax.Array,  # (M,) int indices into x (valid points only)
    mask: jax.Array,
    kind: K.Kernel = K.Kernel.MATERN32,
    jitter: float = 1e-8,
    ref_det_convention: bool = False,
) -> jax.Array:
    """Approximate negative log marginal likelihood, O(n M^2)."""
    ell = jnp.exp(log_hypers[:3])
    sf2 = jnp.exp(log_hypers[3])
    sn2 = jnp.exp(log_hypers[4])
    mval = mask.astype(x.dtype)
    ym = y * mval
    n = jnp.sum(mval)
    m = landmark_idx.shape[0]

    phi, ok1 = _phi(x, landmark_idx, ell, sf2, kind, mask, jitter)
    apply_ki, half_logdet_m, ok2 = _woodbury(phi, sn2)

    quad = 0.5 * jnp.dot(ym, apply_ki(ym))
    # core's logdet includes sn2 I_M: logdet(sn2 I + Phi^T Phi). Woodbury's
    # det lemma: logdet(K~ + sn2 I_n) = logdet(core) - M log sn2 + n log sn2.
    half_logdet = half_logdet_m - 0.5 * m * jnp.log(sn2)
    if not ref_det_convention:
        half_logdet = half_logdet + 0.5 * n * jnp.log(sn2)
    nlz = quad + half_logdet + 0.5 * n * _LOG2PI
    return jnp.where(jnp.logical_and(ok1, ok2), nlz, jnp.inf)


class NystroemPredict(NamedTuple):
    mean: jax.Array
    std: jax.Array
    ok: jax.Array


@partial(jax.jit, static_argnames=("kind",))
def nystroem_predict(
    log_hypers: jax.Array,
    x: jax.Array,
    y: jax.Array,  # raw (uncentered) observations
    xstar: jax.Array,  # (q, 3)
    landmark_idx: jax.Array,
    mask: jax.Array,
    mean: jax.Array,
    kind: K.Kernel = K.Kernel.MATERN32,
    jitter: float = 1e-8,
) -> NystroemPredict:
    """Posterior mean/std with the Nystrom-approximated inverse.

    Parity target: ``GPR(approx=True)`` — fs = mean + K*^T Ki y,
    err = K*^T Ki K*, sfs = sqrt(diag(K** - err)) (GP_example.ipynb cell-1).
    """
    ell = jnp.exp(log_hypers[:3])
    sf2 = jnp.exp(log_hypers[3])
    sn2 = jnp.exp(log_hypers[4])
    mval = mask.astype(x.dtype)
    ym = (y - mean) * mval

    phi, ok1 = _phi(x, landmark_idx, ell, sf2, kind, mask, jitter)
    apply_ki, _, ok2 = _woodbury(phi, sn2)
    ok = jnp.logical_and(ok1, ok2)

    ks = K.cross_kernel(x, xstar, ell, sf2, kind=kind, mask=mask)  # (n, q)
    fs = mean + ks.T @ apply_ki(ym)
    err = jnp.sum(ks * apply_ki(ks), axis=0)
    std = jnp.sqrt(jnp.maximum(sf2 - err, 0.0))
    nan = jnp.full_like(fs, jnp.nan)
    return NystroemPredict(
        mean=jnp.where(ok, fs, nan), std=jnp.where(ok, std, nan), ok=ok
    )
