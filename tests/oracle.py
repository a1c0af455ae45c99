"""NumPy/SciPy oracle: a faithful re-derivation of the reference math.

This module exists ONLY for testing. It re-implements, in plain NumPy from
the published equations, the same quantities the reference computes with
scipy/LAPACK, so the JAX/TPU library can be verified against an independent
float64 implementation:

  * ``matern32_gram`` / ``matern32_cross``  — the reference ``SGPkernel``
    (``/root/reference/2021_paper_production/GPR_CS2S3.py:78-105``):
    K = sf2 (1 + Q) exp(-Q), Q = sqrt(3) ||x/ell - x'/ell||.
  * ``nll_and_grad`` — the reference ``SMLII`` (``GPR_CS2S3.py:107-141``)
    including its factor-2 d/dlog(sf2) convention (``:136``) behind
    ``ref_sf2_convention=True``.
  * ``gp_predict`` — the predict block of ``GPR3D`` (``GPR_CS2S3.py:173-184``).
  * ``cg_optimize`` — scipy CG over log-hypers, as at ``GPR_CS2S3.py:166``.

No code is copied from the reference; formulas are re-derived (standard GP
textbook identities, Rasmussen & Williams ch. 2 + 5).
"""

from __future__ import annotations

import numpy as np
import scipy.optimize

SQRT3 = np.sqrt(3.0)


def _pairdiff_sq(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared Euclidean distance matrix between rows of a and b (exact)."""
    d = a[:, None, :] - b[None, :, :]
    return np.einsum("ijk,ijk->ij", d, d)


def matern32_gram(x: np.ndarray, ell: np.ndarray, sf2: float, with_grads: bool = False):
    """K and (optionally) dK/dlog(ell_d), matching SGPkernel(grad=True)."""
    xs = x / ell
    q_all = SQRT3 * np.sqrt(_pairdiff_sq(xs, xs))
    k = sf2 * (1.0 + q_all) * np.exp(-q_all)
    if not with_grads:
        return k
    grads = np.empty((len(ell),) + k.shape)
    for d in range(len(ell)):
        col = xs[:, d : d + 1]
        q_d = SQRT3 * np.abs(col - col.T)
        # d k / d log ell_d = sf2 * q_d^2 * exp(-Q)   (chain rule through Q)
        grads[d] = sf2 * q_d * q_d * np.exp(-q_all)
    return k, grads


def matern32_cross(x: np.ndarray, xstar: np.ndarray, ell: np.ndarray, sf2: float):
    q = SQRT3 * np.sqrt(_pairdiff_sq(x / ell, xstar / ell))
    return sf2 * (1.0 + q) * np.exp(-q)


def nll_and_grad(
    log_hypers: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    ref_sf2_convention: bool = True,
):
    """Negative log marginal likelihood + gradient wrt the 5 log-hypers.

    ``y`` is the centered target (prior mean already subtracted).
    ``ref_sf2_convention=True`` doubles the d/dlog(sf2) AND d/dlog(sn2)
    entries to match the reference's ``(Q*(2*Kx)).sum()/2`` and
    ``sn2*np.trace(Q)`` lines (``GPR_CS2S3.py:136,138``) — the reference's
    convention is effectively the gradient wrt log-sigma (std), not
    log-sigma^2, in those two coordinates, while still exponentiating the
    parameters as variances. Scaling a gradient coordinate by 2 moves CG's
    trajectory but not the optimum.
    """
    ell = np.exp(log_hypers[:3])
    sf2 = np.exp(log_hypers[3])
    sn2 = np.exp(log_hypers[4])
    n = len(y)
    k, dk = matern32_gram(x, ell, sf2, with_grads=True)
    try:
        chol = np.linalg.cholesky(k + sn2 * np.eye(n))
    except np.linalg.LinAlgError:
        return np.inf, np.full(5, np.inf)
    alpha = np.linalg.solve(chol.T, np.linalg.solve(chol, y))
    nll = (
        0.5 * y @ alpha
        + np.sum(np.log(np.diag(chol)))
        + 0.5 * n * np.log(2 * np.pi)
    )
    kinv = np.linalg.solve(chol.T, np.linalg.solve(chol, np.eye(n)))
    q_mat = kinv - np.outer(alpha, alpha)
    grad = np.empty(5)
    for d in range(3):
        grad[d] = 0.5 * np.sum(q_mat * dk[d])
    factor = 2.0 if ref_sf2_convention else 1.0
    grad[3] = 0.5 * np.sum(q_mat * (factor * k))
    grad[4] = 0.5 * factor * sn2 * np.trace(q_mat)
    return nll, grad


def gp_predict(
    log_hypers: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    xstar: np.ndarray,
    mean: float,
):
    """Posterior mean/std at xstar + training lZ (GPR3D predict block)."""
    ell = np.exp(log_hypers[:3])
    sf2 = np.exp(log_hypers[3])
    sn2 = np.exp(log_hypers[4])
    n = len(y)
    k = matern32_gram(x, ell, sf2)
    ks = matern32_cross(x, xstar, ell, sf2)
    chol = np.linalg.cholesky(k + sn2 * np.eye(n))
    yc = y - mean
    alpha = np.linalg.solve(chol.T, np.linalg.solve(chol, yc))
    v = np.linalg.solve(chol, ks)
    fs = mean + ks.T @ alpha
    var = sf2 - np.sum(v * v, axis=0)
    lz = (
        -0.5 * yc @ alpha
        - np.sum(np.log(np.diag(chol)))
        - 0.5 * n * np.log(2 * np.pi)
    )
    return fs, np.sqrt(var), lz


def cg_optimize(log_hypers0, x, y, ref_sf2_convention=True):
    """scipy CG with analytic gradients, as the reference runs it."""
    res = scipy.optimize.minimize(
        nll_and_grad,
        x0=np.asarray(log_hypers0, dtype=np.float64),
        args=(x, y, ref_sf2_convention),
        method="CG",
        jac=True,
    )
    return res.x, res.fun
