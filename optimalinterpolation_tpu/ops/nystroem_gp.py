"""Batched Nystrom NLL objective for large-neighborhood hyperparameter fits.

The production pipeline's wall-clock is dominated by the O(N^3) exact-GP NLL
on the largest neighborhood buckets (N >= 2048: ~8% of cells, ~60% of a daily
field's time on one chip). The reference's own answer to large n is its
Nystrom approximation (``/root/reference/GP_example.ipynb`` cell-1
``Nystroem`` + the ``SMLII(approx=True)`` objective, demo M=925 in cell-5):
optimize the *approximate* model's marginal likelihood, whose cost is
O(n M^2) instead of O(n^3).

This module is the batched, TPU-shaped version of that objective, used by
models.optimizer as the ``nystroem:<M>`` backend for buckets with
N >= OptimizeConfig.nystroem_min_n (prediction stays EXACT — only the
pass-1 hyperparameter search uses the approximation, and
tests/test_nystroem_backend.py pins the prediction parity of hypers found
this way against exact-objective hypers):

  landmarks   = the first M neighbor slots (callers shuffle valid points, so
                this is a uniform M-point subsample; masked slots pad to
                identity and drop out of every term exactly)
  Amm         = Kmm o mm^T + (mm_jitter sf2 | 1-m) I,   Amm = Lm Lm^T
  Phi         = Knm Lm^-T                                (n, M)
  K~ + D      = Phi Phi^T + (sn2 + jitter sf2) I
  C           = D I_M + Phi^T Phi,                       C = Lc Lc^T
  nll         = [ |ym|^2 - |Lc^-1 Phi^T ym|^2 ] / (2 D)
                + sum log diag Lc + (n_valid - M)/2 log D + n_valid/2 log 2pi

(Woodbury inverse + matrix-determinant lemma — the same Cholesky-feature
form as models.nystroem, derived there; this module re-states it batched
with the (M, M) factorizations routed through ops.blocked_gp's blocked
factor-and-invert, which runs ~20x faster than XLA's native cholesky on
TPU.)

Gradients come from jax.grad. The blocked factor path contains a Pallas
kernel (not differentiable), so the factorization is wrapped in a
``custom_vjp`` (:func:`chol_inv`) whose backward pass is the standard
Cholesky VJP expressed with the explicit inverse W = L^-1 the forward pass
already produces — all matmuls, no triangular solves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from optimalinterpolation_tpu.ops import kernels as K
from optimalinterpolation_tpu.ops.kernels import Kernel

__all__ = ["chol_inv", "gp_nll_nystroem", "gp_nll_and_grad_nystroem"]

_LOG2PI = 1.8378770664093453
_HI = jax.lax.Precision.HIGH
# Relative (to sf2) jitter on the landmark Gram matrix Kmm. Unlike the full
# covariance, Kmm has no observation-noise diagonal to regularize it, and a
# smooth kernel's Gram over clustered points is numerically rank-deficient in
# float32 (eps * M * sf2 ~ 3e-5 sf2 at M=512). The approximation error this
# adds is O(mm_jitter) — far below the rank-M truncation error.
_MM_JITTER = 1e-4


def _ein(spec, *ops):
    return jnp.einsum(spec, *ops, precision=_HI)


# ---------------------------------------------------------------------------
# Differentiable batched Cholesky factor + explicit inverse
# ---------------------------------------------------------------------------


def _chol_inv_impl(a):
    from optimalinterpolation_tpu.ops import blocked_gp

    return blocked_gp._factor_invert(a)


@jax.custom_vjp
def chol_inv(a: jax.Array):
    """(B, M, M) PSD -> (L, W = L^-1, logdet = sum log diag L, ok).

    Forward = ops.blocked_gp's blocked factor-and-invert (Pallas 128-block
    base case on TPU). Backward = the standard Cholesky pullback
    (dL = L Phi(L^-1 dA L^-T), Phi = strict-lower + half-diagonal), with the
    W = L^-1 and logdet outputs folded into the L cotangent first:

      dW      = -W dL W          =>  L_bar += -W^T W_bar W^T
      dlogdet = tr(diag(L)^-1 dL) =>  L_bar += diag(logdet_bar / diag L)
      A_bar   = sym( W^T PhiAdj(L^T L_bar) W )

    Everything is (M, M) matmuls against the explicit W — no triangular
    solves in the backward pass.
    """
    return _chol_inv_impl(a)


def _chol_inv_fwd(a):
    out = _chol_inv_impl(a)
    l, w, _, _ = out
    return out, (l, w)


def _chol_inv_bwd(res, cots):
    l, w = res
    lb, wb, ldb, _okb = cots
    mdim = l.shape[-1]
    eye = jnp.eye(mdim, dtype=l.dtype)[None]
    diag_l = jnp.diagonal(l, axis1=1, axis2=2)  # (B, M)
    # fold the W = L^-1 cotangent: <W_bar, -W dL W> = <-W^T W_bar W^T, dL>
    lb_eff = lb - _ein("bki,bkl,bjl->bij", w, wb, w)
    # fold the logdet cotangent onto the diagonal
    lb_eff = lb_eff + eye * (ldb[:, None] / diag_l)[:, :, None]
    lb_eff = jnp.tril(lb_eff)  # dL lives in the lower triangle only
    s = _ein("bki,bkj->bij", l, lb_eff)  # L^T L_bar
    phi_s = jnp.tril(s) - 0.5 * eye * jnp.diagonal(s, axis1=1, axis2=2)[
        :, :, None
    ]
    g = _ein("bki,bkl,blj->bij", w, phi_s, w)  # W^T Phi W
    return (0.5 * (g + jnp.swapaxes(g, 1, 2)),)


chol_inv.defvjp(_chol_inv_fwd, _chol_inv_bwd)


# ---------------------------------------------------------------------------
# Batched Nystrom NLL
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("m_inducing", "kind", "jitter"))
def gp_nll_nystroem(
    log_hypers: jax.Array,  # (B, 5)
    x: jax.Array,  # (B, N, d)
    y: jax.Array,  # (B, N) centered
    mask: jax.Array,  # (B, N)
    m_inducing: int,
    kind: Kernel = Kernel.MATERN32,
    jitter: float = 0.0,
) -> jax.Array:
    """Batched Nystrom-approximate masked NLL, (B,). O(N M^2) per cell.

    The landmark set is the first ``m_inducing`` neighbor slots of each row
    (pipeline.daily shuffles each row's valid points, making this a uniform
    subsample). ``jitter`` matches the exact backends' convention: the noise
    diagonal is ``sn2 + jitter * sf2``, so this objective converges to the
    exact NLL as M -> n_valid.
    """
    mi = m_inducing
    if mi % 128 != 0:
        raise ValueError(f"m_inducing must be a multiple of 128, got {mi}")
    ell = jnp.exp(log_hypers[:, :3])
    sf2 = jnp.exp(log_hypers[:, 3])
    sn2 = jnp.exp(log_hypers[:, 4])
    m = mask.astype(x.dtype)
    ym = y * m
    n_valid = jnp.sum(m, axis=1)
    d_noise = sn2 + jitter * sf2  # (B,)

    xm, mm = x[:, :mi], m[:, :mi]
    kmm = jax.vmap(
        lambda xi, ei, si, mmi: K.kernel_matrix(xi, ei, si, kind=kind, mask=mmi)
    )(xm, ell, sf2, mm)
    amm = kmm + (
        (_MM_JITTER * sf2)[:, None] * mm + (1.0 - mm)
    )[:, :, None] * jnp.eye(mi, dtype=x.dtype)[None]
    _, wm, _, ok1 = chol_inv(amm)

    knm = jax.vmap(
        lambda xi, xmi, ei, si, mni: K.cross_kernel(
            xi, xmi, ei, si, kind=kind, mask=mni
        )
    )(x, xm, ell, sf2, m)  # rows masked by m
    knm = knm * mm[:, None, :]  # zero padded landmark columns
    phi = _ein("bnm,bkm->bnk", knm, wm)  # Knm Lm^-T  (B, N, M)

    core = _ein("bnm,bnk->bmk", phi, phi) + (
        d_noise[:, None, None] * jnp.eye(mi, dtype=x.dtype)[None]
    )
    _, wc, logdet_c, ok2 = chol_inv(core)  # logdet_c = 0.5 log det(core)

    pym = _ein("bnm,bn->bm", phi, ym)
    zc = _ein("bmk,bk->bm", wc, pym)  # Lc^-1 Phi^T ym
    quad = (jnp.sum(ym * ym, axis=1) - jnp.sum(zc * zc, axis=1)) / d_noise

    # det lemma: log det(K~ + D I_n) = log det(core) - M log D + n log D.
    # Padded landmark slots contribute exactly D to core's diagonal (their
    # Phi column is zero), so the static-M form is exact for masked rows.
    half_logdet = (
        logdet_c + 0.5 * (n_valid - mi) * jnp.log(d_noise)
    )
    nll = 0.5 * quad + half_logdet + 0.5 * n_valid * _LOG2PI
    ok = jnp.logical_and(ok1, ok2)
    return jnp.where(ok, nll, jnp.inf)


@functools.partial(jax.jit, static_argnames=("m_inducing", "kind", "jitter"))
def gp_nll_and_grad_nystroem(
    log_hypers, x, y, mask, m_inducing,
    kind: Kernel = Kernel.MATERN32, jitter: float = 0.0,
):
    """Batched Nystrom NLL + (B, 5) gradient via jax.grad.

    Cells are independent, so the gradient of the summed NLL recovers each
    cell's own gradient; non-finite cells contribute zero to the sum (their
    gradient row is reported as NaN for the optimizer's accept logic).
    """

    def total(h):
        nll = gp_nll_nystroem(
            h, x, y, mask, m_inducing, kind=kind, jitter=jitter
        )
        finite = jnp.isfinite(nll)
        return jnp.sum(jnp.where(finite, nll, 0.0)), (nll, finite)

    (_, (nll, finite)), grad = jax.value_and_grad(total, has_aux=True)(
        log_hypers
    )
    return nll, jnp.where(finite[:, None], grad, jnp.nan)
