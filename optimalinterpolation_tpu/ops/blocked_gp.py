"""Blocked exact-GP NLL/gradient/predict for large neighborhoods (N > 1024).

The fully fused Pallas kernel (ops/pallas_gp.py) keeps per-cell (N, N)
matrices VMEM-resident, which caps it at N = 1024 on a 16 MB-VMEM chip. This
module covers the 2048/4096 buckets with a hybrid: the covariance is held as
a block tensor (B, nb, nb, 128, 128) in HBM, every O(N^3) operation (panel
TRSMs, trailing SYRKs, the L^-1 build, K^-1 accumulation) is an XLA einsum —
large, static, MXU-shaped matmuls XLA schedules and stages well — and the
only sequential piece, the 128x128 diagonal factorization + inverse, runs
through a small Pallas call that reuses the fused kernel's vectorized
unrolled factor loop.

Rationale (measured on v5e): XLA's native batched ``cholesky`` runs at
~100 GFLOP/s — its internal panel code dominates. Expressed this way the
N^3 work rides the MXU at multi-TFLOP/s and only O(N * 128^2) work remains
sequential.

Math and conventions are identical to the reference ``SMLII``/``GPR3D``
(``/root/reference/2021_paper_production/GPR_CS2S3.py:107-191``) and to
models.exact_gp / ops.pallas_gp:

  A = K o mm^T + diag(sf2+sn2+jitter | 1-m),  A = L L^T
  nll      = |L^-1 ym|^2 / 2 + sum log diag L + n/2 log 2pi
  d nll/dθ = 0.5 <A^-1 - alpha alpha^T, dA/dθ>
  predict: fs = m + (L^-1 ks).(L^-1 ym), var = sf2 - |L^-1 ks|^2
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from optimalinterpolation_tpu.ops import kernels as K
from optimalinterpolation_tpu.ops import pallas_gp
from optimalinterpolation_tpu.ops.kernels import Kernel

__all__ = [
    "gp_nll_blocked",
    "gp_nll_blocked_with_factors",
    "gp_grad_blocked_from_factors",
    "gp_nll_and_grad_blocked",
    "gp_predict_blocked",
]

BLK = 128
PANEL = 512
_LOG2PI = 1.8378770664093453
# HIGH = 3-pass bf16 on the MXU: measured identical accuracy to HIGHEST
# (6-pass) on this problem — ~5e-6 relative vs the f64 oracle — at ~3x the
# matmul throughput. (DEFAULT = single-pass bf16 is fatal in Cholesky
# chains: ~3e-3 relative error.)
_HI = jax.lax.Precision.HIGH


def _ein(spec, *ops):
    return jnp.einsum(spec, *ops, precision=_HI)


# ---------------------------------------------------------------------------
# 128x128 diagonal factor + inverse: Pallas on TPU, LAPACK-style elsewhere
# ---------------------------------------------------------------------------


def _factor_kernel(d_ref, u_ref, w_ref, aux_ref, d_scr, wb_scr):
    dtype = d_scr.dtype
    tb = d_scr.shape[0]
    d_scr[...] = d_ref[...]
    wb_scr[...] = jnp.broadcast_to(jnp.eye(BLK, dtype=dtype)[None], (tb, BLK, BLK))
    logdet, ok = pallas_gp._factor_invert_inplace(d_scr, wb_scr, dtype)
    u_ref[...] = d_scr[...]
    w_ref[...] = wb_scr[...]
    aux_ref[...] = jnp.concatenate(
        [logdet, ok, jnp.zeros((tb, 1, 126), dtype)], axis=2
    )


@jax.jit
def _factor_invert_pallas(d: jax.Array):
    """(B, 128, 128) PSD blocks -> (L^T, L^-1, logdet (B,), ok (B,))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = d.shape[0]
    tb = 8
    bp = -(-b // tb) * tb
    if bp != b:
        pad = jnp.broadcast_to(jnp.eye(BLK, dtype=d.dtype)[None], (bp - b, BLK, BLK))
        d = jnp.concatenate([d, pad], axis=0)
    u, w, aux = pl.pallas_call(
        _factor_kernel,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, BLK, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((tb, BLK, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, BLK, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, BLK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, BLK, BLK), d.dtype),
            jax.ShapeDtypeStruct((bp, BLK, BLK), d.dtype),
            jax.ShapeDtypeStruct((bp, 1, BLK), d.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, BLK, BLK), d.dtype),
            pltpu.VMEM((tb, BLK, BLK), d.dtype),
        ],
    )(d)
    lt = u[:b]
    return (
        jnp.swapaxes(lt, 1, 2),  # L
        w[:b],
        aux[:b, 0, 0],
        aux[:b, 0, 1] > 0.5,
    )


def _factor_invert_xla(d: jax.Array):
    l = jnp.linalg.cholesky(d)
    diag = jnp.diagonal(l, axis1=1, axis2=2)
    ok = jnp.all(jnp.isfinite(diag), axis=1)
    eye = jnp.broadcast_to(jnp.eye(BLK, dtype=d.dtype)[None], d.shape)
    lsafe = jnp.where(jnp.isfinite(l), l, eye)
    w = jax.scipy.linalg.solve_triangular(lsafe, eye, lower=True)
    logdet = jnp.sum(jnp.log(jnp.where(ok[:, None], jnp.abs(diag) + 1e-300, 1.0)), axis=1)
    return jnp.where(ok[:, None, None], lsafe, eye), w, logdet, ok


def _factor_invert(d):
    if d.shape[-1] != BLK:
        return _factor_invert_panel(d)
    if jax.default_backend() == "tpu":
        return _factor_invert_pallas(d)
    return _factor_invert_xla(d)


def _factor_invert_panel(d: jax.Array):
    """Factor + invert a (B, P, P) panel with P a multiple of 128, by
    recursing onto the 128-block machinery: L from a small blocked Cholesky,
    W = L^-1 from the small T build. One level of recursion only (the inner
    diagonals are 128 and hit the Pallas/XLA base case)."""
    l4, w4, logdet, ok = _blocked_chol(_to_blocks(d, BLK))
    t4 = _tinv(l4, w4)
    return _unblock(l4), _unblock(t4), logdet, ok


# ---------------------------------------------------------------------------
# Block-tensor Cholesky + solves
# ---------------------------------------------------------------------------


def _to_blocks(a: jax.Array, blk: int = BLK) -> jax.Array:
    b, n, _ = a.shape
    nb = n // blk
    return a.reshape(b, nb, blk, nb, blk).transpose(0, 1, 3, 2, 4)


def _unblock(t: jax.Array) -> jax.Array:
    """Inverse of :func:`_to_blocks`: (B, nb, nb, blk, blk) -> (B, n, n)."""
    b, nb, _, blk, _ = t.shape
    return t.transpose(0, 1, 3, 2, 4).reshape(b, nb * blk, nb * blk)


def _build_a(log_hypers, x, mask, kind, jitter):
    ell = jnp.exp(log_hypers[:, :3])  # (B, 3)
    sf2 = jnp.exp(log_hypers[:, 3])
    sn2 = jnp.exp(log_hypers[:, 4])
    kx = jax.vmap(lambda xi, ei, si, mi: K.kernel_matrix(xi, ei, si, kind=kind, mask=mi))(
        x, ell, sf2, mask
    )
    m = mask.astype(x.dtype)
    diag = (sn2[:, None] + jitter * sf2[:, None]) * m + (1.0 - m)
    n = x.shape[1]
    a = kx + diag[:, :, None] * jnp.eye(n, dtype=x.dtype)[None]
    return a, sf2, sn2


def _blocked_chol(ab):
    """ab: (B, nb, nb, BLK, BLK) full symmetric block tensor.

    Returns (l, w, logdet, ok): l lower-block-triangular (diag blocks are
    lower-triangular L_kk), w (B, nb, BLK, BLK) = L_kk^-1.

    Left-looking: column kb is updated once against all previous columns
    (contractions touch only nonzero lower blocks), instead of the dense
    right-looking trailing SYRK which spends half its FLOPs computing upper
    blocks the algorithm never reads. nb^3/6 block matmuls — the N^3/3
    Cholesky optimum.
    """
    b, nb, blk = ab.shape[0], ab.shape[1], ab.shape[-1]
    dtype = ab.dtype
    l = jnp.zeros_like(ab)
    w = jnp.zeros((b, nb, blk, blk), dtype)
    logdet = jnp.zeros((b,), dtype)
    ok = jnp.ones((b,), bool)
    for kb in range(nb):
        dacc = ab[:, kb, kb]
        if kb > 0:
            hist = l[:, kb, :kb]  # (B, k, BLK, BLK)
            dacc = dacc - _ein("bkxy,bkzy->bxz", hist, hist)
        lkk, wkk, ld, okk = _factor_invert(dacc)
        logdet = logdet + ld
        ok = jnp.logical_and(ok, okk)
        w = w.at[:, kb].set(wkk)
        l = l.at[:, kb, kb].set(lkk)
        if kb + 1 < nb:
            pacc = ab[:, kb + 1 :, kb]  # (B, r, BLK, BLK)
            if kb > 0:
                pacc = pacc - _ein(
                    "bikxy,bkzy->bixz", l[:, kb + 1 :, :kb], l[:, kb, :kb]
                )
            l = l.at[:, kb + 1 :, kb].set(_ein("bixy,bzy->bixz", pacc, wkk))
    return l, w, logdet, ok


def _fwd_solve(l, w, rhs):
    """z = L^-1 rhs with rhs (B, nb, BLK, R); returns same shape."""
    nb = l.shape[1]
    z = jnp.zeros_like(rhs)
    for ib in range(nb):
        acc = rhs[:, ib]
        if ib > 0:
            acc = acc - _ein("bkxy,bkyr->bxr", l[:, ib, :ib], z[:, :ib])
        z = z.at[:, ib].set(_ein("bxy,byr->bxr", w[:, ib], acc))
    return z


def _bwd_solve(l, w, rhs):
    """alpha = L^-T rhs with rhs (B, nb, BLK, R)."""
    nb = l.shape[1]
    out = jnp.zeros_like(rhs)
    for step in range(nb):
        ib = nb - 1 - step
        acc = rhs[:, ib]
        if ib + 1 < nb:
            acc = acc - _ein("bkyx,bkyr->bxr", l[:, ib + 1 :, ib], out[:, ib + 1 :])
        out = out.at[:, ib].set(_ein("byx,byr->bxr", w[:, ib], acc))
    return out


def _tinv(l, w):
    """T = L^-1 as a block tensor (B, nb, nb, BLK, BLK), lower-triangular."""
    b, nb = l.shape[0], l.shape[1]
    t = jnp.zeros_like(l)
    for ib in range(nb):
        t = t.at[:, ib, ib].set(w[:, ib])
        if ib > 0:
            acc = _ein("bkxy,bkjyz->bjxz", l[:, ib, :ib], t[:, :ib, :ib])
            t = t.at[:, ib, :ib].set(-_ein("bxy,bjyz->bjxz", w[:, ib], acc))
    return t


def _panel_size(n: int) -> int:
    """Block granularity of the outer factorization. Large buckets use
    512-wide panels: HBM traffic of the left-looking history contractions
    scales as N^3/panel (4x less than 128), and per-einsum outputs grow to
    (512, 512) free dims, which the MXU sustains far better than thin
    (128, 128) tiles. The panel diagonal factor recurses onto the 128 base
    case (_factor_invert_panel). FLOPs are unchanged."""
    return PANEL if (n % PANEL == 0 and n >= 2048) else BLK


def _prep(log_hypers, x, y, mask, kind, jitter):
    b, n, _ = x.shape
    if n % BLK != 0:
        raise ValueError(f"N must be a multiple of {BLK}, got {n}")
    a, sf2, sn2 = _build_a(log_hypers, x, mask, kind, jitter)
    l, w, logdet, ok = _blocked_chol(_to_blocks(a, _panel_size(n)))
    return a, l, w, logdet, ok, sf2, sn2


def _as_block_vec(v, blk: int = BLK):
    b, n = v.shape
    nb = n // blk
    return v.reshape(b, nb, blk, 1)


@functools.partial(jax.jit, static_argnames=("kind", "jitter"))
def gp_nll_blocked(log_hypers, x, y, mask, kind: Kernel = Kernel.MATERN32, jitter: float = 0.0):
    """Batched masked NLL, (B,) — blocked large-N path. y must be centered.

    Value half of :func:`gp_nll_blocked_with_factors` (one implementation —
    the masking/jitter/logdet conventions are lockstep-critical); under jit
    XLA dead-code-eliminates the unused factor outputs, so the value-only
    executable is unchanged."""
    return gp_nll_blocked_with_factors(
        log_hypers, x, y, mask, kind=kind, jitter=jitter
    )[0]


def gp_nll_blocked_with_factors(
    log_hypers, x, y, mask, kind: Kernel = Kernel.MATERN32, jitter: float = 0.0
):
    """Batched masked NLL plus its factorization, (B,) and a factors tuple.

    Same value as :func:`gp_nll_blocked`, but also returns
    ``factors = (l, w, z, ok)`` — the blocked Cholesky, diagonal-block
    inverses, forward-solved residual, and PSD flags — so a caller that later
    needs the gradient AT THE SAME POINT can skip the O(N^3) refactorization
    (:func:`gp_grad_blocked_from_factors`). The batched L-BFGS line search
    uses this: its last value evaluation is at the accepted iterate, so the
    follow-up gradient reuses that evaluation's factorization, saving one
    full blocked Cholesky per accepted iteration.

    Not jitted standalone: callers (the optimizer's program, or the composed
    :func:`gp_nll_and_grad_blocked`) jit the whole surrounding computation.
    """
    m = mask.astype(x.dtype)
    _, l, w, logdet, ok, _, _ = _prep(log_hypers, x, y, mask, kind, jitter)
    z = _fwd_solve(l, w, _as_block_vec(y * m, l.shape[-1]))
    quad = jnp.sum(z * z, axis=(1, 2, 3))
    n_valid = jnp.sum(m, axis=1)
    nll = 0.5 * quad + logdet + 0.5 * n_valid * _LOG2PI
    return jnp.where(ok, nll, jnp.inf), (l, w, z, ok)


def gp_grad_blocked_from_factors(
    log_hypers, x, y, mask, factors,
    kind: Kernel = Kernel.MATERN32, jitter: float = 0.0,
):
    """Analytic (B, 5) NLL gradient from a precomputed factorization.

    ``factors`` must come from :func:`gp_nll_blocked_with_factors` evaluated
    at the SAME ``log_hypers`` — the gradient is computed from (l, w, z)
    without rebuilding or refactorizing the covariance. Identical math (and,
    on a deterministic backend, identical bits) to the gradient half of
    :func:`gp_nll_and_grad_blocked`.
    """
    b, n, _ = x.shape
    nb = n // BLK
    m = mask.astype(x.dtype)
    l, w, z, ok = factors
    sf2 = jnp.exp(log_hypers[:, 3])
    sn2 = jnp.exp(log_hypers[:, 4])

    alpha = _bwd_solve(l, w, z).reshape(b, n)  # (B, N)
    t = _tinv(l, w)
    if l.shape[-1] != BLK:
        # The row-streamed trace loop below runs at 128 granularity (its
        # (B, j, blk, blk, 3) displacement tensors would be 16x larger at
        # 512); T is exactly lower-triangular elementwise, so re-blocking
        # the panel T at 128 is a pure transpose/reshape.
        t = _to_blocks(_unblock(t), BLK)
    # Row-streamed gradient traces. K^-1 = T^T T with T block-lower-
    # triangular, and both Q = K^-1 - alpha alpha^T and every dK/dtheta are
    # symmetric, so the trace <Q, dK> = sum_i (<Q_ii, dK_ii> +
    # 2 sum_{j<i} <Q_ij, dK_ij>) needs only the lower block triangle —
    # computed ONE BLOCK-ROW AT A TIME and contracted against the kernel
    # derivatives immediately. Nothing (N, N)-sized beyond A/L/T is ever
    # materialized: the old path held K^-1, Q, d2, and 3 weight matrices
    # (~8 full buffers, 1.5 GB+ each per 8-cell chunk at N = 4096), which
    # capped chunk rows at the HBM budget and multiplied launch counts.
    # Same nb^3/6 block-matmul count for the K^-1 rows.
    ell = jnp.exp(log_hypers[:, :3])
    qx = x / ell[:, None, :]  # (B, N, 3)
    qxb = qx.reshape(b, nb, BLK, 3)
    mb = m.reshape(b, nb, BLK)
    ab_ = alpha.reshape(b, nb, BLK)
    g_ell = jnp.zeros((b, 3), x.dtype)
    gs = jnp.zeros((b,), x.dtype)
    qdiag = jnp.zeros((b,), x.dtype)
    for i in range(nb):
        # lower-triangle block-row i of K^-1: (B, i+1, BLK, BLK); axes are
        # (batch, column block j, row point x, column point z)
        row = _ein("bkxy,bkjxz->bjyz", t[:, i:, i], t[:, i:, : i + 1])
        qrow = row - jnp.einsum("bx,bjz->bjxz", ab_[:, i], ab_[:, : i + 1])
        # double off-diagonal blocks (symmetry), once for the diagonal block
        wgt = jnp.concatenate(
            [jnp.full((i,), 2.0, x.dtype), jnp.ones((1,), x.dtype)]
        )
        qrow = qrow * wgt[None, :, None, None]
        mrow = mb[:, i][:, None, :, None] * mb[:, : i + 1][:, :, None, :]
        qm = qrow * mrow
        dd = qxb[:, i][:, None, :, None, :] - qxb[:, : i + 1][:, :, None, :, :]
        d2 = jnp.sum(dd * dd, axis=-1)  # (B, i+1, BLK, BLK)
        qmw = qm * (sf2[:, None, None, None] * pallas_gp._dlogell_weight(kind, d2))
        g_ell = g_ell + jnp.stack(
            [jnp.einsum("bjxz,bjxz->b", qmw, dd[..., d] ** 2) for d in range(3)],
            axis=1,
        )
        kblk = sf2[:, None, None, None] * pallas_gp._shape_fn(kind, d2)
        gs = gs + jnp.einsum("bjxz,bjxz->b", qm, kblk)
        # diagonal elements of Q (weight 1 in qrow's last block)
        qdiag = qdiag + jnp.einsum(
            "bxx,bx->b", qrow[:, i], mb[:, i]
        )
    gs = gs + jitter * sf2 * qdiag
    gn = sn2 * qdiag
    grad = 0.5 * jnp.concatenate([g_ell, gs[:, None], gn[:, None]], axis=1)
    return jnp.where(ok[:, None], grad, jnp.nan)


@functools.partial(jax.jit, static_argnames=("kind", "jitter"))
def gp_nll_and_grad_blocked(
    log_hypers, x, y, mask, kind: Kernel = Kernel.MATERN32, jitter: float = 0.0
):
    """Batched masked NLL + analytic (B, 5) gradient — blocked large-N path.

    Composition of :func:`gp_nll_blocked_with_factors` and
    :func:`gp_grad_blocked_from_factors` (one factorization serves both)."""
    nll, factors = gp_nll_blocked_with_factors(
        log_hypers, x, y, mask, kind=kind, jitter=jitter
    )
    grad = gp_grad_blocked_from_factors(
        log_hypers, x, y, mask, factors, kind=kind, jitter=jitter
    )
    return nll, grad


@functools.partial(jax.jit, static_argnames=("kind", "jitter"))
def gp_predict_blocked(
    log_hypers, x, y, xstar, mask, mean,
    kind: Kernel = Kernel.MATERN32, jitter: float = 0.0,
):
    """Posterior (mean, std, lZ, prior_std, ok) — blocked large-N path.

    y raw (uncentered); mean (B,) scalar prior mean per cell.
    """
    b, n, _ = x.shape
    m = mask.astype(x.dtype)
    ym = (y - mean[:, None]) * m
    _, l, w, logdet, ok, sf2, _ = _prep(log_hypers, x, y, mask, kind, jitter)

    ell = jnp.exp(log_hypers[:, :3])
    ks = jax.vmap(
        lambda xi, xsi, ei, si, mi: K.cross_kernel(
            xi, xsi[None, :], ei, si, kind=kind, mask=mi
        )[:, 0]
    )(x, xstar, ell, sf2, mask)  # (B, N)

    rhs = jnp.concatenate(
        [_as_block_vec(ym, l.shape[-1]), _as_block_vec(ks, l.shape[-1])], axis=3
    )  # (B, nb, blk, 2)
    zv = _fwd_solve(l, w, rhs)
    z = zv[..., 0]
    v = zv[..., 1]
    quad = jnp.sum(z * z, axis=(1, 2))
    fs = mean + jnp.sum(z * v, axis=(1, 2))
    var = jnp.maximum(sf2 - jnp.sum(v * v, axis=(1, 2)), 0.0)
    n_valid = jnp.sum(m, axis=1)
    lz = -(0.5 * quad + logdet + 0.5 * n_valid * _LOG2PI)
    nan = jnp.nan
    return (
        jnp.where(ok, fs, nan),
        jnp.where(ok, jnp.sqrt(var), nan),
        jnp.where(ok, lz, nan),
        jnp.sqrt(sf2) * jnp.ones((b,), x.dtype),
        ok,
    )
