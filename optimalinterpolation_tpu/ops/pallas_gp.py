"""Fused Pallas TPU kernel for the exact-GP marginal likelihood.

This is the framework's hand-written replacement for the reference's implicit
native layer — LAPACK ``cholesky``/``solve`` plus scipy ``pdist`` kernel
builds driven from ``SMLII`` (``/root/reference/2021_paper_production/
GPR_CS2S3.py:107-141``). One kernel invocation per grid step processes a tile
of TB cells fully VMEM-resident (zero HBM traffic for any (N, N)
intermediate):

  1. the masked covariance A = K(x) o mm^T + diag(sf2+sn2+jitter | 1-m),
  2. a blocked right-looking Cholesky A = L L^T. The 128x128 diagonal
     factorization is STATICALLY UNROLLED and fully vectorized over the TB
     cell tile; because the trailing Schur complement stays symmetric,
     "column j" is read as a static lane slice of the symmetric block — no
     dynamic lane indexing, no per-step matmuls, no transposes. The same
     elimination ops applied to I accumulate W = L_kk^-1 in the same pass
     (E A = L^T  =>  E = L^-1). Panel/trailing updates are batched MXU
     matmuls against the explicit W blocks,
  3. z = L^-1 ym  ->  quad = |z|^2, logdet from the pivot chain,
  4. (grad variant) alpha = L^-T z, T = L^-1 by block forward substitution,
     and Q = A^-1 - alpha alpha^T folded block-by-block into the five
     analytic hyperparameter gradients, with the kernel derivatives rebuilt
     on the fly from x (never stored):

       d nll / d log ell_d  = 0.5 <Q, sf2 * w_kind(r) * dq_d^2>
       d nll / d log sf2    = 0.5 <Q, K + jitter*sf2*diag(m)>
       d nll / d log sn2    = 0.5 * sn2 * sum_i Q_ii m_i

Measured on v5e, the XLA path runs its batched Cholesky at ~100 GFLOP/s and
round-trips every (N, N) intermediate through HBM; this kernel keeps the
O(N^3) work on the MXU and the O(N^2) elementwise work on the VPU, one HBM
read of x per cell.

Semantics match :func:`optimalinterpolation_tpu.models.exact_gp.
neg_log_marginal_likelihood` exactly (same masking, jitter, determinant
conventions); verified to ~1e-13 against jax.grad of the XLA path in f64
interpret mode, and slightly MORE accurate than the XLA f32 path vs the f64
oracle (matmul chains run at multi-pass MXU precision).

N must be a multiple of 128 in [128, 1024] (bucket capacities already are);
larger buckets stay on the XLA path until an HBM-staged variant lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optimalinterpolation_tpu.ops.kernels import Kernel

__all__ = ["gp_nll", "gp_nll_and_grad", "supported", "cell_tile", "BLK"]

BLK = 128
_LOG2PI = 1.8378770664093453
# Mosaic in-kernel dots support only DEFAULT/HIGHEST; DEFAULT (single-pass
# bf16, ~3e-3 relative error) is fatal in Cholesky chains, so HIGHEST it is.
# (The XLA-level blocked path uses HIGH = 3-pass bf16: same measured accuracy
# at ~3x the matmul rate — not available inside Pallas.)
_HI = jax.lax.Precision.HIGHEST

_NU2 = {
    Kernel.MATERN12: 1.0,
    Kernel.MATERN32: 3.0,
    Kernel.MATERN52: 5.0,
    Kernel.SE: 1.0,
}


def _shape_fn(kind: Kernel, d2):
    """k/sf2 as a function of the scaled squared distance d2 = sum_d dq_d^2."""
    if kind is Kernel.SE:
        return jnp.exp(-0.5 * d2)
    nu2 = _NU2[kind]
    r = jnp.sqrt(jnp.maximum(nu2 * d2, 0.0))
    if kind is Kernel.MATERN12:
        return jnp.exp(-r)
    if kind is Kernel.MATERN32:
        return (1.0 + r) * jnp.exp(-r)
    return (1.0 + r + r * r / 3.0) * jnp.exp(-r)  # MATERN52


def _dlogell_weight(kind: Kernel, d2):
    """w(d2) such that d k / d log ell_d = sf2 * w(d2) * dq_d^2.

    With r = sqrt(nu2*d2) and dr/dlog ell_d = -nu2*dq_d^2/r:
      M12: dk/dr = -sf2 e^-r          -> w = e^-r / r   (-> 0 as r -> 0)
      M32: dk/dr = -sf2 r e^-r        -> w = 3 e^-r
      M52: dk/dr = -sf2 e^-r r(1+r)/3 -> w = (5/3) e^-r (1+r)
      SE : k = sf2 e^{-d2/2}          -> w = e^{-d2/2}
    """
    if kind is Kernel.SE:
        return jnp.exp(-0.5 * d2)
    nu2 = _NU2[kind]
    r = jnp.sqrt(jnp.maximum(nu2 * d2, 0.0))
    if kind is Kernel.MATERN12:
        return jnp.where(r > 0.0, jnp.exp(-r) / jnp.where(r > 0.0, r, 1.0), 0.0)
    if kind is Kernel.MATERN32:
        return 3.0 * jnp.exp(-r)
    return (5.0 / 3.0) * jnp.exp(-r) * (1.0 + r)  # MATERN52


def _red(t):
    """(TB, m, n) -> (TB, 1, 1) sum. Two single-axis reductions: the Mosaic
    lowering of a multi-axis reduce (axis=(1, 2)) CHECK-crashes the TPU
    compiler (layout.h implicit-dim assert); sequential reduces are fine."""
    return jnp.sum(jnp.sum(t, axis=2, keepdims=True), axis=1, keepdims=True)


def _bmm(a, b, ta=False, tb=False):
    """Batched (TB, m, k) x (TB, k, n) MXU matmul at multi-pass precision.

    The TPU MXU's default f32 "matmul" is a single bf16 pass (~3e-3 relative
    error) — catastrophic inside a Cholesky chain; _HI selects the multi-pass
    scheme with f32-equivalent accuracy.
    """
    da = (1,) if ta else (2,)
    db = (2,) if tb else (1,)
    return jax.lax.dot_general(
        a, b, ((da, db), ((0,), (0,))),
        preferred_element_type=a.dtype, precision=_HI,
    )


def _factor_invert_inplace(d_scr, wb_scr, dtype):
    """Unrolled Cholesky of symmetric (TB, BLK, BLK) blocks, in place on
    scratch, fused with the triangular inverse.

    On return: d_scr holds U (= L^T) rows in rows 0.. (garbage below the
    diagonal is masked at write-out), wb_scr holds W = L^-1 (the elimination
    row ops applied to I: E A = L^T  =>  E = L^-1). Returns (logdet, ok):
    logdet = sum log l_jj = 0.5 sum log pivots, ok = all pivots positive.

    Two key tricks: (a) the trailing Schur complement stays SYMMETRIC, so
    column j is the static lane slice d[:, :, j:j+1] — no dynamic lane
    indexing, no matmuls, no transposes — and every op vectorizes over the
    TB cell tile, amortizing instruction overhead; (b) updates are
    read-modify-write on scratch refs, so the unrolled chain keeps O(1)
    VMEM buffers live (a value-based chain blows the Mosaic scoped-VMEM
    stack: ~90 live (TB,128,128) SSA values at BLK=128).
    """
    tb = d_scr.shape[0]
    col_row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, BLK), 2)
    col_col = jax.lax.broadcasted_iota(jnp.int32, (1, BLK, 1), 1)
    logdet = jnp.zeros((tb, 1, 1), dtype)
    # ok as a float {0,1} accumulator: (TB,1,1) bool fori-loop carries crash
    # the Mosaic compiler at nb >= 2.
    ok = jnp.ones((tb, 1, 1), dtype)
    tiny = jnp.asarray(1e-37, dtype)
    for j in range(BLK):
        piv = d_scr[:, j : j + 1, j : j + 1]  # (TB, 1, 1)
        ok = ok * jnp.where(piv > 0.0, 1.0, 0.0).astype(dtype)
        piv_s = jnp.maximum(piv, tiny)
        logdet = logdet + 0.5 * jnp.log(piv_s)
        rs = jax.lax.rsqrt(piv_s)
        inv = 1.0 / piv_s
        drow = d_scr[:, j : j + 1, :]  # (TB, 1, BLK) — row j
        dcol = d_scr[:, :, j : j + 1]  # (TB, BLK, 1) — col j == row j (symmetry)
        # U row j (zero left of the diagonal)
        d_scr[:, j : j + 1, :] = jnp.where(col_row >= j, drow * rs, 0.0)
        # trailing symmetric rank-1 downdate on rows > j only (row j now
        # holds the final U row and must not be touched again)
        colf = jnp.where(col_col > j, dcol * inv, 0.0)  # (TB, BLK, 1)
        d_scr[...] = d_scr[...] - colf * drow
        # elimination applied to W: rows i > j minus (l_ij/l_jj) W[j, :],
        # then row j scaled by 1/l_jj.
        wrow = wb_scr[:, j : j + 1, :]
        wb_scr[...] = wb_scr[...] - colf * wrow
        wb_scr[:, j : j + 1, :] = wrow * rs
    return logdet, ok


def _nll_kernel(
    logh_ref,  # (TB, 1, 8) VMEM: [log ell x3, log sf2, log sn2, 0, 0, 0]
    x8_ref,  # (TB, N, 8) VMEM: [x, y, t, mask, 0...] (sublane-oriented)
    xt_ref,  # (TB, 4, N) VMEM: [x; y; t; mask]      (lane-oriented)
    y_ref,  # (TB, 1, N)
    nll_ref,  # (TB, 1, 1) out
    grad_ref,  # (TB, 1, 8) out
    a_scr,  # (TB, N, N): A -> L blocks (U = L^T on the diagonal)
    t_scr,  # (TB, N, N) grad variant: T = L^-1; dummy (TB, BLK, BLK) else
    w_scr,  # (TB, N, BLK): per-diagonal-block L^-1
    v_scr,  # (TB, VROWS, BLK): z then alpha (one 128-block per sublane row)
    d_scr,  # (TB, BLK, BLK): diagonal-block factorization workspace
    wb_scr,  # (TB, BLK, BLK): block-inverse workspace
    *,
    n: int,
    kind: Kernel,
    jitter: float,
    with_grad: bool,
    phases: int = 99,  # debug: 1=build, 2=+chol, 3=+solve (full value path)
):
    dtype = a_scr.dtype
    tb = a_scr.shape[0]
    nb = n // BLK
    inv_ell = [jnp.exp(-logh_ref[:, :, d : d + 1]) for d in range(3)]  # (TB,1,1)
    sf2 = jnp.exp(logh_ref[:, :, 3:4])
    sn2 = jnp.exp(logh_ref[:, :, 4:5])

    diag_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (1, BLK, BLK), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (1, BLK, BLK), 2)
    )
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    def qi_cols(i0):
        """Sublane-oriented scaled coords + mask, rows i0..: 4x (TB, BLK, 1)."""
        xi = x8_ref[:, pl.ds(i0, BLK), :]  # (TB, BLK, 8)
        return (
            xi[:, :, 0:1] * inv_ell[0],
            xi[:, :, 1:2] * inv_ell[1],
            xi[:, :, 2:3] * inv_ell[2],
            xi[:, :, 3:4],
        )

    def qj_rows(j0):
        """Lane-oriented scaled coords + mask, cols j0..: 4x (TB, 1, BLK)."""
        xj = xt_ref[:, :, pl.ds(j0, BLK)]  # (TB, 4, BLK)
        return (
            xj[:, 0:1, :] * inv_ell[0],
            xj[:, 1:2, :] * inv_ell[1],
            xj[:, 2:3, :] * inv_ell[2],
            xj[:, 3:4, :],
        )

    def d2_and_masks(i0, j0):
        ai = qi_cols(i0)
        aj = qj_rows(j0)
        d2 = (ai[0] - aj[0]) ** 2 + (ai[1] - aj[1]) ** 2 + (ai[2] - aj[2]) ** 2
        return d2, ai[3], aj[3]  # (TB,BLK,BLK), (TB,BLK,1), (TB,1,BLK)

    # ---- 1. build A -----------------------------------------------------
    def build_row(ib, _):
        i0 = ib * BLK

        def build_col(jb, _):
            j0 = jb * BLK
            d2, mi, mj = d2_and_masks(i0, j0)
            k = sf2 * _shape_fn(kind, d2) * mi * mj
            a_scr[:, pl.ds(i0, BLK), pl.ds(j0, BLK)] = k
            return 0

        jax.lax.fori_loop(0, nb, build_col, 0)
        _, mi, _ = d2_and_masks(i0, i0)
        blk = a_scr[:, pl.ds(i0, BLK), pl.ds(i0, BLK)]
        dval = (sf2 + sn2 + jitter * sf2) * mi + (one - mi)  # (TB, BLK, 1)
        a_scr[:, pl.ds(i0, BLK), pl.ds(i0, BLK)] = jnp.where(
            diag_ids, dval * jnp.ones((1, 1, BLK), dtype), blk
        )
        return 0

    jax.lax.fori_loop(0, nb, build_row, 0)
    if phases < 2:
        nll_ref[...] = jnp.zeros((tb, 1, 1), dtype)
        grad_ref[...] = jnp.zeros((tb, 1, 8), dtype)
        return

    # ---- 2. blocked right-looking Cholesky -------------------------------
    def chol_step(kb, carry):
        logdet, okall = carry
        k0 = kb * BLK
        d_scr[...] = a_scr[:, pl.ds(k0, BLK), pl.ds(k0, BLK)]
        wb_scr[...] = jnp.broadcast_to(
            jnp.eye(BLK, dtype=dtype)[None], (tb, BLK, BLK)
        )
        ld, ok = _factor_invert_inplace(d_scr, wb_scr, dtype)
        w = wb_scr[...]
        a_scr[:, pl.ds(k0, BLK), pl.ds(k0, BLK)] = d_scr[...]
        w_scr[:, pl.ds(k0, BLK), :] = w
        logdet = logdet + ld
        okall = okall * ok

        def panel(ib, _):
            i0 = ib * BLK

            @pl.when(ib > kb)
            def _():
                l = _bmm(a_scr[:, pl.ds(i0, BLK), pl.ds(k0, BLK)], w, tb=True)
                a_scr[:, pl.ds(i0, BLK), pl.ds(k0, BLK)] = l

                def trail(jb, _):
                    j0 = jb * BLK

                    @pl.when(jnp.logical_and(jb > kb, jb <= ib))
                    def _():
                        lj = a_scr[:, pl.ds(j0, BLK), pl.ds(k0, BLK)]
                        blk = a_scr[:, pl.ds(i0, BLK), pl.ds(j0, BLK)]
                        a_scr[:, pl.ds(i0, BLK), pl.ds(j0, BLK)] = blk - _bmm(
                            l, lj, tb=True
                        )

                    return 0

                jax.lax.fori_loop(0, nb, trail, 0)

            return 0

        jax.lax.fori_loop(0, nb, panel, 0)
        return logdet, okall

    logdet, okall = jax.lax.fori_loop(
        0, nb, chol_step,
        (jnp.zeros((tb, 1, 1), dtype), jnp.ones((tb, 1, 1), dtype)),
    )

    if phases < 3:
        nll_ref[...] = logdet
        grad_ref[...] = jnp.zeros((tb, 1, 8), dtype)
        return

    # ---- 3. z = L^-1 ym, quad = |z|^2 -------------------------------------
    v_scr[...] = jnp.zeros(v_scr.shape, dtype)

    def ym_row(i0):
        yv = y_ref[:, :, pl.ds(i0, BLK)]  # (TB, 1, BLK)
        mv = xt_ref[:, 3:4, pl.ds(i0, BLK)]
        return yv * mv

    def fwd_step(ib, _):
        i0 = ib * BLK

        def gather(kb, acc):
            l_ik = a_scr[:, pl.ds(i0, BLK), pl.ds(kb * BLK, BLK)]
            zk = v_scr[:, pl.ds(kb, 1), :]  # (TB, 1, BLK); zeros if unwritten
            sel = jnp.where(kb < ib, one, zero)
            return acc - sel * _bmm(zk, l_ik, tb=True)  # (L_ik z_k)^T

        acc = jax.lax.fori_loop(0, nb, gather, ym_row(i0))
        w = w_scr[:, pl.ds(i0, BLK), :]
        v_scr[:, pl.ds(ib, 1), :] = _bmm(acc, w, tb=True)  # (W acc^T)^T
        return 0

    jax.lax.fori_loop(0, nb, fwd_step, 0)
    z = v_scr[:, pl.ds(0, nb), :]
    quad = _red(z * z)  # (TB, 1, 1)
    n_valid = _red(xt_ref[:, 3:4, :])
    nll = 0.5 * quad + logdet + 0.5 * n_valid * _LOG2PI
    nll_ref[...] = jnp.where(okall > 0.5, nll, jnp.asarray(jnp.inf, dtype))

    if not with_grad:
        grad_ref[...] = jnp.zeros((tb, 1, 8), dtype)
        return

    if phases < 4:
        grad_ref[...] = jnp.zeros((tb, 1, 8), dtype)
        return

    # ---- 4. alpha = L^-T z (blocked backward substitution, bottom-up) ----
    def bwd_step(step, _):
        ib = nb - 1 - step
        i0 = ib * BLK
        rhs = v_scr[:, pl.ds(ib, 1), :]  # still z for this block

        def gather(kb, acc):
            l_ki = a_scr[:, pl.ds(kb * BLK, BLK), pl.ds(i0, BLK)]  # L_kb,ib
            ak = v_scr[:, pl.ds(kb, 1), :]  # alpha for kb > ib
            sel = jnp.where(kb > ib, one, zero)
            return acc - sel * _bmm(ak, l_ki)  # (L_kb,ib^T a_k)^T

        acc = jax.lax.fori_loop(0, nb, gather, rhs)
        w = w_scr[:, pl.ds(i0, BLK), :]
        v_scr[:, pl.ds(ib, 1), :] = _bmm(acc, w)
        return 0

    jax.lax.fori_loop(0, nb, bwd_step, 0)

    if phases < 5:
        grad_ref[...] = jnp.zeros((tb, 1, 8), dtype)
        return

    # ---- 5. T = L^-1: T_jj = W_j; T_ij = -W_i sum_{j<=k<i} L_ik T_kj ------
    t_scr[...] = jnp.zeros(t_scr.shape, dtype)

    def tcol(jb, _):
        j0 = jb * BLK

        def trow(ib, _):
            i0 = ib * BLK

            @pl.when(ib == jb)
            def _():
                t_scr[:, pl.ds(i0, BLK), pl.ds(j0, BLK)] = w_scr[
                    :, pl.ds(i0, BLK), :
                ]

            @pl.when(ib > jb)
            def _():
                def gather(kb, acc):
                    l_ik = a_scr[:, pl.ds(i0, BLK), pl.ds(kb * BLK, BLK)]
                    t_kj = t_scr[:, pl.ds(kb * BLK, BLK), pl.ds(j0, BLK)]
                    sel = jnp.where(jnp.logical_and(kb >= jb, kb < ib), one, zero)
                    return acc + sel * _bmm(l_ik, t_kj)

                acc = jax.lax.fori_loop(
                    0, nb, gather, jnp.zeros((tb, BLK, BLK), dtype)
                )
                w_i = w_scr[:, pl.ds(i0, BLK), :]
                t_scr[:, pl.ds(i0, BLK), pl.ds(j0, BLK)] = -_bmm(w_i, acc)

            return 0

        jax.lax.fori_loop(0, nb, trow, 0)
        return 0

    jax.lax.fori_loop(0, nb, tcol, 0)

    if phases < 6:
        grad_ref[...] = jnp.zeros((tb, 1, 8), dtype)
        return

    # ---- 6. gradients: Q = A^-1 - alpha alpha^T, lower blocks x2 ----------
    c_jit = jitter * sf2  # (TB, 1, 1)

    def grad_col(jb, carry):
        j0 = jb * BLK

        def grad_row(ib, carry):
            g0, g1, g2, gs, gn = carry
            i0 = ib * BLK

            def compute(carry):
                g0, g1, g2, gs, gn = carry

                def kin(kb, acc):
                    sel = jnp.where(kb >= ib, one, zero)
                    t_ki = t_scr[:, pl.ds(kb * BLK, BLK), pl.ds(i0, BLK)]
                    t_kj = t_scr[:, pl.ds(kb * BLK, BLK), pl.ds(j0, BLK)]
                    return acc + sel * _bmm(t_ki, t_kj, ta=True)

                kinv = jax.lax.fori_loop(
                    0, nb, kin, jnp.zeros((tb, BLK, BLK), dtype)
                )
                ai = v_scr[:, pl.ds(ib, 1), :]  # (TB, 1, BLK)
                aj = v_scr[:, pl.ds(jb, 1), :]
                q = kinv - jax.lax.dot_general(
                    ai, aj, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=dtype, precision=_HI,
                )  # (TB, BLK, BLK) batched outer product

                mult = jnp.where(ib == jb, one, 2.0 * one)
                d2, mi, mj = d2_and_masks(i0, j0)
                qm = q * (mi * mj)
                wgt = sf2 * _dlogell_weight(kind, d2)

                aiq = qi_cols(i0)
                ajq = qj_rows(j0)

                g0 = g0 + mult * _red(qm * wgt * (aiq[0] - ajq[0]) ** 2)
                g1 = g1 + mult * _red(qm * wgt * (aiq[1] - ajq[1]) ** 2)
                g2 = g2 + mult * _red(qm * wgt * (aiq[2] - ajq[2]) ** 2)
                kblk = sf2 * _shape_fn(kind, d2)
                qdiag = _red(jnp.where(diag_ids, qm, zero))
                ondiag = jnp.where(ib == jb, one, zero)
                gs = gs + mult * _red(qm * kblk) + ondiag * c_jit * qdiag
                gn = gn + ondiag * sn2 * qdiag
                return g0, g1, g2, gs, gn

            return jax.lax.cond(ib >= jb, compute, lambda c: c, carry)

        return jax.lax.fori_loop(0, nb, grad_row, carry)

    zeros = jnp.zeros((tb, 1, 1), dtype)
    g0, g1, g2, gs, gn = jax.lax.fori_loop(
        0, nb, grad_col, (zeros, zeros, zeros, zeros, zeros)
    )
    nanv = jnp.asarray(jnp.nan, dtype)
    out = 0.5 * jnp.concatenate(
        [g0, g1, g2, gs, gn, zeros, zeros, zeros], axis=2
    )  # (TB, 1, 8)
    grad_ref[...] = jnp.where(okall > 0.5, out, nanv)


def supported(n: int) -> bool:
    """The VMEM-resident kernel handles N in [128, 1024], multiples of 128."""
    return n % BLK == 0 and BLK <= n <= 1024


def cell_tile(n: int, with_grad: bool) -> int:
    """Cells per grid step, sized so the scratches fit ~13 MB of VMEM.

    Residents: A (n^2) [+ T (n^2) in the grad variant] + W (n*BLK) + small.
    """
    # Leave ~half of VMEM for Mosaic stack temporaries (measured: a 4-cell
    # tile at N=512 with 9.6 MB of scratch needs ~22 MB scoped total).
    budget = 7 * 2**20
    per_cell = (n * n * (2 if with_grad else 1) + n * BLK + 16 * BLK) * 4
    tile = budget // per_cell
    for t in (8, 4, 2, 1):
        if t <= tile:
            return t
    return 1


@functools.partial(
    jax.jit, static_argnames=("kind", "jitter", "with_grad", "interpret", "phases")
)
def _gp_nll_call(
    log_hypers: jax.Array,  # (B, 5)
    x: jax.Array,  # (B, N, 3)
    y: jax.Array,  # (B, N)
    mask: jax.Array,  # (B, N)
    kind: Kernel = Kernel.MATERN32,
    jitter: float = 0.0,
    with_grad: bool = False,
    interpret: bool = False,
    phases: int = 99,
):
    b, n, _ = x.shape
    if not supported(n):
        raise ValueError(f"pallas GP kernel needs N in [128, 1024] /128, got {n}")
    dtype = x.dtype
    nb = n // BLK
    vrows = max(nb, 8)
    tb = cell_tile(n, with_grad)
    bp = -(-b // tb) * tb  # pad cells to a tile multiple (mask-0 rows: A = I)

    def padb(arr):
        if bp == b:
            return arr
        pad = jnp.zeros((bp - b,) + arr.shape[1:], arr.dtype)
        return jnp.concatenate([arr, pad], axis=0)

    xp = padb(x)
    maskp = padb(mask.astype(dtype))
    m3 = maskp[:, :, None]
    x8 = jnp.concatenate([xp, m3, jnp.zeros((bp, n, 4), dtype)], axis=2)
    xt = jnp.concatenate([jnp.swapaxes(xp, 1, 2), maskp[:, None, :]], axis=1)
    logh8 = padb(
        jnp.concatenate([log_hypers, jnp.zeros((b, 3), dtype)], axis=1)
    )[:, None, :]
    y3 = padb(y)[:, None, :]

    t_shape = (tb, n, n) if with_grad else (tb, BLK, BLK)
    kernel = functools.partial(
        _nll_kernel, n=n, kind=Kernel(kind), jitter=jitter,
        with_grad=with_grad, phases=phases,
    )
    nll, grad = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 4, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, 1, 1), dtype),
            jax.ShapeDtypeStruct((bp, 1, 8), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, n, n), dtype),
            pltpu.VMEM(t_shape, dtype),
            pltpu.VMEM((tb, n, BLK), dtype),
            pltpu.VMEM((tb, vrows, BLK), dtype),
            pltpu.VMEM((tb, BLK, BLK), dtype),
            pltpu.VMEM((tb, BLK, BLK), dtype),
        ],
        interpret=interpret,
    )(logh8, x8, xt, y3)
    return nll[:b, 0, 0], grad[:b, 0, :5]


def gp_nll(
    log_hypers, x, y, mask,
    kind: Kernel = Kernel.MATERN32,
    jitter: float = 0.0,
    interpret: bool = False,
):
    """Batched masked GP NLL, (B,) — value only (line-search evaluations)."""
    nll, _ = _gp_nll_call(
        log_hypers, x, y, mask, kind=kind, jitter=jitter,
        with_grad=False, interpret=interpret,
    )
    return nll


def gp_nll_and_grad(
    log_hypers, x, y, mask,
    kind: Kernel = Kernel.MATERN32,
    jitter: float = 0.0,
    interpret: bool = False,
):
    """Batched masked GP NLL and its (B, 5) analytic gradient."""
    return _gp_nll_call(
        log_hypers, x, y, mask, kind=kind, jitter=jitter,
        with_grad=True, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Fused posterior predict (the GPR3D predict block, GPR_CS2S3.py:173-184)
# ---------------------------------------------------------------------------


def _predict_kernel(
    logh_ref,  # (TB, 1, 8): [log ell x3, log sf2, log sn2, 0, 0, 0]
    x8_ref,  # (TB, N, 8): [x, y, t, mask, 0...] (sublane-oriented)
    xt_ref,  # (TB, 4, N): [x; y; t; mask]      (lane-oriented)
    y_ref,  # (TB, 1, N) RAW (uncentered) observations
    xs_ref,  # (TB, 1, 8): [xs_x, xs_y, xs_t, prior_mean, 0...]
    out_ref,  # (TB, 1, 8): [mean, std, lZ, prior_std, ok, 0, 0, 0]
    a_scr,  # (TB, N, N)
    w_scr,  # (TB, N, BLK)
    v_scr,  # (TB, VROWS, BLK): z = L^-1 (y - mean) m
    u_scr,  # (TB, VROWS, BLK): v = L^-1 ks
    d_scr,  # (TB, BLK, BLK)
    wb_scr,  # (TB, BLK, BLK)
    *,
    n: int,
    kind: Kernel,
    jitter: float,
):
    """Posterior mean/std/lZ at one test point per cell, fully fused.

    mean* = m + ks^T A^-1 (y - m)  = m + (L^-1 ks) . (L^-1 ym)   (no L^-T
    solve needed), var* = sf2 - |L^-1 ks|^2, lZ = -(quad/2 + logdet +
    n/2 log 2pi) — exactly ``GPR3D``'s predict block on the padded problem.
    """
    dtype = a_scr.dtype
    tb = a_scr.shape[0]
    nb = n // BLK
    inv_ell = [jnp.exp(-logh_ref[:, :, d : d + 1]) for d in range(3)]
    sf2 = jnp.exp(logh_ref[:, :, 3:4])
    sn2 = jnp.exp(logh_ref[:, :, 4:5])
    mean = xs_ref[:, :, 3:4]  # (TB, 1, 1)

    diag_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (1, BLK, BLK), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (1, BLK, BLK), 2)
    )
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    def qi_cols(i0):
        xi = x8_ref[:, pl.ds(i0, BLK), :]
        return (
            xi[:, :, 0:1] * inv_ell[0],
            xi[:, :, 1:2] * inv_ell[1],
            xi[:, :, 2:3] * inv_ell[2],
            xi[:, :, 3:4],
        )

    def qj_rows(j0):
        xj = xt_ref[:, :, pl.ds(j0, BLK)]
        return (
            xj[:, 0:1, :] * inv_ell[0],
            xj[:, 1:2, :] * inv_ell[1],
            xj[:, 2:3, :] * inv_ell[2],
            xj[:, 3:4, :],
        )

    # ---- build A ---------------------------------------------------------
    def build_row(ib, _):
        i0 = ib * BLK
        ai = qi_cols(i0)

        def build_col(jb, _):
            j0 = jb * BLK
            aj = qj_rows(j0)
            d2 = (ai[0] - aj[0]) ** 2 + (ai[1] - aj[1]) ** 2 + (ai[2] - aj[2]) ** 2
            a_scr[:, pl.ds(i0, BLK), pl.ds(j0, BLK)] = (
                sf2 * _shape_fn(kind, d2) * ai[3] * aj[3]
            )
            return 0

        jax.lax.fori_loop(0, nb, build_col, 0)
        mi = ai[3]
        blk = a_scr[:, pl.ds(i0, BLK), pl.ds(i0, BLK)]
        dval = (sf2 + sn2 + jitter * sf2) * mi + (one - mi)
        a_scr[:, pl.ds(i0, BLK), pl.ds(i0, BLK)] = jnp.where(
            diag_ids, dval * jnp.ones((1, 1, BLK), dtype), blk
        )
        return 0

    jax.lax.fori_loop(0, nb, build_row, 0)

    # ---- blocked Cholesky (same scheme as the NLL kernel) -----------------
    def chol_step(kb, carry):
        logdet, okall = carry
        k0 = kb * BLK
        d_scr[...] = a_scr[:, pl.ds(k0, BLK), pl.ds(k0, BLK)]
        wb_scr[...] = jnp.broadcast_to(jnp.eye(BLK, dtype=dtype)[None], (tb, BLK, BLK))
        ld, ok = _factor_invert_inplace(d_scr, wb_scr, dtype)
        a_scr[:, pl.ds(k0, BLK), pl.ds(k0, BLK)] = d_scr[...]
        w_scr[:, pl.ds(k0, BLK), :] = wb_scr[...]

        def panel(ib, _):
            i0 = ib * BLK

            @pl.when(ib > kb)
            def _():
                l = _bmm(a_scr[:, pl.ds(i0, BLK), pl.ds(k0, BLK)], wb_scr[...], tb=True)
                a_scr[:, pl.ds(i0, BLK), pl.ds(k0, BLK)] = l

                def trail(jb, _):
                    j0 = jb * BLK

                    @pl.when(jnp.logical_and(jb > kb, jb <= ib))
                    def _():
                        lj = a_scr[:, pl.ds(j0, BLK), pl.ds(k0, BLK)]
                        blk = a_scr[:, pl.ds(i0, BLK), pl.ds(j0, BLK)]
                        a_scr[:, pl.ds(i0, BLK), pl.ds(j0, BLK)] = blk - _bmm(
                            l, lj, tb=True
                        )

                    return 0

                jax.lax.fori_loop(0, nb, trail, 0)

            return 0

        jax.lax.fori_loop(0, nb, panel, 0)
        return logdet + ld, okall * ok

    logdet, okall = jax.lax.fori_loop(
        0, nb, chol_step,
        (jnp.zeros((tb, 1, 1), dtype), jnp.ones((tb, 1, 1), dtype)),
    )

    # ---- dual forward solve: z = L^-1 ym, v = L^-1 ks ---------------------
    v_scr[...] = jnp.zeros(v_scr.shape, dtype)
    u_scr[...] = jnp.zeros(u_scr.shape, dtype)

    def rhs_rows(i0):
        mv = xt_ref[:, 3:4, pl.ds(i0, BLK)]
        ym = (y_ref[:, :, pl.ds(i0, BLK)] - mean) * mv  # (TB, 1, BLK)
        aj = qj_rows(i0)
        d2s = (
            (aj[0] - xs_ref[:, :, 0:1] * inv_ell[0]) ** 2
            + (aj[1] - xs_ref[:, :, 1:2] * inv_ell[1]) ** 2
            + (aj[2] - xs_ref[:, :, 2:3] * inv_ell[2]) ** 2
        )
        ks = sf2 * _shape_fn(kind, d2s) * mv  # (TB, 1, BLK)
        return jnp.concatenate([ym, ks], axis=1)  # (TB, 2, BLK)

    def fwd_step(ib, _):
        i0 = ib * BLK

        def gather(kb, acc):
            l_ik = a_scr[:, pl.ds(i0, BLK), pl.ds(kb * BLK, BLK)]
            prev = jnp.concatenate(
                [v_scr[:, pl.ds(kb, 1), :], u_scr[:, pl.ds(kb, 1), :]], axis=1
            )  # (TB, 2, BLK)
            sel = jnp.where(kb < ib, one, zero)
            return acc - sel * _bmm(prev, l_ik, tb=True)

        acc = jax.lax.fori_loop(0, nb, gather, rhs_rows(i0))
        w = w_scr[:, pl.ds(i0, BLK), :]
        res = _bmm(acc, w, tb=True)  # (TB, 2, BLK)
        v_scr[:, pl.ds(ib, 1), :] = res[:, 0:1, :]
        u_scr[:, pl.ds(ib, 1), :] = res[:, 1:2, :]
        return 0

    jax.lax.fori_loop(0, nb, fwd_step, 0)

    z = v_scr[:, pl.ds(0, nb), :]
    v = u_scr[:, pl.ds(0, nb), :]
    quad = _red(z * z)
    zv = _red(z * v)
    vv = _red(v * v)
    n_valid = _red(xt_ref[:, 3:4, :])

    fs = mean + zv
    var = jnp.maximum(sf2 - vv, 0.0)
    std = jnp.sqrt(var)
    lz = -(0.5 * quad + logdet + 0.5 * n_valid * _LOG2PI)
    prior_std = jnp.sqrt(sf2)

    ok = okall > 0.5
    nanv = jnp.asarray(jnp.nan, dtype)
    out = jnp.concatenate(
        [
            jnp.where(ok, fs, nanv),
            jnp.where(ok, std, nanv),
            jnp.where(ok, lz, nanv),
            prior_std,
            okall,
            jnp.zeros((tb, 1, 3), dtype),
        ],
        axis=2,
    )
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=("kind", "jitter", "interpret"))
def gp_predict(
    log_hypers: jax.Array,  # (B, 5)
    x: jax.Array,  # (B, N, 3)
    y: jax.Array,  # (B, N) raw observations
    xstar: jax.Array,  # (B, 3)
    mask: jax.Array,  # (B, N)
    mean: jax.Array,  # (B,) per-cell prior mean
    kind: Kernel = Kernel.MATERN32,
    jitter: float = 0.0,
    interpret: bool = False,
):
    """Fused posterior predict; returns (mean, std, lZ, prior_std, ok).

    Parity target: the ``GPR3D`` predict block (``GPR_CS2S3.py:173-184``),
    i.e. :func:`optimalinterpolation_tpu.models.exact_gp.predict` with a
    single test point per cell.
    """
    b, n, _ = x.shape
    if not supported(n):
        raise ValueError(f"pallas GP kernel needs N in [128, 1024] /128, got {n}")
    dtype = x.dtype
    nb = n // BLK
    vrows = max(nb, 8)
    tb = cell_tile(n, False)
    bp = -(-b // tb) * tb

    def padb(arr):
        if bp == b:
            return arr
        pad = jnp.zeros((bp - b,) + arr.shape[1:], arr.dtype)
        return jnp.concatenate([arr, pad], axis=0)

    xp = padb(x)
    maskp = padb(mask.astype(dtype))
    x8 = jnp.concatenate(
        [xp, maskp[:, :, None], jnp.zeros((bp, n, 4), dtype)], axis=2
    )
    xt = jnp.concatenate([jnp.swapaxes(xp, 1, 2), maskp[:, None, :]], axis=1)
    logh8 = padb(jnp.concatenate([log_hypers, jnp.zeros((b, 3), dtype)], axis=1))[
        :, None, :
    ]
    y3 = padb(y)[:, None, :]
    xs8 = padb(
        jnp.concatenate(
            [xstar, mean[:, None].astype(dtype), jnp.zeros((b, 4), dtype)], axis=1
        )
    )[:, None, :]

    kernel = functools.partial(_predict_kernel, n=n, kind=Kernel(kind), jitter=jitter)
    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 4, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 1, 8), dtype),
        scratch_shapes=[
            pltpu.VMEM((tb, n, n), dtype),
            pltpu.VMEM((tb, n, BLK), dtype),
            pltpu.VMEM((tb, vrows, BLK), dtype),
            pltpu.VMEM((tb, vrows, BLK), dtype),
            pltpu.VMEM((tb, BLK, BLK), dtype),
            pltpu.VMEM((tb, BLK, BLK), dtype),
        ],
        interpret=interpret,
    )(logh8, x8, xt, y3, xs8)
    o = out[:b, 0, :]
    return o[:, 0], o[:, 1], o[:, 2], o[:, 3], o[:, 4] > 0.5
