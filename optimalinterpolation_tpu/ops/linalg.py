"""Masked/padded dense linear algebra for batched local GPs.

The reference factorizes one ragged (n, n) system per grid cell with LAPACK
(``np.linalg.cholesky`` + two triangular solves, ``GPR_CS2S3.py:126-130``,
``:177-180``). On TPU the ragged problems are padded to a common size N and
batched; this module provides the identity-padding construction that keeps the
factorization of the padded matrix *exactly* equal to the factorization of the
valid block:

  A = (m m^T) .* K  +  sn2 * diag(m)  +  diag(1 - m)

For a permutation that sorts valid points first, A is block-diagonal
[[K_valid + sn2 I, 0], [0, I]], so
  * chol(A) restricted to valid rows == chol(K_valid + sn2 I),
  * log det A == log det (K_valid + sn2 I)  (padding contributes log 1 = 0),
  * solves against masked right-hand sides never mix in padded entries.
No permutation is actually performed — the algebra holds for any ordering
because the padded rows/cols are exactly e_i.

Failure policy: the reference catches ``LinAlgError`` and emits NaNs for the
cell (``GPR_CS2S3.py:139-140,187-191``). XLA's Cholesky returns NaNs instead
of raising; ``masked_cholesky`` exposes an ``ok`` flag (finite factor) that
downstream code uses to produce the same NaN-cell semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "masked_psd_matrix",
    "masked_cholesky",
    "chol_solve",
    "tri_solve",
    "CholResult",
]


def masked_psd_matrix(
    k: jax.Array,
    sn2: jax.Array,
    mask: jax.Array,
    jitter: float = 0.0,
) -> jax.Array:
    """Assemble A = mask-projected K + sn2*diag(mask) + diag(1-mask).

    ``k`` must already have masked rows/cols zeroed (see
    ``ops.kernels.kernel_matrix(mask=...)``); this adds the diagonal terms.
    ``jitter`` is an extra diagonal stabilizer applied to valid rows only —
    keep 0 to match the reference bit-for-bit in float64 oracle tests, use
    ~1e-6*sf2 in float32 production.
    """
    m = mask.astype(k.dtype)
    diag = (sn2 + jitter) * m + (1.0 - m)
    return k + jnp.diag(diag)


class CholResult(NamedTuple):
    chol: jax.Array  # (n, n) lower-triangular factor (garbage if not ok)
    ok: jax.Array  # scalar bool: factorization succeeded (finite)


def masked_cholesky(a: jax.Array) -> CholResult:
    """Lower Cholesky of a padded PSD matrix, with a success flag.

    On non-PSD input XLA produces NaNs; ``ok`` is False in that case, which is
    the batched analogue of the reference's LinAlgError -> NaN-cell path.
    """
    l = jnp.linalg.cholesky(a)
    ok = jnp.all(jnp.isfinite(jnp.diagonal(l, axis1=-2, axis2=-1)))
    return CholResult(l, ok)


def tri_solve(l: jax.Array, b: jax.Array, *, trans: bool = False) -> jax.Array:
    """Solve L x = b (or L^T x = b) with L lower-triangular."""
    return jax.scipy.linalg.solve_triangular(l, b, lower=True, trans=1 if trans else 0)


def chol_solve(l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) x = b, the reference's double ``np.linalg.solve``
    (``GPR_CS2S3.py:127``)."""
    return tri_solve(l, tri_solve(l, b), trans=True)
