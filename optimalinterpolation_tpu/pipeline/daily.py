"""Two-pass daily pan-Arctic interpolation (reference layer L3).

Rebuilds the production flow of ``/root/reference/2021_paper_production/
GPR_CS2S3.py:201-336`` as batched JAX programs:

  pass 1  optimize + predict every active cell          (:248-297)
  smooth  clip + NaN-aware Gaussian smooth of the five
          hyperparameter fields                          (:299-307)
  pass 2  re-predict every cell with the smoothed,
          externally-supplied hypers (opt=False path)    (:311-334)

Where the reference scatters cell indices over MPI ranks and loops serially,
this pipeline groups cells into fixed-size buckets (data.neighbors), runs each
bucket as ONE vmapped optimize/predict program, and shards the bucket's cells
axis across a device mesh when one is provided (parallel.mesh) — the MPI task
farm (C11) becomes array sharding with zero collectives (cells are
independent; the only cross-cell coupling is the smoothing convolution, a
replicated 320x320 op between the passes).

Output keys replicate the reference result dict exactly
(``:290-307,333-334``): ``{date}_interp, _interp_error, _lZ, _ell_x, _ell_y,
_ell_t, _sf2, _sn2, _ell_{x,y,t}_smth, _sf2_smth, _sn2_smth, _interp_smth,
_interp_error_smth``.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from optimalinterpolation_tpu.data.neighbors import (
    NeighborhoodBatch,
    default_buckets,
    gather_neighborhoods,
)
from optimalinterpolation_tpu.data.reader import ObsDataset
from optimalinterpolation_tpu.data.window import flatten_window
from optimalinterpolation_tpu.models import exact_gp
from optimalinterpolation_tpu.models.exact_gp_batch import predict_batch
from optimalinterpolation_tpu.models.optimizer import (
    TILE_MENU,
    OptimizeConfig,
    _seg_schedule,
    launch_tiles,
    optimize_mll_batch,
    optimize_mll_chunked,
)
from optimalinterpolation_tpu.ops import kernels as K
from optimalinterpolation_tpu.ops.smoothing import smooth_hyper_field

__all__ = ["DailyConfig", "DailyResult", "interpolate_daily"]

HYPER_NAMES = ("ell_x", "ell_y", "ell_t", "sf2", "sn2")

# Stage-level timings at INFO (`logging.getLogger
# ("optimalinterpolation_tpu.pipeline").setLevel(logging.INFO)`); the
# reference's only observability is start/finish wall-clock prints
# (GPR_CS2S3.py:252,335).
logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class DailyConfig:
    """Production knobs (reference hardcodes these as module globals,
    ``GPR_CS2S3.py:201-217``)."""

    window_days: int = 9  # T
    radius_km: float = 300.0
    kind: K.Kernel = K.Kernel.MATERN32
    opt: OptimizeConfig = OptimizeConfig()
    # default resolved at CONSTRUCTION time (incl. the OI_BUCKET_128/256 A/B
    # env knobs), not import time — VERDICT r4 weak #4
    buckets: Sequence[int] = dataclasses.field(default_factory=default_buckets)
    batch_multiple: int = 8
    dtype: str = "float32"
    jitter: float = 0.0
    # L-BFGS iterations per program launch in the segmented pass-1 driver
    # (models.optimizer.optimize_mll_chunked): between segments, converged
    # cells are compacted away host-side. Smaller = finer compaction + shorter
    # programs; larger = fewer host round-trips.
    opt_segment_iters: int = 10
    # Subsampled warm start for buckets larger than this: hyperparameters are
    # first optimized on a strided ``warmstart_n``-point subset of each
    # neighborhood (an O((N/n)^3)-cheaper problem that lands on the fused
    # Pallas path), then refined through a cascade of doubled subset sizes
    # (1024 -> 2048 -> ... -> N), where plateau stopping + compaction drain
    # the already-near-converged cells in a few iterations per stage. The MLL
    # optimum is a smooth function of the training set, so each stage's
    # optimum sits in the next stage's basin of attraction (measured on the
    # production config: full-N median L-BFGS iterations drop ~30 -> ~6).
    # 1024 = the fused-Pallas ceiling: below it the per-iteration cost is low
    # enough that cascade stage overhead exceeds the saved fine iterations
    # (measured both ways at 12% scale); above it the blocked-einsum path is
    # ~8x/64x costlier per iteration and the cascade wins decisively.
    # 0 disables (every cell runs full-N from the reference x0).
    warmstart_n: int = 1024
    # Cascade floor for SEEDED inits (phase B of spatial seeding): a seed
    # init is a nearby cell's full-N optimum, so the cascade's job shrinks
    # from "find the basin" to "adapt to this cell's data" — a handful of
    # gradient steps that are 8x cheaper at n=512 than at the n=1024 fused
    # ceiling. This floors the first stage at 512 for seeded buckets only
    # (incl. the N=1024 bucket, the largest population, which gets no
    # cascade at all under warmstart_n=1024); cold starts keep the 1024
    # floor, where restart probing needs the bigger subsample's landscape.
    warmstart_n_seeded: int = 512
    # Subsample cap for the SEED pass (phase A of spatial seeding): seed
    # hypers exist only to be nearest-filled into phase-B inits, and phase B
    # re-optimizes every cell (seeds included) at full N — so polishing a
    # seed's hypers on its full 2048/4096-point neighborhood is wasted
    # N^3-scale work. Cap seed optimization at a uniform seed_opt_n-point
    # subsample. Also removes the large-N optimizer executables from the
    # seed pass entirely. 0 disables. Default 512 since r5 (VERDICT r4 next
    # #5, tools/r5_ab.py at scale 0.12): 512 deletes the seed pass's
    # n1024:m512 stage outright (seed estimates exist only to be
    # nearest-filled into phase-B inits, which re-optimize at full cap) —
    # seed wall 12.9 -> 3.9 s with rmse +0.13 mm (inside the 0.5 mm guard),
    # end-to-end 27% faster together with stride 4.
    seed_opt_n: int = 512
    # Hard cap on the OPTIMIZATION problem size for every bucket (0 = off):
    # hyperparameters are estimated from a uniform opt_n_max-point subsample
    # of each neighborhood (prediction always uses the full neighborhood).
    # Default 1024 since r4: the warm-rep pipeline A/B (tools/r3_ab.py at
    # scale 0.12, two reps on shared subsamples) measured rmse_vs_truth
    # IDENTICAL to full-N fine passes within 0.02 mm (base 0.01220/0.01211
    # vs trunc1024 0.01219/0.01213) while deleting the N=2048/4096 fine
    # stages — the dominant remaining optimize cost (the n=2048 stage ran
    # 67-76 s for MEDIAN ZERO iterations: pure lockstep straggler waste).
    # 1024 over 512 (0.01218/0.01207, another 1.4x) because halved
    # estimator variance hedges spatially varying real-data hyper fields
    # the synthetic A/B cannot probe. The smoothing pass
    # (GPR_CS2S3.py:299-307) washes per-cell estimator noise out of the
    # product anyway; the seed pass has run on 1024-point subsamples since
    # r2 (seed_opt_n) on the same argument. Guarded end-to-end by
    # bench.py's rmse_vs_truth. OI_OPT_N_MAX overrides for hardware A/Bs
    # (resolved when the config is CONSTRUCTED, not at import).
    opt_n_max: int = dataclasses.field(
        default_factory=lambda: int(os.environ.get("OI_OPT_N_MAX", "1024"))
    )
    # Spatial seeding: optimize only every stride-th grid cell from cold
    # start, nearest-fill their optimized hypers across the grid, then
    # optimize ALL cells initialized from their nearest seed (hyper fields
    # vary smoothly in space — that is why the reference smooths them).
    # Cold-start cost drops to ~1/stride^2 of the cells; the rest converge
    # in a few fine iterations. Skipped automatically when day-to-day
    # chained inits (init_hypers) are provided. 0/1 disables. Default 4
    # since r5 (with seed_opt_n=512; see that knob's A/B note).
    spatial_seed_stride: int = 4
    # Plateau tolerance (nats) for cascade stages: a stage's job is to land
    # in the next stage's basin, not to polish a subsample's optimum that the
    # added data will move anyway — so stages stop an order of magnitude
    # earlier than the fine pass (which uses opt.ftol_abs).
    warmstart_ftol: float = 0.1
    # Per-cell cascade drain: a cell whose log-hypers moved by less than this
    # (inf-norm) during a cascade stage is DROPPED from the remaining (4x
    # costlier per iteration) cascade stages — doubling the subsample halves
    # the estimator variance, so an estimate that stopped moving at n stays
    # put at 2n, and the cell would only pay each later stage's init NLL+grad
    # evaluation for zero iterations (measured at full scale: the n=2048
    # warmstart stage of the N=4096 bucket ran MEDIAN 0 iterations at 26.5 s
    # wall, .bench_r2a_full.log:122). The fine full-N pass still runs for
    # every cell at the production tolerances, so this changes the path, not
    # the target. 0 disables; OI_CASCADE_SKIP_TOL overrides for hardware A/B
    # (resolved when the config is CONSTRUCTED, not at import).
    cascade_skip_tol: float = dataclasses.field(
        default_factory=lambda: float(
            os.environ.get("OI_CASCADE_SKIP_TOL", "0.05")
        )
    )
    # Fine-pass ENTRY DRAIN (VERDICT r4 next #3): when the fine pass starts
    # from warm inits (day-chained, spatial seed, or cascade output), run a
    # leading ZERO-length verify segment — the init NLL+grad evaluation with
    # no L-BFGS iterations — and compact converged-at-init cells away before
    # any lockstep line-search work. Trajectory-neutral (the next segment
    # resumes from the round-tripped state; tests/test_optimizer.py pins
    # parity); False restores the plain leading schedule for A/Bs.
    fine_entry_drain: bool = True
    # HBM working-set budget for ONE chunk of cells. The NLL/gradient keeps
    # ~_MEM_BUFFERS live (N, N) matrices per cell (3.5 on the blocked path —
    # see _MEM_BUFFERS_BLOCKED); without chunking a populous bucket at
    # N = 2048 would request tens of GB in one program and kill the TPU
    # worker. Buckets are split into TILE_MENU launch tiles (launch_tiles)
    # whose shapes compile once per bucket capacity. 8e9 of the chip's
    # 16 GB: with the blocked gradient's 3.5-buffer live set this admits
    # ~192-row chunks at N = 2048 and ~48-row at N = 4096, minimizing
    # launches on a runtime that charges seconds per launch in degraded
    # phases (program-duration caps, not memory, bound the small buckets).
    max_chunk_bytes: float = 8e9
    # Smoothing (reference: std=2 at 25 km else 1, GPR_CS2S3.py:299-302;
    # clip vmaxes :303-307 — ell_t vmax is T, sf2 0.1, sn2 0.05, ell_xy 2*radius)
    smooth_std: Optional[float] = None
    sf2_vmax: float = 0.1
    sn2_vmax: float = 0.05

    @property
    def t_mid(self) -> int:
        return self.window_days // 2

    def smoothing_std(self, grid_res_km: int) -> float:
        if self.smooth_std is not None:
            return self.smooth_std
        return 2.0 if grid_res_km == 25 else 1.0


@dataclasses.dataclass
class DailyResult:
    """All per-date output fields on the (G, G) grid."""

    date: str
    interp: np.ndarray
    interp_error: np.ndarray
    lZ: np.ndarray
    hypers: dict  # name -> (G, G) field, names from HYPER_NAMES
    hypers_smth: dict
    interp_smth: np.ndarray
    interp_error_smth: np.ndarray

    def to_reference_dict(self) -> dict:
        """The reference's pickle schema (GPR_CS2S3.py:290-307,333-334)."""
        d = {
            f"{self.date}_interp": self.interp,
            f"{self.date}_interp_error": self.interp_error,
            f"{self.date}_lZ": self.lZ,
        }
        for name in HYPER_NAMES:
            d[f"{self.date}_{name}"] = self.hypers[name]
        for name in HYPER_NAMES:
            d[f"{self.date}_{name}_smth"] = self.hypers_smth[name]
        d[f"{self.date}_interp_smth"] = self.interp_smth
        d[f"{self.date}_interp_error_smth"] = self.interp_error_smth
        return d


def _scatter(grid: np.ndarray, active_ij, cell_idx: np.ndarray, values: np.ndarray):
    """Write bucket rows (skipping batch padding) back onto the 2-D grid."""
    real = cell_idx >= 0
    gi = active_ij[0][cell_idx[real]]
    gj = active_ij[1][cell_idx[real]]
    grid[gi, gj] = values[real]


def _put(arr, sharding):
    return jax.device_put(arr, sharding) if sharding is not None else arr


def _prior_at_cells(prior_mean, shape, active_ij):
    """Per-active-cell prior means from a scalar or a (G, G) field.

    Returns ``(values, fill)``: one prior mean per active cell, plus the
    scalar used for NaN field cells and padded batch rows (a field's NaN
    cells — never-observed ocean — fall back to its finite mean)."""
    if np.ndim(prior_mean) == 0:
        fill = float(prior_mean)
        return np.full(len(active_ij[0]), fill), fill
    field = np.asarray(prior_mean, np.float64)
    if field.shape != shape:
        raise ValueError(
            f"prior field shape {field.shape} != grid shape {shape}"
        )
    if not np.isfinite(field).any():
        raise ValueError("prior field is all-NaN")
    fill = float(np.nanmean(field))
    vals = field[active_ij]
    return np.where(np.isfinite(vals), vals, fill), fill


def _prior_rows(prior_cells, fill, cell_index, dtype):
    """Per-bucket-row prior means (padded rows get the fill scalar)."""
    rows = np.full((len(cell_index),), fill, dtype)
    real = cell_index >= 0
    rows[real] = prior_cells[cell_index[real]].astype(dtype)
    return rows


# Live (N, N) buffers per cell in HBM, by backend: the fused Pallas kernel
# keeps everything VMEM-resident (inputs only in HBM); the blocked einsum
# path keeps ~3 live (see _MEM_BUFFERS_BLOCKED below); the XLA autodiff
# path ~10 (K, A, L, VJP residuals, workspace).
_MEM_BUFFERS = 10
# Live (N, N) set of the blocked OPTIMIZE path. The factor-reuse line
# search carries each trial's factorization (L is O(N^2)/cell) through the
# while_loop while the next trial's _prep builds a fresh A and L — up to ~3
# simultaneously live (N, N) buffers per cell, plus T during the gradient.
# The pre-carry structure probed at 3.5x on the 16 GB v5e (N=4096 B=48 ran
# with ~15% headroom); 4.5 covers the extra carried buffer conservatively
# until a carry-path re-probe. Production exposure is small: with the
# Nystrom objective routing N >= 2048 (O(N M) memory), blocked optimize
# runs only at N = 512/1024 where even 4.5x is far under budget.
_MEM_BUFFERS_BLOCKED = 4.5
# Predict performs ONE factorization (A, L live; solves recycle panels) and
# carries nothing across iterations.
_MEM_BUFFERS_BLOCKED_PREDICT = 2.5
# Cap pallas chunks by EXPECTED PROGRAM DURATION, not just memory: one
# optimize program runs the whole lockstep L-BFGS for its chunk on-device;
# a ~200 s single program reliably kills the (watchdogged) TPU worker, and
# long chunks also maximize straggler waste. Caps sized for ~<60 s at 50
# L-BFGS iterations from measured per-cell optimize throughput on v5e.
# Caps for buckets routed to the fused Pallas kernel. Under the default
# crossover (optimizer.blocked_min_n() == 512) only 128/256 reach the
# kernel; the 512/1024 entries matter when OI_BLOCKED_MIN_N raises the
# crossover for an end-to-end A/B. VMEM-resident, so chunks are bounded
# by program duration (the ~200 s runtime watchdog), not HBM.
_PALLAS_CHUNK_CAP = {128: 2048, 256: 2048, 512: 1024, 1024: 384}


def _cascade_nys_m() -> int:
    """A/B knob: force cascade warm-start stages onto a rank-M Nystrom
    objective below the production routing threshold (see _optimize_bucket).
    0 = off. Resolved at call time so setting OI_CASCADE_NYS_M after import
    works (VERDICT r4 weak #4)."""
    return int(os.environ.get("OI_CASCADE_NYS_M", "0"))

# Live buffers on the Nystrom objective path, in units of (N, M) arrays per
# cell: Knm, Phi, their VJP residuals, and the 3 per-dimension displacement
# transients of the cross-kernel build (nothing (N, N)-sized exists).
# 5 = measured 4.1 (tools/probe_hbm.py XLA memory analysis, r3; re-probed
# at the new tile in r4) + headroom. The old conservative 10 put the
# n=1024/m=512 chunk at 318 rows -> 128-row launch tiles; <= 5.45 buffers
# reaches the next TILE_MENU size (512 rows), quartering the launch count
# of the dominant opt:n1024:m512 stage — which pays ~0.3-0.5 s of fixed
# per-launch tunnel latency (upload+writeback, r4 OI_OPT_TRACE) and runs
# at MEDIAN ZERO iterations (warm-started), so fixed launch cost, not
# compute, bounds it. Headroom is ~22% — when touching the Nystrom
# objective (ops/nystroem_gp.py), re-run `python tools/probe_hbm.py` on the
# TPU and check its `model_ok` flags: a live-set regression must surface in
# the probe, not as an on-device OOM (ADVICE r4).
_MEM_BUFFERS_NYSTROEM = 5


def _chunk_rows(
    capacity: int, batch_multiple: int, max_chunk_bytes: float, itemsize: int,
    restarts: int = 1, nystroem_m: int = 0, predict_only: bool = False,
) -> int:
    import jax

    from optimalinterpolation_tpu.ops import pallas_gp

    from optimalinterpolation_tpu.models.optimizer import blocked_min_n

    on_tpu = jax.default_backend() == "tpu"
    f32 = itemsize == 4
    if nystroem_m:
        per_cell = (
            _MEM_BUFFERS_NYSTROEM * capacity * nystroem_m
            + 4 * nystroem_m * nystroem_m
        ) * itemsize
        rows = max(1, int(max_chunk_bytes // per_cell))
    elif (on_tpu and f32 and capacity < blocked_min_n()
            and pallas_gp.supported(capacity)):
        # Fused-kernel sizes (mirrors optimizer._resolve_backend).
        cap = _PALLAS_CHUNK_CAP.get(capacity, 384)
        rows = min(cap, int(max_chunk_bytes // (capacity * 64)))
    else:
        # The lean blocked-path models only apply where _resolve_backend
        # actually picks the blocked path (TPU, f32, N % 128 == 0); odd
        # capacities fall back to the ~10-buffer XLA autodiff path.
        blocked = on_tpu and f32 and capacity % 128 == 0
        if blocked:
            bufs = (
                _MEM_BUFFERS_BLOCKED_PREDICT if predict_only
                else _MEM_BUFFERS_BLOCKED
            )
        else:
            bufs = _MEM_BUFFERS
        per_cell = bufs * capacity * capacity * itemsize
        rows = max(1, int(max_chunk_bytes // per_cell))
    rows = rows // max(restarts, 1)  # restarts multiply in-program work
    return max(batch_multiple, (rows // batch_multiple) * batch_multiple)


def _predict_tile(capacity: int, batch_multiple: int, max_chunk_bytes: float,
                  itemsize: int) -> int:
    """ONE fixed launch-tile size for all predict launches at this bucket
    capacity. Predict executes in <0.5 s/launch even padded (a single
    Cholesky per cell), so padding waste is irrelevant next to the ~10-40 s
    per-process load every DISTINCT executable costs on the tunneled TPU
    runtime — one tile shape per capacity means one predict executable."""
    rows = _chunk_rows(capacity, batch_multiple, max_chunk_bytes, itemsize,
                       predict_only=True)
    cap = min(512, rows)
    return max((t for t in TILE_MENU if t <= cap), default=8)


def _chunks_of(b: NeighborhoodBatch, chunk: int, fixed_tile: Optional[int] = None):
    """Split a bucket into launch tiles via :func:`models.optimizer.launch_tiles`.

    Tile sizes come from the coarse TILE_MENU capped at ``chunk``, so every
    program shape belongs to a small fixed set shared across chunks, days,
    and runs — one executable per (bucket capacity, tile size) for a whole
    season, regardless of how cell counts vary. ``fixed_tile`` instead cuts
    the whole bucket into tiles of ONE size (last tile padded) — the predict
    path uses this to keep a single executable per bucket.
    """
    total = len(b)
    if fixed_tile is not None:
        tiles = [(s, fixed_tile) for s in range(0, total, fixed_tile)]
    else:
        tiles = launch_tiles(total, chunk)
    for s, size in tiles:
        e = min(s + size, total)
        pad = size - (e - s)
        sl = lambda a: np.concatenate([a[s:e], np.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a[s:e]  # noqa: E731
        idx = np.concatenate([b.cell_index[s:e], np.full(pad, -1, np.int64)]) if pad else b.cell_index[s:e]
        yield NeighborhoodBatch(
            x=sl(b.x), z=sl(b.z), mask=sl(b.mask), xstar=sl(b.xstar),
            cell_index=idx, n_valid_cells=max(0, min(b.n_valid_cells - s, e - s)),
        )


def _permute_valid_points(b: NeighborhoodBatch, seed: int = 0):
    """Shuffle each row's valid points in place with a fixed-seed RNG.

    The GP is permutation-invariant over its training points, so shuffling
    changes nothing semantically — but it makes every PREFIX of a row a
    uniform random subsample of its neighborhood. The warm-start cascade
    then uses nested prefix subsets (``x[:, :n]``): each stage sees a
    superset of the previous stage's data, so the MLL optimum moves only by
    the new points' information instead of jumping to a different strided
    subset's optimum (measured: stage iterations drop from ~24 to single
    digits, same endpoint quality).
    """
    rng = np.random.default_rng(seed)
    counts = b.mask.sum(axis=1).astype(np.int64)
    for r in range(len(b)):
        k = int(counts[r])
        if k > 1:
            p = rng.permutation(k)
            b.x[r, :k] = b.x[r, p]
            b.z[r, :k] = b.z[r, p]


def _prefix_subset(b: NeighborhoodBatch, n_sub: int):
    """Views of the first ``n_sub`` neighbor slots (valid points sit at the
    front, so after :func:`_permute_valid_points` this is a uniform
    ``n_sub``-point subsample; the mask slice carries rows with fewer)."""
    return b.x[:, :n_sub], b.z[:, :n_sub], b.mask[:, :n_sub]


def _smooth_fields(grids: dict, vmaxes: dict, sie_day, std: float) -> dict:
    """Clip + NaN-aware-smooth the 5 hyper fields (GPR_CS2S3.py:299-307),
    pinned to the host CPU device off-accelerator: the work is ~10 MFLOP and
    accelerator launch overhead dominates it by 3-4 orders of magnitude
    (see ops.smoothing.smoothing_device)."""
    import contextlib

    from optimalinterpolation_tpu.ops.smoothing import smoothing_device

    dev = smoothing_device()
    ctx = jax.default_device(dev) if dev is not None else contextlib.nullcontext()
    with ctx:
        sie_j = jnp.asarray(sie_day)
        return {
            name: np.asarray(
                smooth_hyper_field(
                    jnp.asarray(grids[name]), vmaxes[name], sie_j, std=std
                )
            )
            for name in HYPER_NAMES
        }


def _optimize_bucket(
    full_b: NeighborhoodBatch,
    x0,
    init_at_cells: Optional[np.ndarray],
    prior_rows: np.ndarray,
    cfg: DailyConfig,
    opt_cfg: OptimizeConfig,
    dtype,
    cell_sharding,
    stats: Optional[list],
    seed_init: bool = False,
    hypers_only: bool = False,
):
    """Pass-1 hyperparameter optimization for one bucket: warm-start cascade
    (DailyConfig.warmstart_n) + segmented/compacted fine pass.

    Shared by the single-day (:func:`interpolate_daily`) and multi-day wave
    (:mod:`pipeline.multiday`) pipelines — ``prior_rows`` is a per-row prior
    mean so rows from different days (different priors) can share one bucket.
    Mutates ``full_b`` in place (valid-point shuffling). Returns
    ``(lh_all | None, chunk)``: the (B, 5) optimized log-hypers (None for
    non-lbfgs methods) and the chunk row count for downstream launches.
    """
    from optimalinterpolation_tpu.models.optimizer import routed_nystroem_m

    # Optimization problem size for this bucket: capped to a uniform
    # subsample in the seed pass (DailyConfig.seed_opt_n); prediction
    # always uses the full neighborhood.
    cap = full_b.capacity
    permuted = False
    if hypers_only and cfg.seed_opt_n and cap > cfg.seed_opt_n:
        cap = cfg.seed_opt_n
        _permute_valid_points(full_b)
        permuted = True
    if cfg.opt_n_max and cap > cfg.opt_n_max:
        cap = cfg.opt_n_max
        if not permuted:
            _permute_valid_points(full_b)
            permuted = True
    # Nystrom-objective routing (models.optimizer): the rank-M landmark
    # set is the first M neighbor slots, so rows must be shuffled for it
    # to be a uniform subsample (the cascade path shuffles anyway; chained
    # warm starts skip the cascade and need it done here).
    nys_m = routed_nystroem_m(opt_cfg, cap)
    if nys_m and not permuted:
        _permute_valid_points(full_b)
        permuted = True
    chunk = _chunk_rows(cap, cfg.batch_multiple, cfg.max_chunk_bytes,
                        dtype.itemsize, restarts=cfg.opt.restarts,
                        nystroem_m=nys_m)
    if opt_cfg.method != "lbfgs":
        return None, chunk
    # Segmented + compacted optimization over the whole bucket: converged
    # cells stop costing device time instead of idling in lockstep.
    h0_all = np.tile(np.asarray(x0)[None], (len(full_b), 1))
    chained = False
    if init_at_cells is not None:
        ci = full_b.cell_index
        realr = ci >= 0
        vals = np.full((len(full_b), 5), np.nan)
        vals[realr] = init_at_cells[ci[realr]]
        warm = np.isfinite(vals).all(axis=1)
        h0_all[warm] = np.log(np.maximum(vals[warm], 1e-300)).astype(dtype)
        # Chained inits come from a full-N optimum of an overlapping
        # window — skip the subsample cascade when they cover the bucket
        # (the few cold cells, e.g. newly active ice edge, just take
        # more fine iterations and drain via compaction).
        chained = warm.mean() > 0.5
    fine_cfg = opt_cfg
    if chained:
        # restarts probe alternative basins from x0; pointless (and 2-4x
        # the work) when starting at yesterday's optimum.
        fine_cfg = dataclasses.replace(opt_cfg, restarts=1)
    # Day-chained inits are THIS cell's optimum from an overlapping
    # window: subsample stages would pull the hypers toward the
    # subsample's own optimum, away from an already-excellent start —
    # skip the cascade. Spatial-seed inits (seed_init) are a NEARBY
    # cell's optimum: cheap subsample stages adapt them to this cell's
    # data before the expensive full-N pass (measured at N=4096:
    # median fine iters 23 -> ~5, the bucket is 38% of pass wall).
    ws_n = (
        cfg.warmstart_n_seeded
        if seed_init and cfg.warmstart_n_seeded
        else cfg.warmstart_n
    )
    use_cascade = (
        (not chained or seed_init)
        and ws_n and cap > ws_n
    )
    prior_col = prior_rows.astype(dtype)[:, None]
    if use_cascade:
        # Cascaded subsampled warm start (see DailyConfig.warmstart_n):
        # optimize on a warmstart_n-point subset, then on doubled subset
        # sizes up to N/2 — each stage O(8x) cheaper per iteration than
        # the next and convergent in a few iterations from the previous
        # stage's optimum. Restarts run only in the cheapest first stage;
        # later stages polish the winner.
        if not permuted:
            _permute_valid_points(full_b)
        stage_ftol = max(opt_cfg.ftol_abs, cfg.warmstart_ftol)
        stage_cfg = dataclasses.replace(
            opt_cfg, ftol_abs=stage_ftol,
            restarts=1 if chained else opt_cfg.restarts,
        )
        n_sub = ws_n
        # Per-cell drain (DailyConfig.cascade_skip_tol): cells whose
        # estimate stopped moving exit the cascade early; a stage with no
        # remaining cells is skipped outright (no launch at all).
        active = np.ones(len(full_b), bool)
        while n_sub < cap:
            rows = np.nonzero(active)[0]
            if rows.size == 0:
                logger.info(
                    "bucket N=%d B=%d warmstart n=%d: skipped (all cells "
                    "drained)", full_b.capacity, len(full_b), n_sub,
                )
                n_sub *= 2
                continue
            t_stage = time.time()
            sx, sz, sm = _prefix_subset(full_b, n_sub)
            h0_stage = h0_all[rows]
            pc_stage = prior_col
            if rows.size < len(full_b):
                sx, sz, sm = sx[rows], sz[rows], sm[rows]
                pc_stage = prior_col[rows]
            # A/B knob (OI_CASCADE_NYS_M=256): run cascade stages below the
            # production Nystrom routing threshold on a rank-M Nystrom
            # objective anyway. A cascade stage only produces an INIT for
            # the fine pass (stage ftol is warmstart_ftol = 0.1 nats), so a
            # rank-n/2 approximation is comfortably inside its tolerance;
            # the question is pure wall-clock. Applies to the launch config
            # only — stage_cfg (and the fine_cfg derived from it below)
            # keeps production routing.
            launch_cfg = stage_cfg
            cas_m = _cascade_nys_m()
            if (cas_m and n_sub >= 2 * cas_m
                    and not routed_nystroem_m(stage_cfg, n_sub)):
                launch_cfg = dataclasses.replace(
                    stage_cfg, nystroem_min_n=n_sub,
                    nystroem_m=cas_m,
                )
            stage_nys_m = routed_nystroem_m(launch_cfg, n_sub)
            wchunk = _chunk_rows(
                n_sub, cfg.batch_multiple, cfg.max_chunk_bytes,
                dtype.itemsize, restarts=launch_cfg.restarts,
                nystroem_m=stage_nys_m,
            )
            pre = optimize_mll_chunked(
                h0_stage, sx, sz - pc_stage, sm,
                launch_cfg, chunk_rows=wchunk,
                segment_iters=cfg.opt_segment_iters,
                sharding=cell_sharding,
            )
            new_h = np.asarray(pre.log_hypers)
            if cfg.cascade_skip_tol > 0:
                moved = np.max(np.abs(new_h - h0_stage), axis=1)
                active[rows] = moved >= cfg.cascade_skip_tol
            h0_all[rows] = new_h
            stage_cfg = dataclasses.replace(
                opt_cfg, restarts=1, ftol_abs=stage_ftol
            )
            logger.info(
                "bucket N=%d B=%d warmstart n=%d: %.1fs, %d cells, "
                "median iters %.0f",
                full_b.capacity, len(full_b), n_sub,
                time.time() - t_stage, rows.size,
                np.median(np.asarray(pre.iters)),
            )
            if stats is not None:
                e = {
                    "stage": "cascade", "n": n_sub, "cells": int(rows.size),
                    "wall_s": time.time() - t_stage,
                    "iters_sum": int(np.sum(np.asarray(pre.iters))),
                }
                if stage_nys_m:
                    e["m"] = stage_nys_m
                stats.append(e)
            n_sub *= 2
        fine_cfg = dataclasses.replace(stage_cfg, ftol_abs=opt_cfg.ftol_abs)
    t_opt = time.time()
    if cap < full_b.capacity:
        fx, fz, fm = _prefix_subset(full_b, cap)
    else:
        fx, fz, fm = full_b.x, full_b.z, full_b.mask
    # Fine-pass ENTRY DRAIN (VERDICT r4 next #3): when every cell enters the
    # fine pass warm (day-chained init, spatial seed, or cascade output —
    # the median-zero-iteration regime of the dominant opt:n1024:m512
    # stage), a leading ZERO-length segment runs just the init NLL+grad
    # verification and compacts converged-at-init cells away before any
    # lockstep line-search iteration. Cold starts keep the plain schedule
    # (nothing is converged at x0; a 0-sweep would only add launches).
    warm_entry = (chained or use_cascade) and cfg.fine_entry_drain
    opt_all = optimize_mll_chunked(
        h0_all, fx, fz - prior_col,
        fm, fine_cfg, chunk_rows=chunk,
        segment_iters=cfg.opt_segment_iters, sharding=cell_sharding,
        lead_schedule=((0,) + _seg_schedule()) if warm_entry else None,
    )
    lh_all = np.asarray(opt_all.log_hypers)
    its = np.asarray(opt_all.iters)
    logger.info(
        "bucket N=%d B=%d optimize (n=%d): %.1fs, iters median %.0f max %d",
        full_b.capacity, len(full_b), cap, time.time() - t_opt,
        np.median(its), its.max() if its.size else 0,
    )
    if stats is not None:
        e = {
            "stage": "opt", "n": cap, "cells": len(full_b),
            "wall_s": time.time() - t_opt, "iters_sum": int(np.sum(its)),
        }
        if nys_m:
            e["m"] = nys_m
        stats.append(e)
    return lh_all, chunk


def interpolate_daily(
    ds: ObsDataset,
    day: int,
    prior_mean,
    config: DailyConfig = DailyConfig(),
    cell_sharding=None,
    precomputed_hypers: Optional[dict] = None,
    init_hypers: Optional[dict] = None,
    stats: Optional[list] = None,
    _hypers_only: bool = False,
    _seed_init: bool = False,
) -> DailyResult:
    """Produce one daily interpolated field with uncertainty.

    Args:
      ds: season dataset (reader.read_freeboard_season or synthetic).
      day: start index of the T-day window; the interpolated date is
        ``ds.dates[day + T//2]`` (reference ``:211,216``).
      prior_mean: scalar prior mean (data.prior.constant_fyi_prior), or a
        (G, G) spatially varying prior field (data.prior.background_prior —
        the dev notebook's ``background``/``priorXS``, ``dev/
        sparseGP_example.ipynb`` cell-1). NaN cells of a field (never-
        observed ocean) fall back to the field's finite mean.
      cell_sharding: optional ``jax.sharding.NamedSharding`` whose leading
        axis shards the cells dimension of every bucket across the mesh.
      precomputed_hypers: the QUICKLOOK path (``GPR3D(opt=False)``,
        ``GPR_CS2S3.py:170-172``; ``QuickLook Data/README.txt``): a dict of
        (G, G) hyperparameter fields keyed by HYPER_NAMES (linear space,
        e.g. seasonal averages regridded from 50 km runs via data.regrid).
        Pass-1 optimization AND smoothing are skipped; every cell is
        predicted once with its precomputed hypers — this is how the 232
        shipped quicklook NetCDFs were produced.
      init_hypers: optional per-cell INITIALIZATION fields (same format as
        ``precomputed_hypers``): cells whose init values are finite start
        pass-1 optimization from them instead of the reference x0, and the
        subsample warm-start cascade is skipped (a full-N optimum from an
        overlapping window beats any subsample optimum as a start).
        Consecutive days share T-1 of their T window days, so season runs
        chain each day's optimized hypers into the next
        (pipeline.season.run_season) and re-converge in a few iterations.
        Optimization still runs to the same tolerances — this changes the
        path, not the target, unlike ``precomputed_hypers`` which skips
        optimization entirely.
      stats: optional list; per-stage dict entries are appended
        ({stage, n, cells, wall_s, iters_sum}) so callers (bench.py) can
        report per-bucket economics (wall, FLOPs, effective TFLOP/s).
    """
    cfg = config
    t_mid = cfg.t_mid
    dtype = np.dtype(cfg.dtype)
    date = ds.dates[day + t_mid]
    sie_day = ds.sie[:, :, day + t_mid]

    if (
        cfg.spatial_seed_stride > 1
        and init_hypers is None
        and precomputed_hypers is None
        and cfg.opt.method == "lbfgs"
    ):
        # Phase A: cold-optimize the seed sublattice only (1/stride^2 of the
        # cells; restarts + subsample cascade apply there). Phase B: optimize
        # every cell initialized from its nearest seed's optimum.
        from optimalinterpolation_tpu.data.regrid import nearest_fill

        s = cfg.spatial_seed_stride
        seed_keep = np.zeros(sie_day.shape, bool)
        seed_keep[s // 2 :: s, s // 2 :: s] = True
        n_seeds = int((seed_keep & np.isfinite(sie_day)).sum())
        if n_seeds >= 8:  # enough seeds for the fill to be meaningful
            import copy as _copy

            seed_sie = ds.sie.copy()
            seed_sie[~seed_keep] = np.nan
            ds_seed = _copy.copy(ds)
            ds_seed.sie = seed_sie
            flat_cfg = dataclasses.replace(cfg, spatial_seed_stride=0)
            t_seed = time.time()
            n_stats0 = len(stats) if stats is not None else 0
            seed_res = interpolate_daily(
                ds_seed, day, prior_mean, flat_cfg, cell_sharding=cell_sharding,
                stats=stats, _hypers_only=True,
            )
            if stats is not None:
                for e in stats[n_stats0:]:
                    e["stage"] = "seed:" + e["stage"]
            init = {
                name: nearest_fill(seed_res.hypers[name], ds.x, ds.y)
                for name in HYPER_NAMES
            }
            logger.info(
                "spatial seeding: %d seed cells in %.1fs",
                n_seeds, time.time() - t_seed,
            )
            return interpolate_daily(
                ds, day, prior_mean, flat_cfg, cell_sharding=cell_sharding,
                init_hypers=init, stats=stats, _seed_init=True,
            )
    sat = ds.obs[:, :, :, day : day + cfg.window_days]

    train = flatten_window(sat, ds.x, ds.y)
    active_ij = np.nonzero(np.isfinite(sie_day))
    cells_xy = np.stack([ds.x[active_ij], ds.y[active_ij]], axis=1)
    prior_cells, prior_fill = _prior_at_cells(prior_mean, shape=sie_day.shape,
                                              active_ij=active_ij)

    batches = gather_neighborhoods(
        train,
        cells_xy,
        t_star=float(t_mid),
        radius_m=cfg.radius_km * 1000.0,
        buckets=cfg.buckets,
        batch_multiple=cfg.batch_multiple,
        dtype=dtype,
    )

    shape = sie_day.shape
    grids = {
        name: np.full(shape, np.nan) for name in ("interp", "interp_error", "lZ")
    }
    for name in HYPER_NAMES:
        grids[name] = np.full(shape, np.nan)

    if precomputed_hypers is not None:
        # Quicklook path: single fixed-hyper predict pass, no optimization.
        missing = [k for k in HYPER_NAMES if k not in precomputed_hypers]
        if missing:
            raise ValueError(f"precomputed_hypers missing fields: {missing}")
        hypers_smth = {k: np.asarray(precomputed_hypers[k]) for k in HYPER_NAMES}
        interp_smth = np.full(shape, np.nan)
        interp_error_smth = np.full(shape, np.nan)
        lz_grid = np.full(shape, np.nan)
        smth_at_cells = np.stack(
            [hypers_smth[name][active_ij] for name in HYPER_NAMES], axis=1
        )
        for full_b in batches:
          ft = _predict_tile(full_b.capacity, cfg.batch_multiple,
                             cfg.max_chunk_bytes, dtype.itemsize)
          for b in _chunks_of(full_b, 0, fixed_tile=ft):
            real = b.cell_index >= 0
            lh = np.zeros((len(b), 5), dtype=dtype)
            lh[real] = np.log(np.maximum(smth_at_cells[b.cell_index[real]], 1e-30))
            pred = predict_batch(
                _put(jnp.asarray(lh), cell_sharding),
                _put(jnp.asarray(b.x), cell_sharding),
                _put(jnp.asarray(b.z), cell_sharding),
                _put(jnp.asarray(b.xstar), cell_sharding),
                _put(jnp.asarray(b.mask), cell_sharding),
                jnp.asarray(_prior_rows(prior_cells, prior_fill,
                                        b.cell_index, dtype)),
                kind=cfg.kind,
                jitter=cfg.jitter,
            )
            pred = jax.device_get(pred)  # one batched fetch (tunnel latency)
            _scatter(interp_smth, active_ij, b.cell_index, np.asarray(pred.mean))
            _scatter(interp_error_smth, active_ij, b.cell_index, np.asarray(pred.std))
            _scatter(lz_grid, active_ij, b.cell_index, np.asarray(pred.lZ))
        return DailyResult(
            date=date,
            interp=interp_smth.copy(),
            interp_error=interp_error_smth.copy(),
            lZ=lz_grid,
            hypers=hypers_smth,
            hypers_smth=hypers_smth,
            interp_smth=interp_smth,
            interp_error_smth=interp_error_smth,
        )

    x0 = exact_gp.HYPER_INIT_LOG(ds.grid_res_km * 1000.0, dtype=dtype)
    init_at_cells = None
    if init_hypers is not None:
        missing = [k for k in HYPER_NAMES if k not in init_hypers]
        if missing:
            raise ValueError(f"init_hypers missing fields: {missing}")
        # NEWLY ACTIVE cells (the growing ice edge — ~4-5% of cells/day in
        # winter) have no chained optimum: nearest-fill each init field so
        # they start from the nearest chained cell's optimum instead of the
        # cold x0 (the spatial-seeding insight applied to chaining — hyper
        # fields vary smoothly in space). Without this they run ~30-50
        # full-N iterations WITHOUT cascade help (chained buckets skip the
        # cascade) and dominated the steady-state opt:n512 stage (r5 bench:
        # 80.6k iters). Changes the optimization PATH only, never the
        # tolerances/target. All-NaN fields (resume gaps) still fall back
        # to x0 per cell.
        from optimalinterpolation_tpu.data.regrid import nearest_fill

        filled = {
            name: nearest_fill(
                np.asarray(init_hypers[name], np.float64), ds.x, ds.y,
                valid_mask=np.isfinite(sie_day),
            )
            for name in HYPER_NAMES
        }
        init_at_cells = np.stack(
            [filled[name][active_ij] for name in HYPER_NAMES],
            axis=1,
        )  # (M, 5) linear space; NaN rows fall back to x0

    # ---- pass 1: per-cell MLL optimization + prediction (GPR3D(opt=True)) --
    opt_cfg = dataclasses.replace(cfg.opt, kind=cfg.kind, jitter=cfg.jitter)
    for full_b in batches:
      t_bucket = time.time()
      prior_rows = _prior_rows(prior_cells, prior_fill, full_b.cell_index,
                               dtype)
      lh_all, chunk = _optimize_bucket(
          full_b, x0, init_at_cells, prior_rows, cfg, opt_cfg, dtype,
          cell_sharding, stats, seed_init=_seed_init,
          hypers_only=_hypers_only,
      )
      if _hypers_only and lh_all is not None:
        # Seed pass: only the optimized hyper fields are consumed
        # (nearest-filled into phase-B inits) — skip the predict launches.
        hyp = np.exp(lh_all.astype(np.float64))
        for hi, name in enumerate(HYPER_NAMES):
            _scatter(grids[name], active_ij, full_b.cell_index, hyp[:, hi])
        continue
      # Synchronous launch->fetch per chunk (queued concurrent executions
      # degrade the tunneled TPU runtime 10x+; see optimize_mll_chunked).
      # After lbfgs optimization this loop is predict-only: one fixed tile
      # shape -> one executable per bucket (see _predict_tile).
      ft = (
          _predict_tile(full_b.capacity, cfg.batch_multiple,
                        cfg.max_chunk_bytes, dtype.itemsize)
          if lh_all is not None else None
      )
      t_pred = time.time()
      row0 = 0
      for b in _chunks_of(full_b, chunk, fixed_tile=ft):
        bx = _put(jnp.asarray(b.x), cell_sharding)
        bz = _put(jnp.asarray(b.z), cell_sharding)
        bm = _put(jnp.asarray(b.mask), cell_sharding)
        bxs = _put(jnp.asarray(b.xstar), cell_sharding)
        mean_vec = jnp.asarray(
            _prior_rows(prior_cells, prior_fill, b.cell_index, dtype)
        )

        if lh_all is not None:
            lh = np.zeros((len(b), lh_all.shape[1]), dtype=dtype)
            take = lh_all[row0 : row0 + len(b)]
            lh[: len(take)] = take
            lh_dev = _put(jnp.asarray(lh), cell_sharding)
        else:
            h0 = _put(jnp.tile(x0[None], (len(b), 1)), cell_sharding)
            opt_res = optimize_mll_batch(
                h0, bx, bz - mean_vec[:, None], bm, opt_cfg
            )
            lh_dev = opt_res.log_hypers
        row0 += len(b)
        pred = predict_batch(
            lh_dev, bx, bz, bxs, bm, mean_vec,
            kind=cfg.kind, jitter=cfg.jitter,
        )
        pred = jax.device_get(pred)  # one batched fetch (tunnel latency)
        hyp = np.exp(np.asarray(lh_dev, dtype=np.float64))
        _scatter(grids["interp"], active_ij, b.cell_index, np.asarray(pred.mean))
        _scatter(grids["interp_error"], active_ij, b.cell_index, np.asarray(pred.std))
        _scatter(grids["lZ"], active_ij, b.cell_index, np.asarray(pred.lZ))
        for hi, name in enumerate(HYPER_NAMES):
            _scatter(grids[name], active_ij, b.cell_index, hyp[:, hi])
      if stats is not None:
          stats.append({
              "stage": "predict", "n": full_b.capacity, "cells": len(full_b),
              "wall_s": time.time() - t_pred, "iters_sum": 0,
          })
      logger.info(
          "bucket N=%d B=%d pass-1 total: %.1fs",
          full_b.capacity, len(full_b), time.time() - t_bucket,
      )

    if _hypers_only:
        return DailyResult(
            date=date,
            interp=grids["interp"],
            interp_error=grids["interp_error"],
            lZ=grids["lZ"],
            hypers={n: grids[n] for n in HYPER_NAMES},
            hypers_smth={n: grids[n] for n in HYPER_NAMES},
            interp_smth=np.full(shape, np.nan),
            interp_error_smth=np.full(shape, np.nan),
        )

    # ---- smoothing of hyperparameter fields (smooth(), :299-307) ----------
    std = cfg.smoothing_std(ds.grid_res_km)
    radius_m = cfg.radius_km * 1000.0
    vmaxes = {
        "ell_x": 2.0 * radius_m,
        "ell_y": 2.0 * radius_m,
        "ell_t": float(cfg.window_days),
        "sf2": cfg.sf2_vmax,
        "sn2": cfg.sn2_vmax,
    }
    t_smooth = time.time()
    hypers_smth = _smooth_fields(grids, vmaxes, sie_day, std)
    if stats is not None:
        stats.append({
            "stage": "smooth", "n": int(shape[0]), "cells": 5,
            "wall_s": time.time() - t_smooth, "iters_sum": 0,
        })

    # ---- pass 2: re-predict with smoothed hypers (GPR3D(opt=False)) -------
    t_p2 = time.time()
    interp_smth = np.full(shape, np.nan)
    interp_error_smth = np.full(shape, np.nan)
    smth_at_cells = np.stack(
        [hypers_smth[name][active_ij] for name in HYPER_NAMES], axis=1
    )  # (M, 5) in linear space
    for full_b in batches:
      t_b2 = time.time()
      ft = _predict_tile(full_b.capacity, cfg.batch_multiple,
                         cfg.max_chunk_bytes, dtype.itemsize)
      for b in _chunks_of(full_b, 0, fixed_tile=ft):
        real = b.cell_index >= 0
        lh = np.zeros((len(b), 5), dtype=dtype)
        lh[real] = np.log(np.maximum(smth_at_cells[b.cell_index[real]], 1e-30))
        pred = predict_batch(
            _put(jnp.asarray(lh), cell_sharding),
            _put(jnp.asarray(b.x), cell_sharding),
            _put(jnp.asarray(b.z), cell_sharding),
            _put(jnp.asarray(b.xstar), cell_sharding),
            _put(jnp.asarray(b.mask), cell_sharding),
            jnp.asarray(_prior_rows(prior_cells, prior_fill,
                                    b.cell_index, dtype)),
            kind=cfg.kind,
            jitter=cfg.jitter,
        )
        pred = jax.device_get(pred)  # one batched fetch (tunnel latency)
        _scatter(interp_smth, active_ij, b.cell_index, np.asarray(pred.mean))
        _scatter(interp_error_smth, active_ij, b.cell_index, np.asarray(pred.std))
      if stats is not None:
        stats.append({
            "stage": "pass2", "n": full_b.capacity, "cells": len(full_b),
            "wall_s": time.time() - t_b2, "iters_sum": 0,
        })
    logger.info("pass-2 re-predict: %.1fs", time.time() - t_p2)

    return DailyResult(
        date=date,
        interp=grids["interp"],
        interp_error=grids["interp_error"],
        lZ=grids["lZ"],
        hypers={n: grids[n] for n in HYPER_NAMES},
        hypers_smth=hypers_smth,
        interp_smth=interp_smth,
        interp_error_smth=interp_error_smth,
    )
