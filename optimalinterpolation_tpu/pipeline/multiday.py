"""Wave-parallel multi-day interpolation: many days as ONE stacked problem.

The reference parallelizes days by farming one day per ``mpirun`` invocation
(``/root/reference/2021_paper_production/GPR_CS2S3.py:336`` — the scheduler
is the HPC queue). The TPU-native equivalent exploits that a *day is just
more cells*: every grid cell of every day in a wave is an independent GP
problem over its own 9-day window, so the wave's cells concatenate into the
same fixed-capacity buckets the single-day pipeline uses, optimize/predict
launch over the combined cells axis (sharded across the WHOLE device mesh —
with a (days, cells) mesh, ``PartitionSpec(("days", "cells"))`` shards the
combined axis over both mesh dimensions), and results scatter back into
per-day grids for the per-day smoothing + pass-2 re-predict.

Benefits over day-at-a-time: bigger batches per launch (launch count and
per-launch overhead amortize across the wave; small buckets of W days merge
into one padded program instead of W), and the cells axis scales across
however many chips exist without any day-level scheduling. Day-to-day
warm-start chaining composes with waves via STRIDED wave membership
(pipeline.season.run_season: wave j = days[j::n_waves], so every day of wave
j >= 1 initializes from its immediate predecessor, computed in wave j - 1).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from optimalinterpolation_tpu.data.neighbors import NeighborhoodBatch, gather_neighborhoods
from optimalinterpolation_tpu.data.reader import ObsDataset
from optimalinterpolation_tpu.data.window import flatten_window
from optimalinterpolation_tpu.models import exact_gp
from optimalinterpolation_tpu.models.exact_gp_batch import predict_batch
from optimalinterpolation_tpu.pipeline.daily import (
    HYPER_NAMES,
    DailyConfig,
    DailyResult,
    _chunks_of,
    _optimize_bucket,
    _predict_tile,
    _prior_at_cells,
    _prior_rows,
    _put,
    logger,
)
__all__ = ["interpolate_days"]


@dataclasses.dataclass
class _DayCtx:
    date: str
    sie_day: np.ndarray
    active_ij: tuple
    batches: list
    grids: dict  # field name -> (G, G) np array


def _day_ctx(ds: ObsDataset, day: int, cfg: DailyConfig, dtype,
             sie_override: Optional[np.ndarray] = None) -> _DayCtx:
    t_mid = cfg.t_mid
    sie_day = (sie_override if sie_override is not None else ds.sie)[
        :, :, day + t_mid
    ]
    sat = ds.obs[:, :, :, day : day + cfg.window_days]
    train = flatten_window(sat, ds.x, ds.y)
    active_ij = np.nonzero(np.isfinite(sie_day))
    cells_xy = np.stack([ds.x[active_ij], ds.y[active_ij]], axis=1)
    batches = gather_neighborhoods(
        train, cells_xy, t_star=float(t_mid),
        radius_m=cfg.radius_km * 1000.0, buckets=cfg.buckets,
        batch_multiple=cfg.batch_multiple, dtype=dtype,
    )
    shape = sie_day.shape
    grids = {
        name: np.full(shape, np.nan)
        for name in ("interp", "interp_error", "lZ", *HYPER_NAMES,
                     "interp_smth", "interp_error_smth")
    }
    return _DayCtx(ds.dates[day + t_mid], sie_day, active_ij, batches, grids)


def _prior_global(ctxs, priors) -> tuple[np.ndarray, float]:
    """Wave-global per-active-cell prior vector (aligned with the offsets
    used by :func:`_concat_buckets`) from per-day scalars and/or (G, G)
    fields, plus the fill scalar used for padded bucket rows."""
    vals, fills = [], []
    for c, p in zip(ctxs, priors):
        v, f = _prior_at_cells(p, c.sie_day.shape, c.active_ij)
        vals.append(v)
        fills.append(f)
    return np.concatenate(vals), float(np.mean(fills))


def _concat_buckets(
    items: Sequence[tuple[int, NeighborhoodBatch]],
    offsets: np.ndarray,
    batch_multiple: int,
):
    """Stack same-capacity buckets from several days into one bucket.

    Per-day batch padding rows are dropped and the combined bucket re-padded,
    so real rows sit first (NeighborhoodBatch convention). Returns
    ``(batch, day_of_row)`` with cell_index remapped into the wave-global
    active-cell list via ``offsets``.
    """
    xs, zs, ms, xss, idxs, dayr = [], [], [], [], [], []
    for dpos, b in items:
        real = b.cell_index >= 0
        xs.append(b.x[real])
        zs.append(b.z[real])
        ms.append(b.mask[real])
        xss.append(b.xstar[real])
        idxs.append(b.cell_index[real] + offsets[dpos])
        dayr.append(np.full(int(real.sum()), dpos, np.int64))
    x = np.concatenate(xs)
    n_real = x.shape[0]
    pad = (-n_real) % batch_multiple
    z, m, xst = np.concatenate(zs), np.concatenate(ms), np.concatenate(xss)
    idx = np.concatenate(idxs)
    day_of_row = np.concatenate(dayr)
    if pad:
        zeros = lambda a: np.zeros((pad,) + a.shape[1:], a.dtype)  # noqa: E731
        x, z, m, xst = (np.concatenate([a, zeros(a)]) for a in (x, z, m, xst))
        idx = np.concatenate([idx, np.full(pad, -1, np.int64)])
        day_of_row = np.concatenate([day_of_row, np.zeros(pad, np.int64)])
    batch = NeighborhoodBatch(
        x=x, z=z, mask=m, xstar=xst, cell_index=idx, n_valid_cells=n_real,
    )
    return batch, day_of_row


def _scatter_global(field: str, ctxs, offsets, cell_idx, values) -> None:
    real = cell_idx >= 0
    gidx = cell_idx[real]
    vals = np.asarray(values)[real]
    day = np.searchsorted(offsets, gidx, side="right") - 1
    local = gidx - offsets[day]
    for dpos in np.unique(day):
        sel = day == dpos
        c = ctxs[dpos]
        gi = c.active_ij[0][local[sel]]
        gj = c.active_ij[1][local[sel]]
        c.grids[field][gi, gj] = vals[sel]


def _pass1(
    ctxs: list, priors: Sequence, grid_res_m: float, cfg: DailyConfig,
    opt_cfg, dtype, cell_sharding, stats, init_fields: Optional[list],
    seed_init: bool, hypers_only: bool,
) -> None:
    """Combined pass-1 over all days' buckets; scatters into ctx grids."""
    from collections import defaultdict

    offsets = np.concatenate(
        [[0], np.cumsum([c.active_ij[0].size for c in ctxs])]
    ).astype(np.int64)
    prior_cells, prior_fill = _prior_global(ctxs, priors)
    x0 = exact_gp.HYPER_INIT_LOG(grid_res_m, dtype=dtype)
    init_global = None
    if init_fields is not None and any(f is not None for f in init_fields):
        # (sum M_d, 5) linear space; NaN rows (incl. whole days with no
        # chain, e.g. the first day after a resume gap) fall back to x0.
        blocks = []
        for d in range(len(ctxs)):
            md = ctxs[d].active_ij[0].size
            if init_fields[d] is None:
                blocks.append(np.full((md, 5), np.nan))
            else:
                blocks.append(np.stack(
                    [np.asarray(init_fields[d][n])[ctxs[d].active_ij]
                     for n in HYPER_NAMES], axis=1,
                ))
        init_global = np.concatenate(blocks)
    per_cap = defaultdict(list)
    for dpos, c in enumerate(ctxs):
        for b in c.batches:
            per_cap[b.capacity].append((dpos, b))
    for capacity in sorted(per_cap):
        t_bucket = time.time()
        full_b, _ = _concat_buckets(
            per_cap[capacity], offsets, cfg.batch_multiple
        )
        prior_rows = _prior_rows(prior_cells, prior_fill, full_b.cell_index,
                                 dtype)
        lh_all, chunk = _optimize_bucket(
            full_b, x0, init_global, prior_rows, cfg, opt_cfg, dtype,
            cell_sharding, stats, seed_init=seed_init,
            hypers_only=hypers_only,
        )
        if lh_all is None:
            raise ValueError("interpolate_days supports method='lbfgs' only")
        hyp = np.exp(lh_all.astype(np.float64))
        for hi, name in enumerate(HYPER_NAMES):
            _scatter_global(name, ctxs, offsets, full_b.cell_index, hyp[:, hi])
        if hypers_only:
            continue
        ft = _predict_tile(full_b.capacity, cfg.batch_multiple,
                           cfg.max_chunk_bytes, dtype.itemsize)
        t_pred = time.time()
        row0 = 0
        for b in _chunks_of(full_b, chunk, fixed_tile=ft):
            lh = np.zeros((len(b), lh_all.shape[1]), dtype=dtype)
            take = lh_all[row0 : row0 + len(b)]
            lh[: len(take)] = take
            mv = _prior_rows(prior_cells, prior_fill, b.cell_index, dtype)
            row0 += len(b)
            pred = predict_batch(
                _put(jnp.asarray(lh), cell_sharding),
                _put(jnp.asarray(b.x), cell_sharding),
                _put(jnp.asarray(b.z), cell_sharding),
                _put(jnp.asarray(b.xstar), cell_sharding),
                _put(jnp.asarray(b.mask), cell_sharding),
                jnp.asarray(mv),
                kind=cfg.kind, jitter=cfg.jitter,
            )
            pred = jax.device_get(pred)  # one batched fetch (tunnel latency)
            _scatter_global("interp", ctxs, offsets, b.cell_index, pred.mean)
            _scatter_global(
                "interp_error", ctxs, offsets, b.cell_index, pred.std
            )
            _scatter_global("lZ", ctxs, offsets, b.cell_index, pred.lZ)
        if stats is not None:
            stats.append({
                "stage": "predict", "n": full_b.capacity,
                "cells": len(full_b), "wall_s": time.time() - t_pred,
                "iters_sum": 0,
            })
        logger.info(
            "wave bucket N=%d B=%d (days=%d) pass-1 total: %.1fs",
            full_b.capacity, len(full_b), len(ctxs), time.time() - t_bucket,
        )


def interpolate_days(
    ds: ObsDataset,
    days: Sequence[int],
    priors: Sequence,
    config: DailyConfig = DailyConfig(),
    cell_sharding=None,
    init_hypers: Optional[Sequence[Optional[dict]]] = None,
    precomputed_hypers: Optional[dict] = None,
    stats: Optional[list] = None,
) -> list[DailyResult]:
    """One WAVE: interpolate several days as a single stacked cell batch.

    Per-day results are identical to :func:`pipeline.daily.interpolate_daily`
    (cell trajectories are independent of batch composition — pinned by
    tests/test_multiday.py); only launch structure and device utilization
    change. ``init_hypers`` optionally provides per-day warm-start fields
    (same format as interpolate_daily's). ``precomputed_hypers`` is the
    QUICKLOOK path (``GPR3D(opt=False)``, ``GPR_CS2S3.py:170-172``): one
    dict of (G, G) hyperparameter fields applied to EVERY day of the wave —
    pass-1 optimization and smoothing are skipped and the wave collapses to
    the combined fixed-hyper predict pass.

    Args:
      days: window START indices (the interpolated date of entry i is
        ``ds.dates[days[i] + T//2]``).
      priors: per-day prior means, aligned with ``days`` — scalars and/or
        (G, G) spatially varying fields (see interpolate_daily's
        ``prior_mean``; fields follow the dev notebook's background prior,
        ``dev/sparseGP_example.ipynb`` cell-1).
    """
    cfg = config
    dtype = np.dtype(cfg.dtype)
    grid_res_m = ds.grid_res_km * 1000.0
    priors = list(priors)
    if len(priors) != len(days):
        raise ValueError("priors must align with days")
    opt_cfg = dataclasses.replace(cfg.opt, kind=cfg.kind, jitter=cfg.jitter)

    ctxs = [_day_ctx(ds, d, cfg, dtype) for d in days]

    if precomputed_hypers is not None:
        missing = [k for k in HYPER_NAMES if k not in precomputed_hypers]
        if missing:
            raise ValueError(f"precomputed_hypers missing fields: {missing}")
        smth = [
            {k: np.asarray(precomputed_hypers[k]) for k in HYPER_NAMES}
        ] * len(ctxs)
        return _pass2_assemble(
            cfg, ctxs, smth, priors, dtype, cell_sharding, stats,
            quicklook=True,
        )

    init_fields = list(init_hypers) if init_hypers is not None else None
    if init_fields is not None:
        # Nearest-fill each day's chain-init fields so newly active
        # (ice-edge) cells start from the nearest chained optimum instead
        # of the cold x0 — see interpolate_daily's init_hypers handling.
        from optimalinterpolation_tpu.data.regrid import nearest_fill

        init_fields = [
            None if f is None else {
                n: nearest_fill(
                    np.asarray(f[n], np.float64), ds.x, ds.y,
                    valid_mask=np.isfinite(ds.sie[:, :, d + cfg.t_mid]),
                )
                for n in HYPER_NAMES
            }
            for d, f in zip(days, init_fields)
        ]
    seed_init = False
    if (
        cfg.spatial_seed_stride > 1
        and init_fields is None
        and cfg.opt.method == "lbfgs"
    ):
        # Phase A (combined across the wave): cold-optimize each day's seed
        # sublattice, hypers only; nearest-fill each day's seed optima into
        # phase-B inits (see interpolate_daily's spatial seeding).
        from optimalinterpolation_tpu.data.regrid import nearest_fill

        s = cfg.spatial_seed_stride
        keep = np.zeros(ds.sie.shape[:2], bool)
        keep[s // 2 :: s, s // 2 :: s] = True
        n_seeds = min(
            int((keep & np.isfinite(c.sie_day)).sum()) for c in ctxs
        )
        if n_seeds >= 8:
            sie_seed = ds.sie.copy()
            sie_seed[~keep] = np.nan
            flat_cfg = dataclasses.replace(cfg, spatial_seed_stride=0)
            t_seed = time.time()
            seed_ctxs = [
                _day_ctx(ds, d, flat_cfg, dtype, sie_override=sie_seed)
                for d in days
            ]
            n_stats0 = len(stats) if stats is not None else 0
            _pass1(
                seed_ctxs, priors, grid_res_m, flat_cfg, opt_cfg, dtype,
                cell_sharding, stats, None, seed_init=False, hypers_only=True,
            )
            if stats is not None:
                for e in stats[n_stats0:]:
                    e["stage"] = "seed:" + e["stage"]
            init_fields = [
                {n: nearest_fill(sc.grids[n], ds.x, ds.y) for n in HYPER_NAMES}
                for sc in seed_ctxs
            ]
            seed_init = True
            cfg = flat_cfg
            logger.info(
                "wave spatial seeding: %d days in %.1fs",
                len(days), time.time() - t_seed,
            )

    _pass1(
        ctxs, priors, grid_res_m, cfg, opt_cfg, dtype, cell_sharding, stats,
        init_fields, seed_init=seed_init, hypers_only=False,
    )

    # ---- per-day smoothing (tiny 2-D convolutions, replicated) ------------
    t_smooth = time.time()
    std = cfg.smoothing_std(ds.grid_res_km)
    radius_m = cfg.radius_km * 1000.0
    vmaxes = {
        "ell_x": 2.0 * radius_m, "ell_y": 2.0 * radius_m,
        "ell_t": float(cfg.window_days),
        "sf2": cfg.sf2_vmax, "sn2": cfg.sn2_vmax,
    }
    from optimalinterpolation_tpu.pipeline.daily import _smooth_fields

    smth = [_smooth_fields(c.grids, vmaxes, c.sie_day, std) for c in ctxs]
    if stats is not None:
        stats.append({
            "stage": "smooth", "n": int(ds.sie.shape[0]),
            "cells": 5 * len(ctxs), "wall_s": time.time() - t_smooth,
            "iters_sum": 0,
        })

    return _pass2_assemble(
        cfg, ctxs, smth, priors, dtype, cell_sharding, stats,
        quicklook=False,
    )


def _pass2_assemble(
    cfg: DailyConfig, ctxs, smth, priors, dtype, cell_sharding, stats,
    quicklook: bool,
) -> list[DailyResult]:
    """Combined fixed-hyper predict over all days' buckets + result assembly.

    ``quicklook=True`` is the precomputed-hypers path: no pass-1 grids exist,
    so the predicted fields double as the unsmoothed outputs and per-cell lZ
    is scattered too (mirrors interpolate_daily's quicklook branch).
    """
    from collections import defaultdict

    offsets = np.concatenate(
        [[0], np.cumsum([c.active_ij[0].size for c in ctxs])]
    ).astype(np.int64)
    prior_cells, prior_fill = _prior_global(ctxs, priors)
    smth_at_cells = np.concatenate([
        np.stack([smth[d][n][ctxs[d].active_ij] for n in HYPER_NAMES], axis=1)
        for d in range(len(ctxs))
    ])
    per_cap = defaultdict(list)
    for dpos, c in enumerate(ctxs):
        for b in c.batches:
            per_cap[b.capacity].append((dpos, b))
    for capacity in sorted(per_cap):
        t_b2 = time.time()
        full_b, _ = _concat_buckets(
            per_cap[capacity], offsets, cfg.batch_multiple
        )
        ft = _predict_tile(capacity, cfg.batch_multiple, cfg.max_chunk_bytes,
                           dtype.itemsize)
        for b in _chunks_of(full_b, 0, fixed_tile=ft):
            real = b.cell_index >= 0
            lh = np.zeros((len(b), 5), dtype=dtype)
            lh[real] = np.log(
                np.maximum(smth_at_cells[b.cell_index[real]], 1e-30)
            )
            mv = _prior_rows(prior_cells, prior_fill, b.cell_index, dtype)
            pred = predict_batch(
                _put(jnp.asarray(lh), cell_sharding),
                _put(jnp.asarray(b.x), cell_sharding),
                _put(jnp.asarray(b.z), cell_sharding),
                _put(jnp.asarray(b.xstar), cell_sharding),
                _put(jnp.asarray(b.mask), cell_sharding),
                jnp.asarray(mv),
                kind=cfg.kind, jitter=cfg.jitter,
            )
            pred = jax.device_get(pred)  # one batched fetch (tunnel latency)
            _scatter_global(
                "interp_smth", ctxs, offsets, b.cell_index, pred.mean
            )
            _scatter_global(
                "interp_error_smth", ctxs, offsets, b.cell_index, pred.std
            )
            if quicklook:
                _scatter_global("lZ", ctxs, offsets, b.cell_index, pred.lZ)
        if stats is not None:
            stats.append({
                "stage": "pass2", "n": capacity, "cells": len(full_b),
                "wall_s": time.time() - t_b2, "iters_sum": 0,
            })

    return [
        DailyResult(
            date=c.date,
            interp=(
                c.grids["interp_smth"].copy() if quicklook
                else c.grids["interp"]
            ),
            interp_error=(
                c.grids["interp_error_smth"].copy() if quicklook
                else c.grids["interp_error"]
            ),
            lZ=c.grids["lZ"],
            hypers=(
                smth[d] if quicklook else {n: c.grids[n] for n in HYPER_NAMES}
            ),
            hypers_smth=smth[d],
            interp_smth=c.grids["interp_smth"],
            interp_error_smth=c.grids["interp_error_smth"],
        )
        for d, c in enumerate(ctxs)
    ]
