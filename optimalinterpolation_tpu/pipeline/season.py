"""Season-scale production: many daily fields + reference-format outputs.

The reference produces one day per ``mpirun`` invocation and pickles a result
dict per day (``/root/reference/2021_paper_production/GPR_CS2S3.py:336``).
Here a season run iterates the daily pipeline over all valid windows, writes
the same per-day pickle schema plus quicklook NetCDFs, and (optionally)
resumes from already-written days — the reference's de-facto day-granular
checkpointing (SURVEY.md section 5) made explicit.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional, Sequence

import numpy as np

from optimalinterpolation_tpu.data.prior import constant_fyi_prior
from optimalinterpolation_tpu.data.reader import ObsDataset
from optimalinterpolation_tpu.io.pickles import save_pickle
from optimalinterpolation_tpu.io.quicklook import write_result_quicklook
from optimalinterpolation_tpu.pipeline.daily import DailyConfig, DailyResult, interpolate_daily

__all__ = ["SeasonConfig", "run_season", "seasonal_average_hypers"]


def seasonal_average_hypers(results: Sequence[DailyResult]) -> dict:
    """Per-cell seasonal-average hyperparameter fields (quicklook scheme).

    The reference's quicklook production reuses seasonal-average hypers from
    50 km runs regridded to 25 km instead of re-optimizing
    (``QuickLook Data/README.txt:1``); this computes those averages from a
    set of daily results (use data.regrid.regrid_field to change resolution).
    """
    import warnings

    from optimalinterpolation_tpu.pipeline.daily import HYPER_NAMES

    out = {}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN slices
        for name in HYPER_NAMES:
            out[name] = np.nanmean(
                np.stack([r.hypers_smth[name] for r in results]), axis=0
            )
    return out


@dataclasses.dataclass(frozen=True)
class SeasonConfig:
    daily: DailyConfig = DailyConfig()
    outdir: str = "."
    write_pickles: bool = True
    write_quicklook: bool = True
    resume: bool = True  # skip days whose outputs already exist
    # Chain each day's optimized per-cell hypers into the next day's pass-1
    # initialization (interpolate_daily init_hypers): consecutive windows
    # share T-1 days, so warm-started cells re-converge in a few iterations
    # instead of ~30 from the reference x0. Off = every day cold-starts
    # (bit-reproducible per day regardless of which days ran before).
    chain_warmstart: bool = True
    # Wave-parallel days (pipeline.multiday): process the season in STRIDED
    # waves of up to this many days, each wave's cells stacked into one
    # combined batch (bigger launches; the cells axis spans the whole device
    # mesh). Wave j = positions [j::n_waves] of the day list, so every day
    # of wave j >= 1 warm-starts from its immediate predecessor (computed in
    # wave j-1); wave 0 cold-starts with spatial seeding. 0/1 = one day at a
    # time (the reference's per-mpirun-job granularity, GPR_CS2S3.py:336).
    day_parallel: int = 1


def run_season(
    ds: ObsDataset,
    config: SeasonConfig,
    days: Optional[Sequence[int] | slice] = None,
    prior_fn: Optional[Callable[[int], float]] = None,
    fyi: Optional[np.ndarray] = None,
    cell_sharding=None,
    precomputed_hypers: Optional[dict] = None,
    log: Callable[[str], None] = print,
) -> list[DailyResult]:
    """Run every T-day window (or the given ``days`` start indices).

    ``days`` may be explicit window start indices, or a slice applied to the
    season's valid-window range (the CLI's ``--days``; the window count
    ``ds.n_days - T + 1`` is owned here, not by callers). ``prior_fn(day) ->
    scalar`` overrides the prior; otherwise the CS2-FYI constant prior is
    computed from ``fyi`` per day (GPR_CS2S3.py:210-212).
    """
    cfg = config
    t = cfg.daily.window_days
    all_windows = range(ds.n_days - t + 1)
    if days is None:
        days = all_windows
    elif isinstance(days, slice):
        days = all_windows[days]
    os.makedirs(cfg.outdir, exist_ok=True)

    lon, lat = None, None
    if cfg.write_quicklook:
        from optimalinterpolation_tpu.io.quicklook import grid_lonlat

        lon, lat = grid_lonlat(ds.x, ds.y)

    if cfg.day_parallel > 1:
        return _run_season_waves(
            ds, cfg, list(days), prior_fn, fyi, cell_sharding, lon, lat, log,
            precomputed_hypers=precomputed_hypers,
        )

    from optimalinterpolation_tpu.pipeline.daily import HYPER_NAMES

    results = []
    chain = None  # previous day's per-cell optimized hyper fields
    for day in days:
        date = ds.dates[day + cfg.daily.t_mid]
        pkl_path = os.path.join(
            cfg.outdir, f"CS2S3_{date}_{ds.grid_res_km}km.pkl"
        )
        if cfg.resume and cfg.write_pickles and os.path.exists(pkl_path):
            log(f"[season] {date}: exists, skipping (resume)")
            if cfg.chain_warmstart:
                # keep the chain alive across resumed days: the written
                # pickle carries the per-cell hyper fields
                try:
                    from optimalinterpolation_tpu.io.pickles import load_pickle

                    prev = load_pickle(pkl_path)
                    chain = {n: prev[f"{date}_{n}"] for n in HYPER_NAMES}
                except Exception:
                    pass
            continue
        if prior_fn is not None:
            prior = prior_fn(day)
        elif fyi is not None:
            prior = constant_fyi_prior(fyi, day)
        else:
            raise ValueError("provide prior_fn or fyi")

        t0 = time.time()
        res = interpolate_daily(
            ds, day, prior, cfg.daily, cell_sharding=cell_sharding,
            precomputed_hypers=precomputed_hypers,
            init_hypers=chain if cfg.chain_warmstart else None,
        )
        if cfg.chain_warmstart and precomputed_hypers is None:
            chain = res.hypers
        n_cells = int(np.isfinite(res.interp).sum())
        log(
            f"[season] {date}: {n_cells} cells in {time.time() - t0:.1f}s "
            f"({n_cells / max(time.time() - t0, 1e-9):.1f} cells/s)"
        )

        if cfg.write_pickles:
            save_pickle(res.to_reference_dict(), pkl_path)
        if cfg.write_quicklook:
            write_result_quicklook(res, lon, lat, ds.grid_res_km, cfg.outdir)
        results.append(res)
    return results


def _prior_for(day: int, prior_fn, fyi) -> float:
    if prior_fn is not None:
        return prior_fn(day)
    if fyi is not None:
        return constant_fyi_prior(fyi, day)
    raise ValueError("provide prior_fn or fyi")


def _run_season_waves(
    ds, cfg: SeasonConfig, days: list, prior_fn, fyi, cell_sharding,
    lon, lat, log, precomputed_hypers: Optional[dict] = None,
) -> list[DailyResult]:
    """Strided-wave season (SeasonConfig.day_parallel): see interpolate_days.

    Day at list position p warm-starts from position p - 1 (one wave
    earlier); resume-skipped days still feed their pickled hypers into the
    chain, like the serial path. With ``precomputed_hypers`` (the quicklook
    reuse path, GPR_CS2S3.py:170-172) there is nothing to chain — each wave
    is a pass-2-only batch over its days' combined cells.
    """
    from optimalinterpolation_tpu.pipeline.daily import HYPER_NAMES
    from optimalinterpolation_tpu.pipeline.multiday import interpolate_days

    chaining = cfg.chain_warmstart and precomputed_hypers is None
    n_waves = max(1, -(-len(days) // cfg.day_parallel))
    results_by_pos: dict[int, DailyResult] = {}
    chain_by_pos: dict[int, dict] = {}
    for j in range(n_waves):
        wave_pos = list(range(j, len(days), n_waves))
        run_pos, inits = [], []
        for p in wave_pos:
            day = days[p]
            date = ds.dates[day + cfg.daily.t_mid]
            pkl_path = os.path.join(
                cfg.outdir, f"CS2S3_{date}_{ds.grid_res_km}km.pkl"
            )
            if cfg.resume and cfg.write_pickles and os.path.exists(pkl_path):
                log(f"[season] {date}: exists, skipping (resume)")
                if chaining:
                    try:
                        from optimalinterpolation_tpu.io.pickles import load_pickle

                        prev = load_pickle(pkl_path)
                        chain_by_pos[p] = {
                            n: prev[f"{date}_{n}"] for n in HYPER_NAMES
                        }
                    except Exception:
                        pass
                continue
            run_pos.append(p)
            inits.append(chain_by_pos.get(p - 1) if chaining else None)
        if not run_pos:
            continue
        t0 = time.time()
        res_list = interpolate_days(
            ds,
            [days[p] for p in run_pos],
            [_prior_for(days[p], prior_fn, fyi) for p in run_pos],
            cfg.daily,
            cell_sharding=cell_sharding,
            init_hypers=inits if any(i is not None for i in inits) else None,
            precomputed_hypers=precomputed_hypers,
        )
        wall = time.time() - t0
        n_cells = sum(int(np.isfinite(r.interp).sum()) for r in res_list)
        log(
            f"[season] wave {j + 1}/{n_waves} ({len(run_pos)} days): "
            f"{n_cells} cells in {wall:.1f}s "
            f"({n_cells / max(wall, 1e-9):.1f} cells/s)"
        )
        for p, res in zip(run_pos, res_list):
            if chaining:
                chain_by_pos[p] = res.hypers
            results_by_pos[p] = res
            if cfg.write_pickles:
                save_pickle(
                    res.to_reference_dict(),
                    os.path.join(
                        cfg.outdir,
                        f"CS2S3_{res.date}_{ds.grid_res_km}km.pkl",
                    ),
                )
            if cfg.write_quicklook:
                write_result_quicklook(
                    res, lon, lat, ds.grid_res_km, cfg.outdir
                )
    return [results_by_pos[p] for p in sorted(results_by_pos)]
