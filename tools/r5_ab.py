"""Round-5 hardware A/Bs in ONE process (one ~6-min backend init).

VERDICT r4 items measured here on the real TPU:
  #3  fine-pass entry drain (DailyConfig.fine_entry_drain): a leading
      0-length verify segment for warm-started fine passes — target is
      opt:n1024:m512 <= 25% of wall (from 45%);
  #4  Nystrom m=256 vs m=512 as the fine-pass rank at n=1024
      (OptimizeConfig.nystroem_m), rmse-guarded;
  #5  seed-pass cut: spatial_seed_stride=4 + seed_opt_n=512 together,
      rmse-guarded — target is seed share < 8% of a cold pass;
  #7  OI_OPT_TRACE per-launch phase profile of the dominant stages
      (pass OI_OPT_TRACE=1; the trace goes to stderr).

Single-day variants run the production pipeline at the SAME scale on the
SAME subsample (warm-rep discipline: list each variant TWICE and compare
the SECOND occurrences; seed 11+occurrence# so the axon tunnel never
memoizes a repeat). ``chain_*`` variants run a day PAIR — day 0 cold, day 1
init-chained from day 0's optimized hypers (season steady state) — and
report both days (day 1 is the steady-state number).

Usage (on the TPU host):
    python tools/r5_ab.py [scale] [variant ...]
variants: base nodrain m256 seed4 m256seed4 chain_base chain_nodrain
          chain_m256   (default: base nodrain m256 seed4, each twice)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oi_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _mk(scale: float, seed: int):
    import bench

    ds = bench._dataset()
    if scale < 1.0:
        sie = ds.sie.copy()
        rng = np.random.default_rng(seed)
        drop = rng.random(sie.shape[:2]) > scale
        sie[drop] = np.nan
        ds.sie = sie
    return ds


def _score(res, t_idx: int) -> float:
    import bench

    truth = np.load(
        os.path.join(bench.CACHE, f"CS2_FYI_synthetic_{bench.GRID_RES_KM}km.npy")
    )[:, :, t_idx] + 0.02
    scored = np.isfinite(res.interp_smth)
    return float(np.sqrt(np.mean((res.interp_smth[scored] - truth[scored]) ** 2)))


def _emit(name, scale, n_active, wall, rmse, stats, extra=None):
    import bench

    out = {
        "variant": name, "scale": scale, "active_cells": n_active,
        "wall_s": round(wall, 1),
        "cells_per_sec": round(n_active / wall, 2),
        "rmse_vs_truth_m": round(rmse, 5),
        **(extra or {}),
        "economics": bench._economics(stats, wall),
    }
    print(json.dumps(out), flush=True)
    return out


def run_single(name: str, cfg, scale: float, seed: int) -> dict:
    from optimalinterpolation_tpu.pipeline.daily import interpolate_daily

    ds = _mk(scale, seed)
    n_active = int(np.isfinite(ds.sie[:, :, cfg.t_mid]).sum())
    stats: list = []
    t0 = time.time()
    res = interpolate_daily(ds, day=0, prior_mean=0.15, config=cfg, stats=stats)
    wall = time.time() - t0
    return _emit(name, scale, n_active, wall, _score(res, cfg.t_mid), stats)


def run_chain(name: str, cfg, scale: float, seed: int) -> None:
    """Day 0 cold + day 1 chained from day 0's optimized hypers — the
    season's wave-j>=1 steady state (pipeline.season chain_warmstart)."""
    from optimalinterpolation_tpu.pipeline.daily import (
        HYPER_NAMES,
        interpolate_daily,
    )

    ds = _mk(scale, seed)
    for day, init in ((0, None), (1, "chain")):
        n_active = int(np.isfinite(ds.sie[:, :, day + cfg.t_mid]).sum())
        stats: list = []
        t0 = time.time()
        res = interpolate_daily(
            ds, day=day, prior_mean=0.15, config=cfg, stats=stats,
            init_hypers=(
                {n: prev.hypers[n] for n in HYPER_NAMES} if init else None
            ),
        )
        wall = time.time() - t0
        _emit(
            f"{name}:day{day}" + (":chained" if init else ":cold"),
            scale, n_active, wall, _score(res, day + cfg.t_mid), stats,
        )
        prev = res


def main() -> None:
    import logging

    logging.basicConfig(
        stream=sys.stderr, level=logging.INFO,
        format="[%(asctime)s] %(message)s", datefmt="%H:%M:%S",
    )
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    from optimalinterpolation_tpu.models.optimizer import OptimizeConfig
    from optimalinterpolation_tpu.pipeline.daily import DailyConfig

    args = sys.argv[1:]
    scale = float(args[0]) if args and args[0][0].isdigit() else 0.12
    variants = [a for a in args if not a[0].isdigit()]
    if not variants:
        variants = ["base", "nodrain", "m256", "seed4"] * 2

    base_cfg = DailyConfig(
        window_days=9, radius_km=300.0,
        opt=OptimizeConfig(max_iters=50, grad_tol=1e-3, ftol_abs=1e-3),
        dtype="float32", jitter=1e-6,
    )
    m256 = dataclasses.replace(
        base_cfg, opt=dataclasses.replace(base_cfg.opt, nystroem_m=256)
    )
    seed4 = dataclasses.replace(
        base_cfg, spatial_seed_stride=4, seed_opt_n=512
    )
    menu = {
        "base": base_cfg,
        "nodrain": dataclasses.replace(base_cfg, fine_entry_drain=False),
        "m256": m256,
        "seed4": seed4,
        "m256seed4": dataclasses.replace(
            seed4, opt=dataclasses.replace(seed4.opt, nystroem_m=256)
        ),
    }
    print(f"backend={jax.default_backend()}", flush=True)
    seen: dict = {}
    for v in variants:
        if v == "trace":
            # everything after this point runs with per-launch phase
            # timing on stderr (models.optimizer OI_OPT_TRACE, resolved at
            # call time) — the VERDICT r4 #7 profile hook
            os.environ["OI_OPT_TRACE"] = "1"
            continue
        key = v[len("chain_"):] if v.startswith("chain_") else v
        occ = seen.get(v, 0)
        seen[v] = occ + 1
        if v.startswith("chain_"):
            run_chain(v, menu[key], scale, seed=11 + occ)
        else:
            run_single(v, menu[key], scale, seed=11 + occ)


if __name__ == "__main__":
    main()
