"""Round-3 hardware A/Bs in ONE process (one ~6-min backend init).

VERDICT r2 items measured here on the real TPU:
  #2  the n=1024 bucket wall (46% of the full-scale field): exact blocked
      objective vs Nystrom m=512 routing at N >= 1024 (OI_NYSTROEM_MIN_N
      semantics, applied via OptimizeConfig.nystroem_min_n);
  #6  the promised OI_BUCKET_128 A/B (explicit buckets tuple, so no env
      games needed);
  #4  cascade drain on vs off (DailyConfig.cascade_skip_tol).

Each variant runs the production pipeline at the SAME scale on the SAME
subsample and reports wall, rmse-vs-truth, and per-stage economics. Static
HBM probes for candidate bigger launch tiles run first (compile-only, no
device execution).

Usage (on the TPU host):
    python tools/r3_ab.py [scale] [variant ...]
variants: base nys1024 bucket128 nogate  (default: probes + base + nys1024)
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


def run_variant(name: str, cfg, scale: float, seed: int = 11) -> dict:
    import bench
    from optimalinterpolation_tpu.pipeline.daily import interpolate_daily

    ds = _mk(scale, seed)
    n_active = int(np.isfinite(ds.sie[:, :, cfg.t_mid]).sum())
    stats: list = []
    t0 = time.time()
    res = interpolate_daily(ds, day=0, prior_mean=0.15, config=cfg, stats=stats)
    wall = time.time() - t0
    truth = np.load(
        os.path.join(bench.CACHE, f"CS2_FYI_synthetic_{bench.GRID_RES_KM}km.npy")
    )[:, :, cfg.t_mid] + 0.02
    scored = np.isfinite(res.interp_smth)
    rmse = float(np.sqrt(np.mean((res.interp_smth[scored] - truth[scored]) ** 2)))
    out = {
        "variant": name, "scale": scale, "active_cells": n_active,
        "wall_s": round(wall, 1),
        "cells_per_sec": round(n_active / wall, 2),
        "rmse_vs_truth_m": round(rmse, 5),
        "economics": bench._economics(stats, wall),
    }
    print(json.dumps(out), flush=True)
    return out


def static_probes() -> None:
    """Compile-only HBM probes for candidate bigger n=1024 launch tiles."""
    from tools.probe_hbm import probe, probe_predict

    for args in ((1024, 128, 0), (1024, 384, 0), (1024, 512, 0),
                 (1024, 128, 512), (1024, 384, 512)):
        try:
            print(json.dumps(probe(*args)), flush=True)
        except Exception as e:  # OOM at compile time is a result too
            print(json.dumps({"probe_failed": args, "err": str(e)[:200]}),
                  flush=True)
    print(json.dumps(probe_predict(1024, 512)), flush=True)


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
    scale = float(args[0]) if args and args[0][0].isdigit() else 0.25
    variants = [a for a in args if not a[0].isdigit()] or [
        "probes", "base", "nys1024"
    ]

    base_cfg = DailyConfig(
        window_days=9, radius_km=300.0,
        opt=OptimizeConfig(max_iters=50, grad_tol=1e-3, ftol_abs=1e-3),
        dtype="float32", jitter=1e-6,
        # "base" pins the PRE-r4 semantics (full-N fine passes) even now
        # that DailyConfig defaults to opt_n_max=1024 — the r4 A/B that
        # flipped that default ran exactly this menu.
        opt_n_max=0,
    )
    menu = {
        "base": base_cfg,
        "nys1024": dataclasses.replace(
            base_cfg,
            opt=dataclasses.replace(base_cfg.opt, nystroem_min_n=1024),
        ),
        "bucket128": dataclasses.replace(
            base_cfg, buckets=(128, 256, 512, 1024, 2048, 4096),
        ),
        "nogate": dataclasses.replace(base_cfg, cascade_skip_tol=0.0),
        # hyper estimation capped at a 512-point uniform subsample per cell
        # (prediction stays full-N); the cheapest n=1024 contender
        "trunc512": dataclasses.replace(base_cfg, opt_n_max=512),
        # r4 (VERDICT r3 next #4): cap hyper estimation at 1024 points —
        # kills the N=2048/4096 fine stages (the dominant remaining optimize
        # cost) while keeping the Nystrom-routed n=1024 objective
        "trunc1024": dataclasses.replace(base_cfg, opt_n_max=1024),
    }
    print(f"backend={jax.default_backend()}", flush=True)
    # Warm-rep discipline (memory: tunnel storms): list each contender
    # TWICE ("base trunc1024 base trunc1024") and compare the SECOND
    # occurrences. The subsample seed is 11 + occurrence#, so (a) a
    # same-variant repeat is never an identical execution (the axon tunnel
    # memoizes those — a same-seed repeat would time nothing), and (b) the
    # k-th occurrences of ALL variants share one subsample, keeping wall
    # AND rmse directly comparable within a rep.
    seen: dict = {}
    for v in variants:
        if v == "probes":
            static_probes()
        else:
            occ = seen.get(v, 0)
            seen[v] = occ + 1
            run_variant(v, menu[v], scale, seed=11 + occ)


if __name__ == "__main__":
    main()
