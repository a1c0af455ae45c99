"""Focused A/B on the n=1024 bucket optimizer (46% of the full-scale field).

Builds the REAL N=1024 bucket from the bench dataset at the given scale,
warm-starts all cells identically (n=512 cascade stage, shared h0), then
times the FINE pass under each contender on the same rows:

  exact        blocked einsum objective, current chunk model (~424 rows ->
               128-row launch tiles)
  exact-big    same objective, chunk forced to 512 rows (the HBM probe shows
               peak 8.8 GiB at (1024, 512): tools/probe_hbm, r3) -> 512-row
               tiles, 4x fewer launches
  nys512       Nystrom m=512 objective (OI_NYSTROEM_MIN_N=1024 semantics)
  nys256       Nystrom m=256 objective (cheaper per eval: 6nm^2 ~ 4x less)

Quality is compared via the EXACT masked NLL evaluated once at each result
(the Nystrom objective's own value is not comparable) plus the hyper deltas
vs the exact winner. Each contender runs twice (cold: program load; warm:
the number that matters). Usage: python tools/r3_n1024.py [scale] [reps]
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


def main() -> None:
    import logging

    logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                        format="[%(asctime)s] %(message)s", datefmt="%H:%M:%S")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    import bench
    from optimalinterpolation_tpu.data.neighbors import gather_neighborhoods
    from optimalinterpolation_tpu.data.window import flatten_window
    from optimalinterpolation_tpu.models.optimizer import (
        OptimizeConfig, optimize_mll_chunked,
    )
    from optimalinterpolation_tpu.pipeline.daily import (
        DailyConfig, _chunk_rows, _permute_valid_points, _prefix_subset,
    )

    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    ds = bench._dataset()
    if scale < 1.0:
        sie = ds.sie.copy()
        rng = np.random.default_rng(11)
        sie[rng.random(sie.shape[:2]) > scale] = np.nan
        ds.sie = sie
    cfg = DailyConfig(window_days=9, radius_km=300.0, dtype="float32",
                      jitter=1e-6)
    dtype = np.dtype("float32")
    t_mid = cfg.t_mid
    sie_day = ds.sie[:, :, t_mid]
    sat = ds.obs[:, :, :, 0:9]
    train = flatten_window(sat, ds.x, ds.y)
    active_ij = np.nonzero(np.isfinite(sie_day))
    cells_xy = np.stack([ds.x[active_ij], ds.y[active_ij]], axis=1)
    batches = gather_neighborhoods(
        train, cells_xy, t_star=float(t_mid), radius_m=300e3,
        buckets=cfg.buckets, batch_multiple=8, dtype=dtype,
    )
    b1024 = next(b for b in batches if b.capacity == 1024)
    print(f"N=1024 bucket: B={len(b1024)} rows", flush=True)
    _permute_valid_points(b1024)
    prior_col = np.full((len(b1024), 1), 0.15, dtype)

    from optimalinterpolation_tpu.models import exact_gp

    x0 = exact_gp.HYPER_INIT_LOG(ds.grid_res_km * 1000.0, dtype=dtype)
    h0_all = np.tile(np.asarray(x0)[None], (len(b1024), 1))

    base_opt = OptimizeConfig(max_iters=50, grad_tol=1e-3, ftol_abs=1e-3,
                              jitter=1e-6)
    # shared warm start: the production cascade's n=512 stage
    sx, sz, sm = _prefix_subset(b1024, 512)
    stage_cfg = dataclasses.replace(base_opt, ftol_abs=0.1)
    wchunk = _chunk_rows(512, 8, cfg.max_chunk_bytes, 4)
    t0 = time.time()
    pre = optimize_mll_chunked(h0_all, sx, sz - prior_col, sm, stage_cfg,
                               chunk_rows=wchunk, segment_iters=10)
    h0 = np.asarray(pre.log_hypers)
    print(json.dumps({"stage": "warmstart512", "wall_s": round(time.time() - t0, 1),
                      "iters_sum": int(np.sum(np.asarray(pre.iters)))}), flush=True)

    fx, fz, fm = b1024.x, b1024.z, b1024.mask
    fzc = fz - prior_col

    def exact_nll_at(params):
        # one exact blocked NLL evaluation (quality yardstick for all)
        from optimalinterpolation_tpu.ops import blocked_gp
        import jax.numpy as jnp

        vals = []
        for s in range(0, len(b1024), 512):
            e = min(s + 512, len(b1024))
            pad = 512 - (e - s)
            sl = lambda a: np.concatenate(  # noqa: E731
                [a[s:e], np.repeat(a[s:s+1], pad, axis=0)]
            ) if pad else a[s:e]
            v = blocked_gp.gp_nll_blocked(
                jnp.asarray(sl(params)), jnp.asarray(sl(fx)),
                jnp.asarray(sl(fzc)), jnp.asarray(sl(fm)), jitter=1e-6,
            )
            vals.append(np.asarray(v)[: e - s])
        return np.concatenate(vals)

    contenders = {
        "exact": (base_opt, None),
        "exact-big": (base_opt, 512),
        "nys512": (dataclasses.replace(base_opt, backend="nystroem",
                                       nystroem_m=512), None),
        "nys256": (dataclasses.replace(base_opt, backend="nystroem",
                                       nystroem_m=256), None),
    }
    results = {}
    for rep in range(reps):
        for name, (ocfg, force_chunk) in contenders.items():
            from optimalinterpolation_tpu.models.optimizer import routed_nystroem_m

            nm = routed_nystroem_m(ocfg, 1024) if ocfg.backend == "auto" else (
                ocfg.nystroem_m if ocfg.backend == "nystroem" else 0
            )
            chunk = force_chunk or _chunk_rows(
                1024, 8, cfg.max_chunk_bytes if not force_chunk else 9.8e9,
                4, nystroem_m=nm,
            )
            t0 = time.time()
            res = optimize_mll_chunked(
                h0.copy(), fx, fzc, fm, ocfg, chunk_rows=chunk,
                segment_iters=10,
            )
            wall = time.time() - t0
            params = np.asarray(res.log_hypers)
            out = {
                "contender": name, "rep": rep, "chunk": chunk,
                "wall_s": round(wall, 1),
                "iters_sum": int(np.sum(np.asarray(res.iters))),
                "iters_median": float(np.median(np.asarray(res.iters))),
                "cells_per_s": round(len(b1024) / wall, 1),
            }
            results[name] = params
            ex = exact_nll_at(params)
            out["exact_nll_mean"] = round(float(np.nanmean(ex)), 3)
            print(json.dumps(out), flush=True)
    if "exact" in results:
        ref = results["exact"]
        for name, p in results.items():
            d = np.abs(p - ref).max(axis=0)
            print(json.dumps({
                "contender": name,
                "max_abs_dloghyper_vs_exact": [round(float(v), 3) for v in d],
            }), flush=True)


if __name__ == "__main__":
    main()
