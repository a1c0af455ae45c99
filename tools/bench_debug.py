"""Run the daily pipeline at OI_BENCH_SCALE with stage-level INFO logging.

Thin wrapper over the real pipeline (no duplicated flow): enables the
pipeline's own stage timers so a TPU-side stall can be attributed to a
specific bucket/stage. Run from the repo root (or with the repo on
PYTHONPATH alongside /root/.axon_site).
"""

from __future__ import annotations

import logging
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oi_jax_cache")

CACHE = os.environ.get("OI_BENCH_CACHE", "/tmp/oi_bench_data")
SCALE = float(os.environ.get("OI_BENCH_SCALE", "0.03"))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    logging.basicConfig(
        stream=sys.stderr,
        level=logging.INFO,
        format="[%(asctime)s] %(message)s",
        datefmt="%H:%M:%S",
    )
    from optimalinterpolation_tpu.data.reader import read_freeboard_season
    from optimalinterpolation_tpu.models.optimizer import OptimizeConfig
    from optimalinterpolation_tpu.pipeline.daily import DailyConfig, interpolate_daily

    ds = read_freeboard_season(CACHE, 25, "2018-2019")
    if SCALE < 1.0:
        sie = ds.sie.copy()
        rng = np.random.default_rng(0)
        sie[rng.random(sie.shape[:2]) > SCALE] = np.nan
        ds.sie = sie

    cfg = DailyConfig(
        window_days=9, radius_km=300.0,
        opt=OptimizeConfig(max_iters=50, grad_tol=1e-3, ftol_abs=1e-3),
        dtype="float32", jitter=1e-6,
    )
    n_active = int(np.isfinite(ds.sie[:, :, cfg.t_mid]).sum())
    logging.info("backend=%s active cells=%d", jax.default_backend(), n_active)
    t0 = time.time()
    res = interpolate_daily(ds, day=0, prior_mean=0.15, config=cfg)
    wall = time.time() - t0
    logging.info(
        "DONE: %.1fs, %.2f cells/s, finite outputs %d",
        wall, n_active / wall, int(np.isfinite(res.interp_smth).sum()),
    )


if __name__ == "__main__":
    sys.exit(main())
