"""Experiment: cold-start L-BFGS iterations from the reference x0 vs a
data-driven moment init (run on CPU; iteration counts are hardware-neutral).

The reference initializes every cell at x0 = [log 25e3, log 25e3, log 1,
log 1, log 0.1] (GP_example.ipynb:cell-3): sigma_f^2 = 1, sigma_n^2 = 0.1,
while real (and synthetic) freeboard residuals have total variance ~1e-2 —
two orders of magnitude off, which the optimizer spends its first ~10
iterations walking down. Moment init: split the per-cell residual variance
var(z - prior) into sf2/sn2 by a fixed ratio, keep the x0 length-scales.

Usage: python tools/exp_moment_init.py [grid_res_km] [n_cells_cap]

RESULT (2026-08-19, 100 km grid, 208 cells, CPU f32, ftol_abs=1e-3):
NEGATIVE — do not wire in. Mean iterations 26.9 (ref x0) -> 25.9 (moment),
a ~4% saving, and the moment start lands 8/208 cells >1 nat WORSE (5/208
better; median delta 0.000). Iteration count is dominated by the curved NLL
valley in length-scale space (which both inits share), not by the ~5-nat
travel in the (sf2, sn2) coordinates; starting at low signal variance also
sits nearer the degenerate noise-only basin. The production levers for
cold-start cost remain spatial seeding, day chaining, and the subsample
cascade (pipeline/daily.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from optimalinterpolation_tpu.data.neighbors import gather_neighborhoods
from optimalinterpolation_tpu.data.synthetic import make_synthetic_season
from optimalinterpolation_tpu.data.reader import read_freeboard_season
from optimalinterpolation_tpu.data.window import flatten_window
from optimalinterpolation_tpu.models import exact_gp
from optimalinterpolation_tpu.models.optimizer import (
    OptimizeConfig,
    optimize_mll_chunked,
)

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 100
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 400
PRIOR = 0.15

outdir = f"/tmp/oi_exp_moment_{GRID}"

if not os.path.exists(os.path.join(outdir, f"x_{GRID}km.npy")):
    make_synthetic_season(outdir, grid_res_km=GRID, n_days=9, seed=11)
ds = read_freeboard_season(outdir, GRID, "2018-2019")

sie_day = ds.sie[:, :, 4]
sat = ds.obs[:, :, :, 0:9]
train = flatten_window(sat, ds.x, ds.y)
active_ij = np.nonzero(np.isfinite(sie_day))
cells_xy = np.stack([ds.x[active_ij], ds.y[active_ij]], axis=1)
rng = np.random.default_rng(0)
if cells_xy.shape[0] > CAP:
    keep = rng.choice(cells_xy.shape[0], CAP, replace=False)
    cells_xy = cells_xy[keep]

batches = gather_neighborhoods(
    train, cells_xy, t_star=4.0, radius_m=300e3,
    buckets=(128, 256, 512, 1024, 2048, 4096), batch_multiple=8,
    dtype=np.dtype("float32"),
)

x0 = np.asarray(exact_gp.HYPER_INIT_LOG(GRID * 1000.0, dtype=np.float32))
cfg = OptimizeConfig(max_iters=60, grad_tol=1e-3, ftol_abs=1e-3)

print(f"grid {GRID} km, buckets: "
      + ", ".join(f"N={b.capacity} B={len(b)}" for b in batches))

for name in ("ref_x0", "moment"):
    tot_iters = 0
    tot_cells = 0
    nlls = []
    t0 = time.time()
    for b in batches:
        z = b.z - PRIOR
        h0 = np.tile(x0[None], (len(b), 1))
        if name == "moment":
            # masked per-cell residual variance
            cnt = np.maximum(b.mask.sum(axis=1), 1.0)
            mu = (z * b.mask).sum(axis=1) / cnt
            var = ((z - mu[:, None]) ** 2 * b.mask).sum(axis=1) / cnt
            var = np.maximum(var, 1e-6)
            h0[:, 3] = np.log(0.75 * var)
            h0[:, 4] = np.log(0.25 * var)
        res = optimize_mll_chunked(
            h0.astype(np.float32), b.x, z, b.mask, cfg,
            chunk_rows=512, segment_iters=10,
        )
        tot_iters += int(np.sum(res.iters))
        tot_cells += len(b)
        nlls.append(np.asarray(res.nll))
        med = np.median(np.asarray(res.iters))
        print(f"  [{name}] N={b.capacity} B={len(b)}: median iters {med:.0f}, "
              f"max {int(np.max(res.iters))}")
    nll_all = np.concatenate(nlls)
    print(f"[{name}] total iters {tot_iters} over {tot_cells} cells "
          f"(mean {tot_iters/tot_cells:.1f}), sum NLL "
          f"{np.nansum(np.where(np.isfinite(nll_all), nll_all, 0.0)):.2f}, "
          f"wall {time.time()-t0:.1f}s")
    if name == "ref_x0":
        nll_ref = nll_all
    else:
        d = nll_all - nll_ref
        d = d[np.isfinite(d)]
        print(f"[moment vs ref] NLL delta: median {np.median(d):+.3f} nats, "
              f"p90 {np.percentile(d, 90):+.3f}, worse>1nat: "
              f"{int((d > 1.0).sum())}/{d.size}, better>1nat: "
              f"{int((d < -1.0).sum())}/{d.size}")
