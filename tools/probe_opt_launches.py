"""Per-launch timing probe for the segmented blocked-path optimizer.

Isolates ONE bucket of the production-scale bench dataset and runs the
chunked L-BFGS with OI_OPT_TRACE per-launch phase timing (upload / execute
/ writeback), to attribute the measured gap between the blocked path's
microbenched per-cell-iteration cost and its end-to-end wall in
`bench.py`'s economics. Run on the real TPU:

    python tools/probe_opt_launches.py [N=1024] [max_cells=4096] [seg=10]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oi_jax_cache")
os.environ["OI_OPT_TRACE"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    max_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    seg = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import jax
    import jax.numpy as jnp

    from optimalinterpolation_tpu.data.neighbors import gather_neighborhoods
    from optimalinterpolation_tpu.data.reader import read_freeboard_season
    from optimalinterpolation_tpu.data.window import flatten_window
    from optimalinterpolation_tpu.models.exact_gp import HYPER_INIT_LOG
    from optimalinterpolation_tpu.models.optimizer import (
        OptimizeConfig,
        optimize_mll_chunked,
    )
    from optimalinterpolation_tpu.pipeline import daily as D

    print(f"backend={jax.default_backend()}", flush=True)
    # force backend init before timing anything
    float(jnp.sum(jnp.ones((8,), jnp.float32)))

    ds = read_freeboard_season("/tmp/oi_bench_data", 25, "2018-2019")
    train = flatten_window(ds.obs[:, :, :, 0:9], ds.x, ds.y)
    sie = ds.sie[:, :, 4]
    active = np.isfinite(sie)
    cells = np.column_stack([ds.x[active], ds.y[active]])
    t0 = time.time()
    batches = gather_neighborhoods(
        train, cells, t_star=4.0, radius_m=300e3, dtype=np.float32,
        batch_multiple=8,
    )
    print(f"gather: {time.time() - t0:.1f}s "
          f"{[(b.capacity, len(b)) for b in batches]}", flush=True)
    b = next(bb for bb in batches if bb.capacity == n_target)
    rows = min(max_cells, len(b))
    cfg = OptimizeConfig(max_iters=50, grad_tol=1e-3, ftol_abs=1e-3)
    chunk = D._chunk_rows(b.capacity, 8, 8e9, 4)
    print(f"bucket n={b.capacity} cells={len(b)} using {rows}, "
          f"chunk_rows={chunk} seg={seg}", flush=True)
    h0 = np.tile(
        np.asarray(HYPER_INIT_LOG(25e3, dtype=jnp.float32))[None], (rows, 1)
    )
    t0 = time.time()
    res = optimize_mll_chunked(
        h0, b.x[:rows], b.z[:rows] - 0.15 * b.mask[:rows], b.mask[:rows],
        cfg, chunk_rows=chunk, segment_iters=seg,
    )
    wall = time.time() - t0
    iters = int(res.iters.sum())
    print(
        f"TOTAL wall={wall:.1f}s cells={rows} iters_sum={iters} "
        f"ms_per_cell_iter={1e3 * wall / max(iters, 1):.3f} "
        f"median_iters={np.median(res.iters):.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
