"""Benchmark: production-scale daily pan-Arctic field on real TPU hardware.

Reference baseline (BASELINE.md): the exact-GP optimize+predict for ONE grid
cell takes 102.59 s on the author's laptop (`dev/sparseGP_example.ipynb`
cell-3) => 0.009748 cells/sec serial. A daily field is ~17.7k active cells.

This bench generates a synthetic season at the reference's production scale
(320x320 @ 25 km, 9-day window, ~300 km neighborhoods) and runs the full
two-pass pipeline (per-cell MLL optimization, hyperparameter smoothing,
re-prediction) at PROGRESSIVELY LARGER cell subsamples:

  - the first, smoke-sized pass prints its JSON line IMMEDIATELY (a
    conservative cold-process number beats no number: the driver runs this
    unattended with a hard timeout, and backend init alone costs 5-8 min);
  - each further pass re-times at a larger scale on a fresh cell subsample
    and prints an upgraded line — THE LAST LINE WINS;
  - passes launch only while they fit the time budget
    (OI_BENCH_T0 + OI_BENCH_DEADLINE_S, default 40 min from process start;
    the first line is out ~3-4 min after backend init regardless).

Output: JSON lines {"metric", "value", "unit", "vs_baseline", "detail"};
detail carries per-bucket wall-clock, a documented FLOP model, and effective
TFLOP/s so perf work is comparable round over round from this artifact alone.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oi_jax_cache")

BASELINE_CELLS_PER_SEC = 1.0 / 102.59

CACHE = os.environ.get("OI_BENCH_CACHE", "/tmp/oi_bench_data")
GRID_RES_KM = 25
N_DAYS = 9
# Progressive subsample scales (fraction of the ~20k active pan-Arctic
# cells). Every bucket size is populated from 0.03 up, and per-cell cost is
# scale-independent (the subsample drops prediction cells, never
# observations). OI_BENCH_SCALE pins the upgrade passes to one scale.
#
# The first pass is a special SMOKE pass: measured on the tunneled TPU
# runtime, a cold process pays ~10-45 s of program-load for EVERY distinct
# executable (independent of the compile cache) plus ~1-2 min of XLA
# compile per program the persistent cache has never seen, and a
# full-config daily pass touches ~20 programs (seed pass + cascade stages +
# 5 bucket sizes x launch tiles + predict tiles) — 10-30 min of fixed cost
# before any timed result. The smoke pass cuts the set to THREE device
# programs (one 512-capacity bucket, <=128 cells => the monolithic
# optimizer executable + one predict executable reused by pass 2; smoothing
# runs on the host CPU) so its JSON line lands ~2-5 min after backend init
# even on a cold compile cache in degraded tunnel weather. Upgrade passes
# then run the real production config at growing scales while the budget
# lasts; the driver takes the LAST line.
SMOKE_SCALE = 0.006
SCALES = (0.03, 0.12, 0.25, 0.5, 1.0)
_PROC_T0 = time.time()


def _deadline() -> float:
    """Budget end for launching more passes. The driver's own timeout is
    unknown (round 1 recorded rc=124); because every pass PRINTS its line
    immediately, a generous internal deadline only adds upgrade passes —
    the smoke line is on stdout ~3-4 min after backend init either way."""
    t0 = float(os.environ.get("OI_BENCH_T0", _PROC_T0))
    return t0 + float(os.environ.get("OI_BENCH_DEADLINE_S", 3000))


def _dataset():
    from optimalinterpolation_tpu.data.reader import read_freeboard_season
    from optimalinterpolation_tpu.data.synthetic import make_synthetic_season

    marker = os.path.join(CACHE, f"x_{GRID_RES_KM}km.npy")
    if not os.path.exists(marker):
        make_synthetic_season(
            CACHE,
            grid_res_km=GRID_RES_KM,
            n_days=N_DAYS,
            seed=7,
            tracks_per_day=(10, 3, 8, 8),
            noise_std=0.1,
        )
    return read_freeboard_season(CACHE, GRID_RES_KM, "2018-2019")


def supervise() -> int:
    """Run the bench in a child process and babysit the axon tunnel.

    The tunnel's backend init has two observed failure modes (both transient,
    outages from minutes to hours): it raises UNAVAILABLE after ~15-25 min,
    or it hangs indefinitely. The child writes an ".init" marker the moment
    backend init completes (before any real device work) and a "warmed"
    marker once its first timed pass has PRINTED its JSON line. Until the
    .init marker exists no program has reached the device, so killing the
    child is safe; after it, a kill can land MID-EXECUTION and wedge the TPU
    worker for ~10-20 min, so the supervisor only kills an inited child at
    the hard stop (deadline + OI_BENCH_HARD_GRACE_S), accepting that risk to
    guarantee the unattended driver run terminates. Failures after the warm
    marker are not retried — a JSON line is already out and a retried init
    cannot beat it within the budget. Fast pre-init exits
    (< OI_BENCH_FAST_FAIL_S) are deterministic bugs, not tunnel weather, and
    bail after two in a row.
    """
    deadline = _deadline()
    init_timeout = float(os.environ.get("OI_BENCH_INIT_TIMEOUT_S", 720))
    marker = os.environ.get(
        "OI_BENCH_WARM_MARKER", f"/tmp/oi_bench_warmed_{os.getpid()}"
    )
    env = dict(
        os.environ, OI_BENCH_CHILD="1", OI_BENCH_WARM_MARKER=marker,
        OI_BENCH_T0=str(_PROC_T0),
    )
    attempt = 0
    try:
        return _supervise_loop(marker, env, deadline, init_timeout, attempt)
    finally:
        for m in (marker, marker + ".init"):
            if os.path.exists(m):
                os.unlink(m)


def _supervise_loop(marker, env, deadline, init_timeout, attempt) -> int:
    import subprocess

    init_marker = marker + ".init"
    hard_grace = float(os.environ.get("OI_BENCH_HARD_GRACE_S", 300))
    fast_fail_s = float(os.environ.get("OI_BENCH_FAST_FAIL_S", 120))
    fast_fails = 0
    while True:
        attempt += 1
        for m in (marker, init_marker):
            if os.path.exists(m):
                os.unlink(m)
        t0 = time.time()
        child = subprocess.Popen([sys.executable] + sys.argv, env=env)
        while True:
            rc = child.poll()
            if rc is not None:
                break
            now = time.time()
            if (not os.path.exists(init_marker)
                    and now - t0 > init_timeout):
                # Still in backend init after the budget: treat as a hung
                # tunnel. The .init marker is written before the first real
                # device op, so nothing has reached the device yet and a
                # kill cannot wedge the worker.
                print(f"bench attempt {attempt}: no backend init after "
                      f"{init_timeout:.0f}s, killing child", file=sys.stderr)
                child.kill()
                child.wait()
                rc = "timeout"
                break
            if now > deadline + hard_grace:
                # Hard stop: the child touched the device but hung (tunnel
                # hangs are documented at hours). Killing it MAY wedge the
                # worker for ~10-20 min, but past deadline+grace a bounded
                # unattended run matters more than the wedge risk. If the
                # child already printed a JSON line, that line stands.
                print(f"bench attempt {attempt}: hard stop "
                      f"{hard_grace:.0f}s past deadline, killing child",
                      file=sys.stderr)
                child.kill()
                child.wait()
                return 0 if os.path.exists(marker) else 1
            time.sleep(1)
        if rc == 0:
            return 0
        warmed = os.path.exists(marker)
        if warmed or time.time() + 480 > deadline:
            # Once warmed a JSON line is out (exit 0 so the driver parses
            # it); and near the deadline there is no time for a ~5-8 min
            # re-init.
            return 0 if warmed else (child.returncode or 1)
        if rc != "timeout" and not os.path.exists(init_marker) \
                and time.time() - t0 < fast_fail_s:
            # Exited in seconds without ever touching the backend: a
            # deterministic bug (ImportError, bad data path), not the
            # 15-25-min UNAVAILABLE init failure — surface it instead of
            # retrying it until the deadline.
            fast_fails += 1
            if fast_fails >= 2:
                print(f"bench attempt {attempt}: {fast_fails} consecutive "
                      "fast pre-init failures, giving up (deterministic "
                      "bug, not tunnel weather)", file=sys.stderr)
                return child.returncode or 1
        else:
            fast_fails = 0
        pause = float(os.environ.get("OI_BENCH_RETRY_PAUSE_S", 60))
        print(f"bench attempt {attempt} failed (rc={rc}), retrying in "
              f"{pause:.0f}s ({deadline - time.time():.0f}s left)",
              file=sys.stderr)
        time.sleep(pause)


# ---------------------------------------------------------------------------
# FLOP model (documented, approximate — for round-over-round comparability)
# ---------------------------------------------------------------------------
# Conventions: one (m,k)x(k,n) matmul = 2mkn FLOPs; Cholesky(n) = n^3/3.
# Optimize stages: one accepted L-BFGS iteration evaluates the NLL at ~2.2
# trial points (measured average incl. the accepted one) at ~1.2x Cholesky
# cost each (kernel build + factor + solves) and computes one gradient from
# the accepted factors at ~2x Cholesky (T = L^-1 build + row-streamed K^-1
# traces) => ~4.6 Cholesky-equivalents per iteration. Predict: one build +
# factor + 2 solves ~ 1.3x Cholesky. Nystrom-objective stages (entries carry
# an "m" key) cost per evaluation ~6 n m^2 (Phi build 2nm^2 + Phi^T Phi
# 2nm^2 + autodiff reverse ~ one more 2nm^2) + 2 m^3 for the two M-factors.
_EVALS_PER_ITER = 2.2


def _entry_flops(e: dict) -> float:
    n, cells, iters = e["n"], e["cells"], e["iters_sum"]
    chol = n ** 3 / 3.0
    stage = e["stage"].split(":")[-1]
    if stage in ("opt", "cascade"):
        if e.get("m"):
            m = e["m"]
            per_eval = 6.0 * n * m * m + 2.0 * m ** 3
            return iters * (_EVALS_PER_ITER + 1.0) * per_eval
        return iters * (_EVALS_PER_ITER * 1.2 + 2.0) * chol
    if stage in ("predict", "pass2"):
        return cells * 1.3 * chol
    return 0.0


def _economics(stats: list, wall: float) -> dict:
    by_key: dict = {}
    for e in stats:
        k = f"{e['stage']}:n{e['n']}" + (f":m{e['m']}" if e.get("m") else "")
        d = by_key.setdefault(
            k, {"wall_s": 0.0, "cells": 0, "iters": 0, "tflops": 0.0}
        )
        d["wall_s"] += e["wall_s"]
        d["cells"] += e["cells"]
        d["iters"] += e["iters_sum"]
        d["tflops"] += _entry_flops(e) / 1e12
    total_tf = sum(d["tflops"] for d in by_key.values())
    for d in by_key.values():
        d["wall_s"] = round(d["wall_s"], 2)
        d["tflops"] = round(d["tflops"], 2)
        d["eff_tflops_per_s"] = round(d["tflops"] / max(d["wall_s"], 1e-9), 2)
    return {
        "stages": by_key,
        "total_model_tflops": round(total_tf, 2),
        "eff_tflops_per_s": round(total_tf / max(wall, 1e-9), 2),
        "flop_model": "matmul=2mkn, chol=n^3/3; opt iter ~4.6 chol-equiv",
    }


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    if os.environ.get("OI_BENCH_LOG"):
        import logging

        logging.basicConfig(
            stream=sys.stderr, level=logging.INFO,
            format="[%(asctime)s] %(message)s", datefmt="%H:%M:%S",
        )
    from optimalinterpolation_tpu.models.optimizer import OptimizeConfig
    from optimalinterpolation_tpu.pipeline.daily import DailyConfig, interpolate_daily

    deadline = _deadline()

    def subsampled(scale: float, seed: int):
        ds = _dataset()
        if scale < 1.0:
            # shrink the active-cell set for quick runs
            sie = ds.sie.copy()
            rng = np.random.default_rng(seed)
            drop = rng.random(sie.shape[:2]) > scale
            sie[drop] = np.nan
            ds.sie = sie
        return ds

    import dataclasses

    cfg = DailyConfig(
        window_days=N_DAYS,
        radius_km=300.0,
        opt=OptimizeConfig(max_iters=50, grad_tol=1e-3, ftol_abs=1e-3),
        dtype="float32",
        jitter=1e-6,
    )
    # Smoke config: minimal executable set (see SMOKE_SCALE above). The 512
    # truncation is a real approximation (nearest-512 of up to ~4k points) —
    # reported in the line's detail; the rmse guard still applies.
    smoke_cfg = dataclasses.replace(
        cfg, buckets=(512,), warmstart_n=0, spatial_seed_stride=0,
    )

    # Probe the device with one trivial program first: backend init (the
    # 5-8 min / fails-after-25-min phase) completes HERE, and writing the
    # .init marker closes the supervisor's kill-at-init-timeout window —
    # from this point on a kill could land mid-execution and wedge the
    # worker, so the supervisor stops killing (except at the hard stop).
    import jax.numpy as jnp

    float(jnp.sum(jnp.asarray(np.random.default_rng(0).standard_normal(8),
                              jnp.float32)))
    if os.environ.get("OI_BENCH_WARM_MARKER"):
        with open(os.environ["OI_BENCH_WARM_MARKER"] + ".init", "w"):
            pass

    truth = None  # loaded lazily after the dataset exists

    pinned = os.environ.get("OI_BENCH_SCALE")
    upgrade_scales = (float(pinned),) if pinned else SCALES
    passes = [(SMOKE_SCALE, smoke_cfg)] if not os.environ.get(
        "OI_BENCH_NO_SMOKE"
    ) else []
    passes += [(s, cfg) for s in upgrade_scales]

    last_wall, last_scale = None, None
    for i, (scale, pass_cfg) in enumerate(passes):
        if i > 0:
            # Budget gate. The first full-config pass pays the ~15-program
            # load bill the smoke pass avoided — budget it as a fixed
            # conservative 600 s; subsequent same-config passes scale
            # linearly in cells from the last measured wall.
            if pass_cfg is not smoke_cfg and (
                i == 0 or passes[i - 1][1] is smoke_cfg
            ):
                est = 600.0
            else:
                # Same-config upgrade: one-time executable loads (~300 s
                # measured cold) do not repeat, so scale only the compute
                # part of the last wall.
                compute = max(last_wall * 0.5, last_wall - 300.0)
                est = compute * (scale / last_scale) * 1.25 + 60.0
            if time.time() + est > deadline:
                print(
                    f"bench: stopping before scale={scale} "
                    f"(est {est:.0f}s > {deadline - time.time():.0f}s left)",
                    file=sys.stderr,
                )
                break
        ds = subsampled(scale, seed=i)
        n_active = int(np.isfinite(ds.sie[:, :, pass_cfg.t_mid]).sum())
        stats: list = []
        t0 = time.time()
        res = interpolate_daily(
            ds, day=0, prior_mean=0.15, config=pass_cfg, stats=stats
        )
        wall = time.time() - t0
        last_wall, last_scale = wall, scale

        # Accuracy guard: the synthetic FYI file is truth - 0.02 m (see
        # data/synthetic.py), so each pass's smoothed field is scored
        # against the true field at the interpolated date.
        if truth is None:
            truth = np.load(
                os.path.join(CACHE, f"CS2_FYI_synthetic_{GRID_RES_KM}km.npy")
            )[:, :, cfg.t_mid] + 0.02
        scored = np.isfinite(res.interp_smth)
        rmse_truth = float(
            np.sqrt(np.mean((res.interp_smth[scored] - truth[scored]) ** 2))
        )
        cells_per_sec = n_active / wall
        out = {
            "metric": "daily_panarctic_optimized_cells_per_sec",
            "value": round(cells_per_sec, 3),
            "unit": "cells/s",
            "vs_baseline": round(cells_per_sec / BASELINE_CELLS_PER_SEC, 1),
            "detail": {
                "scale": scale,
                "pass_index": i,
                "cold_process": i == 0,
                "config": (
                    "smoke(buckets<=512,truncated,no-seed,no-cascade)"
                    if pass_cfg is smoke_cfg else "production"
                ),
                "active_cells": n_active,
                "finite_outputs": int(scored.sum()),
                "rmse_vs_truth_m": round(rmse_truth, 4),
                "wall_s": round(wall, 2),
                "grid": f"{ds.obs.shape[0]}x{ds.obs.shape[1]}@{GRID_RES_KM}km",
                "window_days": N_DAYS,
                "economics": _economics(stats, wall),
            },
        }
        print(json.dumps(out), flush=True)
        if i == 0 and os.environ.get("OI_BENCH_WARM_MARKER"):
            # First JSON line is out: from here on the supervisor never
            # retries (a retry's ~5-8 min re-init cannot beat this line).
            with open(os.environ["OI_BENCH_WARM_MARKER"], "w"):
                pass
    return 0


if __name__ == "__main__":
    if os.environ.get("OI_BENCH_CHILD") or os.environ.get("OI_BENCH_NO_SUPERVISE"):
        sys.exit(main())
    sys.exit(supervise())
