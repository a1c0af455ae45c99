"""Command-line interface.

The reference has no config system: production knobs are hardcoded module
globals (``GPR_CS2S3.py:201-217``) and the binner asks via ``input()``
(``read_and_bin.py:60-64``). This CLI turns those into real subcommands:

  python -m optimalinterpolation_tpu daily     one daily field
  python -m optimalinterpolation_tpu season    a whole season
  python -m optimalinterpolation_tpu bin       along-track binning (C1)
  python -m optimalinterpolation_tpu synth     synthetic season generator
  python -m optimalinterpolation_tpu cell      single-cell GP (exact |
                                               nystroem | svgp), the
                                               GP_example.ipynb workflow
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the batched optimize/predict
    programs compile once per bucket shape (~1-2 min each on the TPU); the
    cache turns every later invocation into a sub-second load."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oi_jax_cache")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )


def _add_daily_args(p):
    p.add_argument("--datapath", required=True)
    p.add_argument("--grid-res", type=int, default=25)
    p.add_argument("--season", default="2018-2019")
    p.add_argument("--window-days", type=int, default=9)
    p.add_argument("--radius-km", type=float, default=300.0)
    p.add_argument("--kernel", default="matern32",
                   choices=["matern12", "matern32", "matern52", "se"])
    p.add_argument("--max-iters", type=int, default=60)
    p.add_argument("--ftol", type=float, default=1e-3,
                   help="NLL plateau stop (nats/iteration); 0 disables and "
                        "runs every cell to --max-iters / grad tolerance")
    p.add_argument("--restarts", type=int, default=1,
                   help="multi-restart optimization trajectories per cell")
    p.add_argument("--warmstart-n", type=int, default=1024,
                   help="optimize buckets larger than this on a strided "
                        "subset first, then fine-tune at full N; 0 disables")
    p.add_argument("--seed-stride", type=int, default=4,
                   help="spatial seeding: cold-optimize every Nth grid cell, "
                        "warm-start the rest from the nearest seed; 0 disables")
    p.add_argument("--opt-n-max", type=int, default=None,
                   help="cap hyperparameter estimation at a uniform N-point "
                        "subsample per cell (prediction stays full-N); "
                        "default 1024 (r4 A/B: rmse unchanged, kills the "
                        "largest buckets' fine passes); 0 = full-N")
    p.add_argument("--optimizer", default="lbfgs", choices=["lbfgs", "adam"])
    p.add_argument("--dtype", default="float32")
    p.add_argument("--jitter", type=float, default=1e-6)
    p.add_argument("--prior-mean", type=float, default=None,
                   help="constant prior mean; otherwise --fyi is used")
    p.add_argument("--fyi", default=None, help="CS2 FYI .npy for the prior")
    p.add_argument("--prior-background", type=int, default=None,
                   metavar="N_DAYS",
                   help="spatially varying prior: the first-N_DAYS "
                        "all-satellite mean field with pole-hole fill "
                        "(dev/sparseGP_example.ipynb cell-1 background/"
                        "priorXS; reference uses 31 days)")
    p.add_argument("--fyi-offset", type=int, default=16,
                   help="FYI product start relative to the season start "
                        "(reference product: 16; synthetic/aligned: 0)")
    p.add_argument("--outdir", default=".")
    p.add_argument("--devices", type=int, default=None,
                   help="shard cells across this many devices")
    p.add_argument("--hypers", default=None,
                   help=".npz of precomputed hyperparameter fields "
                        "(ell_x, ell_y, ell_t, sf2, sn2): the quicklook "
                        "opt=False path — skips per-cell optimization")
    p.add_argument("--profile", default=None, metavar="LOGDIR",
                   help="write a jax.profiler device trace to LOGDIR "
                        "(view in TensorBoard/Perfetto)")
    p.add_argument("--verbose", action="store_true",
                   help="per-stage INFO logs (cells/sec, chunk timings)")


def _load(args):
    from optimalinterpolation_tpu.data.reader import read_freeboard_season

    return read_freeboard_season(args.datapath, args.grid_res, args.season)


def _configs(args):
    from optimalinterpolation_tpu.models.optimizer import OptimizeConfig
    from optimalinterpolation_tpu.ops.kernels import Kernel
    from optimalinterpolation_tpu.pipeline.daily import DailyConfig

    cfg = DailyConfig(
        window_days=args.window_days,
        radius_km=args.radius_km,
        kind=Kernel(args.kernel),
        opt=OptimizeConfig(method=args.optimizer, max_iters=args.max_iters,
                           ftol_abs=args.ftol, restarts=args.restarts),
        dtype=args.dtype,
        jitter=args.jitter,
        warmstart_n=args.warmstart_n,
        spatial_seed_stride=args.seed_stride,
    )
    if getattr(args, "opt_n_max", None) is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, opt_n_max=args.opt_n_max)
    return cfg


def _sharding(args):
    if args.devices is None:
        return None
    from optimalinterpolation_tpu.parallel.mesh import cell_sharding, make_mesh

    return cell_sharding(make_mesh(args.devices))


def _prior(args, ds):
    if args.prior_mean is not None:
        return lambda day: args.prior_mean
    if getattr(args, "prior_background", None):
        from optimalinterpolation_tpu.data.prior import background_prior
        from optimalinterpolation_tpu.io.quicklook import grid_lonlat

        _, lat = grid_lonlat(ds.x, ds.y)
        field = background_prior(ds.obs, lat, n_days=args.prior_background)
        return lambda day: field
    if args.fyi is not None:
        from optimalinterpolation_tpu.data.prior import constant_fyi_prior

        fyi = np.load(args.fyi)
        return lambda day: constant_fyi_prior(fyi, day, offset=args.fyi_offset)
    raise SystemExit("provide --prior-mean or --fyi")


def _hypers(args):
    if args.hypers is None:
        return None
    z = np.load(args.hypers)
    return {k: z[k] for k in ("ell_x", "ell_y", "ell_t", "sf2", "sn2")}


def _observability(args):
    """Honour --verbose / --profile; returns a context manager for the run."""
    import contextlib

    if getattr(args, "verbose", False):
        import logging

        logging.basicConfig(level=logging.INFO, format="%(message)s")
        logging.getLogger("optimalinterpolation_tpu").setLevel(logging.INFO)
    if getattr(args, "profile", None):
        from optimalinterpolation_tpu.utils.profiling import trace

        return trace(args.profile)
    return contextlib.nullcontext()


def cmd_daily(args):
    from optimalinterpolation_tpu.io.pickles import save_pickle
    from optimalinterpolation_tpu.pipeline.daily import interpolate_daily

    ds = _load(args)
    prior = _prior(args, ds)(args.day)
    with _observability(args):
        res = interpolate_daily(ds, args.day, prior, _configs(args),
                                _sharding(args),
                                precomputed_hypers=_hypers(args))
    import os

    os.makedirs(args.outdir, exist_ok=True)
    out = os.path.join(args.outdir, f"CS2S3_{res.date}_{ds.grid_res_km}km.pkl")
    save_pickle(res.to_reference_dict(), out)
    outputs = {"date": res.date, "output": out,
               "cells": int(np.isfinite(res.interp).sum())}
    if args.quicklook:
        from optimalinterpolation_tpu.io.quicklook import (
            grid_lonlat,
            write_result_quicklook,
        )

        lon, lat = grid_lonlat(ds.x, ds.y)
        outputs["quicklook"] = write_result_quicklook(
            res, lon, lat, ds.grid_res_km, args.outdir
        )
    print(json.dumps(outputs))


def cmd_cell(args):
    """Single-cell GP train/predict — the reference's notebook workflow.

    Rebuilds ``GP_example.ipynb`` cell-3 (exact GP), cell-5 (Nystroem) and
    ``dev/sparseGP_example.ipynb`` cell-5 (SVGP) as one command: pick a
    location, gather its radius/window neighborhood, fit, predict, report
    mean / sigma / lZ / hyperparameters (and optionally the paper-Fig.-2
    prior-vs-posterior figure + training-footprint map).
    """
    import time

    import jax.numpy as jnp

    from optimalinterpolation_tpu.data.neighbors import gather_neighborhoods
    from optimalinterpolation_tpu.data.window import flatten_window
    from optimalinterpolation_tpu.models import exact_gp
    from optimalinterpolation_tpu.ops.kernels import Kernel

    ds = _load(args)
    prior = _prior(args, ds)(args.day)
    if np.ndim(prior) == 2:
        # spatially varying prior: sample it at the nearest grid cell
        k = np.argmin((ds.x - args.x) ** 2 + (ds.y - args.y) ** 2)
        v = np.asarray(prior).ravel()[k]
        prior = float(v) if np.isfinite(v) else float(np.nanmean(prior))
    prior = float(prior)
    t_mid = args.window_days // 2
    date = ds.dates[args.day + t_mid]
    sat = ds.obs[:, :, :, args.day : args.day + args.window_days]
    train = flatten_window(sat, ds.x, ds.y)
    dtype = np.float64 if args.dtype == "float64" else np.float32
    batches = gather_neighborhoods(
        train,
        np.array([[args.x, args.y]]),
        t_star=float(t_mid),
        radius_m=args.radius_km * 1e3,
        batch_multiple=1,
        dtype=dtype,
    )
    if not batches or int(batches[0].mask[0].sum()) == 0:
        raise SystemExit("no observations within the radius/window")
    b = batches[0]
    x = jnp.asarray(b.x[0])
    z = jnp.asarray(b.z[0])
    mask = jnp.asarray(b.mask[0])
    xstar = jnp.asarray(b.xstar[0])[None]
    n = int(b.mask[0].sum())
    kind = Kernel(args.kernel)
    mean = jnp.asarray(prior, dtype=x.dtype)
    h0 = exact_gp.HYPER_INIT_LOG(ds.grid_res_km * 1e3, dtype=x.dtype)
    out = {"date": date, "method": args.method, "n_points": n,
           "prior_mean": prior}
    footprint_inducing = None

    # Manual enter/exit keeps the method dispatch flat; on an exception the
    # process exits anyway (CLI), so a leaked trace context is moot.
    obs_ctx = _observability(args)
    obs_ctx.__enter__()
    t0 = time.time()
    if args.method == "exact":
        from optimalinterpolation_tpu.models.optimizer import (
            OptimizeConfig,
            optimize_mll,
        )

        cfg = OptimizeConfig(
            method=args.optimizer, max_iters=args.max_iters, kind=kind,
            jitter=args.jitter, restarts=args.restarts,
            ftol_abs=args.ftol,
        )
        opt = optimize_mll(h0, x, (z - mean) * mask, mask, config=cfg)
        pred = exact_gp.predict(
            opt.log_hypers, x, z, xstar, mask, mean, kind=kind,
            jitter=args.jitter,
        )
        log_h = opt.log_hypers
        out.update(
            mean=float(pred.mean[0]), std=float(pred.std[0]),
            lZ=float(pred.lZ), prior_std=float(pred.prior_std[0]),
            nll=float(opt.nll), iters=int(opt.iters),
        )
    elif args.method == "nystroem":
        from jax.scipy.optimize import minimize as jax_minimize

        from optimalinterpolation_tpu.models.nystroem import (
            nystroem_nll,
            nystroem_predict,
        )

        valid = np.nonzero(b.mask[0])[0]
        m_lmk = min(args.landmarks, len(valid))
        rng = np.random.default_rng(args.seed)
        lmk = jnp.asarray(rng.choice(valid, size=m_lmk, replace=False))
        zc = (z - mean) * mask

        def objective(h):
            return nystroem_nll(h, x, zc, lmk, mask, kind=kind,
                                jitter=args.jitter)

        res = jax_minimize(objective, h0, method="BFGS",
                           options={"maxiter": args.max_iters})
        pred = nystroem_predict(res.x, x, z, xstar, lmk, mask, mean,
                                kind=kind, jitter=args.jitter)
        log_h = res.x
        out.update(
            mean=float(pred.mean[0]), std=float(pred.std[0]),
            nll=float(res.fun), landmarks=m_lmk,
        )
    elif args.method == "svgp":
        import jax

        from optimalinterpolation_tpu.models.svgp import (
            SVGPConfig,
            svgp_fit,
            svgp_init,
            svgp_predict,
        )

        cfg = SVGPConfig(
            num_inducing=args.num_inducing, iterations=args.svgp_iters,
            batch_size=args.svgp_batch, kind=kind,
        )
        params0 = svgp_init(x, mask, cfg.num_inducing, h0, prior)
        fit = svgp_fit(params0, x, z, mask, jax.random.key(args.seed),
                       config=cfg)
        pred = svgp_predict(fit.params, xstar, kind=kind)
        log_h = fit.params.log_hypers
        footprint_inducing = np.asarray(fit.params.z[:, :2])
        out.update(
            mean=float(pred.mean[0]), std=float(pred.std[0]),
            elbo=float(fit.elbo_log[-1]),
            learned_mean=float(fit.params.mean),
        )
    else:  # pragma: no cover - argparse choices guard this
        raise SystemExit(f"unknown method {args.method}")
    out["seconds"] = round(time.time() - t0, 3)
    obs_ctx.__exit__(None, None, None)
    out["hypers"] = {
        k: float(np.exp(v))
        for k, v in zip(("ell_x", "ell_y", "ell_t", "sf2", "sn2"),
                        np.asarray(log_h))
    }

    if args.figure:
        from optimalinterpolation_tpu import viz

        prior_std = out.get("prior_std", float(np.sqrt(out["hypers"]["sf2"])))
        pdf_path = f"{args.figure}_pdf.png"
        viz.plot_prior_posterior(prior, prior_std, out["mean"], out["std"],
                                 path=pdf_path)
        foot_path = f"{args.figure}_footprint.png"
        valid = b.mask[0] > 0
        viz.plot_training_footprint(
            np.asarray(b.x[0][valid, :2]), np.asarray(b.z[0][valid]),
            (args.x, args.y), radius_m=args.radius_km * 1e3,
            inducing_xy=footprint_inducing, path=foot_path,
        )
        out["figures"] = [pdf_path, foot_path]
    print(json.dumps(out))


def _days_spec(spec: str):
    """``--days`` value -> slice over the season's valid window indices.

    ``"5"`` = window 5 only; ``"2:10"``/``"2:"``/``":10"`` = python slice
    semantics; ``"0:30:3"`` = every 3rd window. run_season applies the slice
    to its own valid-window range (one source of truth for the window count).
    """
    import argparse

    parts = spec.split(":")
    try:
        ints = [int(p) if p else None for p in parts]
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"invalid --days {spec!r}: expected INT, START:STOP, or "
            "START:STOP:STEP (python slice semantics)"
        )
    if len(parts) == 1:
        i = ints[0]
        return slice(i, None if i == -1 else i + 1)
    if len(parts) > 3:
        raise argparse.ArgumentTypeError(
            f"invalid --days {spec!r}: at most START:STOP:STEP"
        )
    return slice(*ints)


def cmd_season(args):
    from optimalinterpolation_tpu.pipeline.season import SeasonConfig, run_season

    ds = _load(args)
    cfg = SeasonConfig(daily=_configs(args), outdir=args.outdir,
                       resume=not args.no_resume,
                       day_parallel=args.day_parallel)
    with _observability(args):
        run_season(ds, cfg, days=args.days, prior_fn=_prior(args, ds),
                   cell_sharding=_sharding(args),
                   precomputed_hypers=_hypers(args))


def _scan_results(indir: str, grid_res: int) -> list[tuple[str, str]]:
    """Sorted (date, path) pairs for per-day result pickles in ``indir``;
    non-conforming filenames matched by the glob are reported and skipped."""
    import glob
    import re

    out = []
    for f in sorted(
        glob.glob(os.path.join(indir, f"CS2S3_*_{grid_res}km.pkl"))
    ):
        m = re.search(r"CS2S3_(\d{8})_", os.path.basename(f))
        if not m:
            print(f"skipping non-conforming result file: {f}", file=sys.stderr)
            continue
        out.append((m.group(1), f))
    if not out:
        raise SystemExit(f"no CS2S3_YYYYMMDD_{grid_res}km.pkl in {indir}")
    return out


def _grid_axes(datapath: str, grid_res: int):
    """1-D cell-coordinate axes from the x_/y_{res}km.npy grids
    ([ix, iy] layout: x varies along axis 0, y along axis 1)."""
    x = np.load(os.path.join(datapath, f"x_{grid_res}km.npy"))[:, 0]
    y = np.load(os.path.join(datapath, f"y_{grid_res}km.npy"))[0, :]
    return x, y


def cmd_hypers(args):
    """Seasonal-average hyperparameter fields -> ``.npz`` (quicklook scheme).

    The reference's quicklook production skips per-cell optimization and
    reuses seasonal-average hyperparameters from 50 km runs regridded to the
    25 km grid (``QuickLook Data/README.txt:1``; the ``GPR3D(opt=False)``
    path, ``GPR_CS2S3.py:170-172``). This command rebuilds that workflow
    from saved per-day result pickles: average the (smoothed) hyper fields
    over the season, optionally regrid to a target resolution, and write the
    ``.npz`` that ``daily``/``season`` consume via ``--hypers``.
    """
    import warnings

    from optimalinterpolation_tpu.io.pickles import load_pickle
    from optimalinterpolation_tpu.pipeline.daily import HYPER_NAMES

    files = _scan_results(args.indir, args.grid_res)
    suffix = "" if args.raw else "_smth"
    stacks = {n: [] for n in HYPER_NAMES}
    for date, f in files:
        d = load_pickle(f)
        for n in HYPER_NAMES:
            stacks[n].append(np.asarray(d[f"{date}_{n}{suffix}"], np.float64))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN pixels
        avg = {n: np.nanmean(np.stack(s), axis=0) for n, s in stacks.items()}

    if args.target_grid_res and args.target_grid_res != args.grid_res:
        from optimalinterpolation_tpu.data.regrid import regrid_field

        src_dir = args.datapath
        dst_dir = args.target_datapath or args.datapath
        if src_dir is None:
            raise SystemExit("--datapath required for regridding (grid .npy)")
        sx, sy = _grid_axes(src_dir, args.grid_res)
        dx, dy = _grid_axes(dst_dir, args.target_grid_res)
        om = "builtin" if args.ocean_mask == "builtin" else None
        avg = {
            n: regrid_field(
                v.T, sx, sy, dx, dy, fill=not args.no_fill, ocean_mask=om
            ).T
            for n, v in avg.items()
        }

    np.savez(args.out, **avg)
    print(json.dumps({
        "out": args.out, "days": len(files),
        "finite_cells": int(np.isfinite(avg["ell_x"]).sum()),
        "shape": list(avg["ell_x"].shape),
    }))


def cmd_validate(args):
    """Skill of saved daily fields against independent point observations
    (the reference's empty ``OIB/`` validation slot, C17, made real).

    ``--points`` is an ``.npz`` with arrays ``x``, ``y`` [m, projected],
    ``date`` ('YYYYMMDD' strings) and ``value`` [m].
    """
    from optimalinterpolation_tpu.io.pickles import load_pickle
    from optimalinterpolation_tpu.validation import PointObs, validate_fields

    z = np.load(args.points, allow_pickle=False)
    obs = PointObs(x=z["x"], y=z["y"], date=z["date"].astype(str),
                   value=z["value"])
    suffix = "_smth" if args.smoothed else ""
    fields, uncertainties = {}, {}
    for date, f in _scan_results(args.indir, args.grid_res):
        d = load_pickle(f)
        fields[date] = np.asarray(d[f"{date}_interp{suffix}"])
        uncertainties[date] = np.asarray(d[f"{date}_interp_error{suffix}"])
    x_axis, y_axis = _grid_axes(args.datapath, args.grid_res)
    stats = validate_fields(obs, fields, x_axis, y_axis,
                            uncertainties=uncertainties)
    print(json.dumps({"days": len(fields), **stats.to_dict()}))


def cmd_bin(args):
    from optimalinterpolation_tpu.data.binner import run_season_binning

    fields = run_season_binning(
        args.datapath, args.outdir, args.sat, args.season, args.grid_res
    )
    print(json.dumps({"days_binned": len(fields)}))


def cmd_synth(args):
    from optimalinterpolation_tpu.data.synthetic import make_synthetic_season

    make_synthetic_season(
        args.outdir, grid_res_km=args.grid_res, n_days=args.n_days, seed=args.seed
    )
    print(json.dumps({"outdir": args.outdir, "n_days": args.n_days}))


def main(argv=None):
    ap = argparse.ArgumentParser("optimalinterpolation_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("daily", help="produce one daily interpolated field")
    _add_daily_args(p)
    p.add_argument("--day", type=int, default=0, help="window start index")
    p.add_argument("--quicklook", action="store_true",
                   help="also write the quicklook NetCDF (reference schema)")
    p.set_defaults(fn=cmd_daily)

    p = sub.add_parser("season", help="produce a season of daily fields")
    _add_daily_args(p)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--days", default=None, type=_days_spec,
                   metavar="START:STOP[:STEP]",
                   help="window start-index range (python slice semantics, "
                        "e.g. 0:30 or 0:30:3; a bare INT runs that one "
                        "window); default = every valid window")
    p.add_argument("--day-parallel", type=int, default=1, metavar="W",
                   help="process the season in strided waves of up to W "
                        "days stacked into one combined cell batch "
                        "(pipeline.multiday); 1 = one day at a time")
    p.set_defaults(fn=cmd_season)

    p = sub.add_parser(
        "cell",
        help="single-cell GP at one location (exact | nystroem | svgp)",
    )
    _add_daily_args(p)
    p.add_argument("--day", type=int, default=0, help="window start index")
    p.add_argument("--x", type=float, required=True,
                   help="projected x of the cell [m] (GP_example: 0.94e6)")
    p.add_argument("--y", type=float, required=True,
                   help="projected y of the cell [m] (GP_example: 3.5e5)")
    p.add_argument("--method", default="exact",
                   choices=["exact", "nystroem", "svgp"])
    p.add_argument("--landmarks", type=int, default=925,
                   help="Nystroem rank M (reference demo: 925)")
    p.add_argument("--num-inducing", type=int, default=50)
    p.add_argument("--svgp-iters", type=int, default=10_000)
    p.add_argument("--svgp-batch", type=int, default=100)
    p.add_argument("--seed", type=int, default=0,
                   help="landmark / minibatch sampling seed")
    p.add_argument("--figure", default=None,
                   help="path prefix: writes <prefix>_pdf.png (paper Fig. 2) "
                        "and <prefix>_footprint.png")
    p.set_defaults(fn=cmd_cell)

    p = sub.add_parser("bin", help="along-track binning (L0)")
    p.add_argument("--datapath", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--sat", required=True)
    p.add_argument("--season", default="2018-2019")
    p.add_argument("--grid-res", type=int, default=25)
    p.set_defaults(fn=cmd_bin)

    p = sub.add_parser(
        "hypers",
        help="seasonal-average hyperparameter .npz (quicklook opt=False path)",
    )
    p.add_argument("--indir", required=True,
                   help="directory of per-day CS2S3_*_{res}km.pkl results")
    p.add_argument("--grid-res", type=int, default=50)
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--raw", action="store_true",
                   help="average the raw per-cell hypers instead of smoothed")
    p.add_argument("--datapath", default=None,
                   help="directory with x_/y_{res}km.npy grids (regrid only)")
    p.add_argument("--target-grid-res", type=int, default=None,
                   help="regrid the averages to this resolution "
                        "(reference: 50 -> 25)")
    p.add_argument("--target-datapath", default=None,
                   help="grid .npy dir for the target res (default --datapath)")
    p.add_argument("--no-fill", action="store_true",
                   help="skip nearest-neighbour fill outside the footprint")
    p.add_argument("--ocean-mask", choices=("footprint", "builtin"),
                   default="footprint",
                   help="'builtin' = the committed quicklook-derived "
                        "ice-capable-ocean mask (replaces the reference's "
                        "global_land_mask; real 2018-2019 domain only); "
                        "'footprint' = the regridded field's own validity")
    p.set_defaults(fn=cmd_hypers)

    p = sub.add_parser(
        "validate",
        help="skill metrics of saved daily fields vs point observations (OIB)",
    )
    p.add_argument("--indir", required=True,
                   help="directory of per-day CS2S3_*_{res}km.pkl results")
    p.add_argument("--datapath", required=True,
                   help="directory with x_/y_{res}km.npy grids")
    p.add_argument("--grid-res", type=int, default=25)
    p.add_argument("--points", required=True,
                   help=".npz with x, y [m], date [YYYYMMDD], value [m]")
    p.add_argument("--smoothed", action="store_true",
                   help="validate the smoothed-hyper pass-2 fields")
    p.set_defaults(fn=cmd_validate)

    p = sub.add_parser("synth", help="generate a synthetic season")
    p.add_argument("--outdir", required=True)
    p.add_argument("--grid-res", type=int, default=25)
    p.add_argument("--n-days", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_synth)

    args = ap.parse_args(argv)
    _enable_compilation_cache()
    if getattr(args, "dtype", None) == "float64":
        # Without x64, jnp silently downcasts and "--dtype float64" would
        # run in f32. (Tests enable x64 in conftest; this covers real use.)
        import jax

        jax.config.update("jax_enable_x64", True)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
