"""Command-line interface.

The reference has no config system: production knobs are hardcoded module
globals (``GPR_CS2S3.py:201-217``) and the binner asks via ``input()``
(``read_and_bin.py:60-64``). This CLI turns those into real subcommands:

  python -m optimalinterpolation_tpu daily     one daily field
  python -m optimalinterpolation_tpu season    a whole season
  python -m optimalinterpolation_tpu bin       along-track binning (C1)
  python -m optimalinterpolation_tpu synth     synthetic season generator
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
    p.add_argument("--seed-stride", type=int, default=3,
                   help="spatial seeding: cold-optimize every Nth grid cell, "
                        "warm-start the rest from the nearest seed; 0 disables")
    p.add_argument("--optimizer", default="lbfgs", choices=["lbfgs", "adam"])
    p.add_argument("--dtype", default="float32")
    p.add_argument("--jitter", type=float, default=1e-6)
    p.add_argument("--prior-mean", type=float, default=None,
                   help="constant prior mean; otherwise --fyi is used")
    p.add_argument("--fyi", default=None, help="CS2 FYI .npy for the prior")
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


def _load(args):
    from optimalinterpolation_tpu.data.reader import read_freeboard_season

    return read_freeboard_season(args.datapath, args.grid_res, args.season)


def _configs(args):
    from optimalinterpolation_tpu.models.optimizer import OptimizeConfig
    from optimalinterpolation_tpu.ops.kernels import Kernel
    from optimalinterpolation_tpu.pipeline.daily import DailyConfig

    return DailyConfig(
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


def _sharding(args):
    if args.devices is None:
        return None
    from optimalinterpolation_tpu.parallel.mesh import cell_sharding, make_mesh

    return cell_sharding(make_mesh(args.devices))


def _prior(args, ds):
    if args.prior_mean is not None:
        return lambda day: args.prior_mean
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


def cmd_daily(args):
    from optimalinterpolation_tpu.io.pickles import save_pickle
    from optimalinterpolation_tpu.pipeline.daily import interpolate_daily

    ds = _load(args)
    prior = _prior(args, ds)(args.day)
    res = interpolate_daily(ds, args.day, prior, _configs(args), _sharding(args),
                            precomputed_hypers=_hypers(args))
    import os

    out = os.path.join(args.outdir, f"CS2S3_{res.date}_{ds.grid_res_km}km.pkl")
    save_pickle(res.to_reference_dict(), out)
    outputs = {"date": res.date, "output": out,
               "cells": int(np.isfinite(res.interp).sum())}
    if args.quicklook:
        # Same product the season pipeline writes (reference schema,
        # [iy, ix] orientation — see pipeline.season.run_season).
        from optimalinterpolation_tpu.data.projection import PolarStereo
        from optimalinterpolation_tpu.io.quicklook import (
            QuicklookField,
            write_quicklook,
        )

        lon, lat = PolarStereo.from_boundinglat(60.0, 0.0).inverse(ds.x, ds.y)
        ql = os.path.join(
            args.outdir, f"CS2S3_{res.date}_{ds.grid_res_km}km_quicklook.nc"
        )
        write_quicklook(
            QuicklookField(
                date=res.date, lat=lat.T, lon=lon.T,
                radar_freeboard=res.interp_smth.T,
                uncertainty=res.interp_error_smth.T,
            ),
            ql,
        )
        outputs["quicklook"] = ql
    print(json.dumps(outputs))


def cmd_season(args):
    from optimalinterpolation_tpu.pipeline.season import SeasonConfig, run_season

    ds = _load(args)
    cfg = SeasonConfig(daily=_configs(args), outdir=args.outdir,
                       resume=not args.no_resume)
    run_season(ds, cfg, prior_fn=_prior(args, ds), cell_sharding=_sharding(args),
               precomputed_hypers=_hypers(args))


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
    p.set_defaults(fn=cmd_season)

    p = sub.add_parser("bin", help="along-track binning (L0)")
    p.add_argument("--datapath", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--sat", required=True)
    p.add_argument("--season", default="2018-2019")
    p.add_argument("--grid-res", type=int, default=25)
    p.set_defaults(fn=cmd_bin)

    p = sub.add_parser("synth", help="generate a synthetic season")
    p.add_argument("--outdir", required=True)
    p.add_argument("--grid-res", type=int, default=25)
    p.add_argument("--n-days", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_synth)

    args = ap.parse_args(argv)
    _enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
