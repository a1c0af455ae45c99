"""Data-plane components: binner (C1), prior models (C9), season runner."""

import os

import numpy as np
import pytest

from optimalinterpolation_tpu.data.binner import (
    bin_points,
    read_and_bin_day,
    read_proc_file,
)
from optimalinterpolation_tpu.data.prior import background_prior, constant_fyi_prior
from optimalinterpolation_tpu.data.projection import PolarStereo


def test_bin_points_matches_binned_statistic(rng):
    from scipy.stats import binned_statistic_2d

    x = rng.uniform(0, 8e6, 5000)
    y = rng.uniform(0, 8e6, 5000)
    v = rng.normal(0.1, 0.05, 5000)
    got = bin_points(x, y, v, grid_res_km=500)  # 16x16 grid
    n = 16
    ref = binned_statistic_2d(
        x, y, v, statistic="mean", bins=n, range=[[0, 8e6], [0, 8e6]]
    ).statistic
    np.testing.assert_allclose(got, ref, rtol=1e-12, equal_nan=True)


def test_proc_flow(tmp_path, rng):
    """.proc parse -> validity filter -> project -> bin (read_and_bin.py flow)."""
    proj = PolarStereo.from_boundinglat(60.0, 0.0)
    n = 400
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(65, 88, n)
    fb = rng.uniform(-0.5, 0.8, n)  # some outside [-0.37, 0.63]
    flag = rng.choice([1, 2], n)
    cols = np.zeros((n, 8))
    cols[:, 0] = lon
    cols[:, 1] = lat
    cols[:, 4] = fb
    cols[:, 7] = flag
    p = tmp_path / "a_20190101_v1.proc"
    np.savetxt(p, cols, fmt="%.8g")

    lo, la, f = read_proc_file(str(p))
    keep = (flag == 2) & (fb >= -0.37) & (fb <= 0.63)
    assert len(f) == keep.sum()
    np.testing.assert_allclose(np.sort(f), np.sort(fb[keep]), rtol=1e-6)

    field = read_and_bin_day([str(p)], grid_res_km=200, proj=proj)
    assert field.shape == (40, 40)
    assert np.isfinite(field).sum() > 0
    finite_vals = field[np.isfinite(field)]
    assert finite_vals.min() >= -0.37 and finite_vals.max() <= 0.63


def test_priors():
    g = 8
    fyi = np.full((g, g, 30), np.nan)
    fyi[:, :, 16:25] = 0.2
    assert constant_fyi_prior(fyi, day=0) == 0.2
    with pytest.raises(ValueError):
        constant_fyi_prior(fyi[:, :, :10], day=0)  # empty slice guarded

    obs = np.full((g, g, 2, 40), np.nan)
    obs[:4, :, 0, :31] = 0.1
    lat = np.full((g, g), 80.0)
    lat[6:, :] = 88.0  # pole hole rows
    bg = background_prior(obs, lat)
    np.testing.assert_allclose(bg[:4], 0.1)
    # unobserved non-pole rows stay NaN; pole hole rows... row 6-7 lat>87
    assert np.isnan(bg[4:6]).all()
    # pole hole filled only if some pole cells observed — none here -> NaN
    # (fill requires valid pole-cap cells)


def test_season_runner_resume_and_quicklook(tmp_path):
    from optimalinterpolation_tpu.data.reader import read_freeboard_season
    from optimalinterpolation_tpu.data.synthetic import make_synthetic_season
    from optimalinterpolation_tpu.io.pickles import load_pickle
    from optimalinterpolation_tpu.io.quicklook import read_quicklook
    from optimalinterpolation_tpu.models.optimizer import OptimizeConfig
    from optimalinterpolation_tpu.pipeline.daily import DailyConfig
    from optimalinterpolation_tpu.pipeline.season import SeasonConfig, run_season

    outdir = str(tmp_path / "data")
    make_synthetic_season(
        outdir, grid_res_km=250, n_days=9, seed=5, noise_std=0.03,
        tracks_per_day=(4, 2, 3, 3),
    )
    ds = read_freeboard_season(outdir, 250, "2018-2019")
    resdir = str(tmp_path / "out")
    cfg = SeasonConfig(
        daily=DailyConfig(
            window_days=9, radius_km=900.0,
            opt=OptimizeConfig(max_iters=6), buckets=(128, 256),
            dtype="float64",
        ),
        outdir=resdir,
    )
    logs = []
    results = run_season(ds, cfg, prior_fn=lambda d: 0.15, log=logs.append)
    assert len(results) == 1  # 9 days, T=9 -> one window
    date = results[0].date
    pkl = load_pickle(os.path.join(resdir, f"CS2S3_{date}_250km.pkl"))
    assert f"{date}_interp_smth" in pkl
    q = read_quicklook(os.path.join(resdir, f"CS2S3_{date}_250km_quicklook.nc"))
    assert q.radar_freeboard.shape == ds.grid_shape
    # written in reference orientation: transposed vs the internal field
    np.testing.assert_array_equal(
        q.radar_freeboard, results[0].interp_smth.T
    )

    # resume: second run skips the existing day
    logs2 = []
    results2 = run_season(ds, cfg, prior_fn=lambda d: 0.15, log=logs2.append)
    assert results2 == [] and any("skipping" in s for s in logs2)


def test_run_season_binning(tmp_path, rng):
    """Full C1 season flow: month-dir tree of .proc files -> season pickle +
    coordinate .npy files (read_and_bin.py layout)."""
    from optimalinterpolation_tpu.data.binner import run_season_binning
    from optimalinterpolation_tpu.io.pickles import load_pickle

    datadir = tmp_path / "raw"
    month = "201812"
    (datadir / month).mkdir(parents=True)
    proj_rows = []
    for day in (1, 2):
        n = 60
        cols = np.zeros((n, 8))
        cols[:, 0] = rng.uniform(-180, 180, n)
        cols[:, 1] = rng.uniform(66, 86, n)
        cols[:, 4] = rng.uniform(0.0, 0.3, n)
        cols[:, 7] = 2
        np.savetxt(datadir / month / f"CS2_{month}{day:02d}_v1.proc", cols, fmt="%.8g")
    out = tmp_path / "binned"
    fields = run_season_binning(str(datadir), str(out), "CS2_SAR", "2018-2019", 200)
    assert set(fields) == {"20181201", "20181202"}
    pkl = load_pickle(str(out / "CS2_SAR_dailyFB_200km_2018-2019_season.pkl"))
    assert set(pkl) == set(fields)
    gx = np.load(out / "x_200km.npy")
    assert gx.shape == (40, 40) and gx.max() < 8e6
