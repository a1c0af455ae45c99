"""CLI surface tests (reference has no CLI: knobs are module globals,
``GPR_CS2S3.py:201-217``, and ``input()`` prompts, ``read_and_bin.py:60-64``).

Drives ``optimalinterpolation_tpu.cli.main`` in-process on a tiny synthetic
season and checks the product files users actually consume: the per-date
result pickle (15 keys) and the quicklook NetCDF (reference schema).
"""

import json

import numpy as np
import pytest

from optimalinterpolation_tpu.cli import main
from optimalinterpolation_tpu.data.synthetic import make_synthetic_season


@pytest.fixture(scope="module")
def tiny_season(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("cli_season"))
    make_synthetic_season(
        outdir, grid_res_km=250, n_days=9, seed=7, noise_std=0.03,
        tracks_per_day=(3, 1, 2, 2),
    )
    return outdir


def test_hypers_cli_quicklook_workflow(tiny_season, tmp_path, capsys):
    """The quicklook production workflow end-to-end at the CLI: optimize a
    day -> seasonal-average hyper .npz (optionally regridded) -> re-predict
    with --hypers (the reference's opt=False path)."""
    out = str(tmp_path)
    daily_args = [
        "daily", "--datapath", tiny_season, "--grid-res", "250",
        "--prior-mean", "0.15", "--max-iters", "5", "--seed-stride", "0",
        "--dtype", "float64", "--outdir", out,
    ]
    main(daily_args)
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    npz = str(tmp_path / "hypers.npz")
    main(["hypers", "--indir", out, "--grid-res", "250", "--out", npz])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["days"] == 1 and info["finite_cells"] > 0
    z = np.load(npz)
    assert set(z.files) == {"ell_x", "ell_y", "ell_t", "sf2", "sn2"}

    # opt=False re-predict from the averaged hypers
    out2 = str(tmp_path / "pass2")
    import os

    os.makedirs(out2)
    main(daily_args[:-1] + [out2, "--hypers", npz])
    info2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info2["cells"] > 0

    # regrid branch: 250 km averages onto a 500 km grid
    coarse = str(tmp_path / "coarse")
    make_synthetic_season(coarse, grid_res_km=500, n_days=9, seed=7,
                          tracks_per_day=(3, 1, 2, 2))
    npz2 = str(tmp_path / "hypers_500.npz")
    main(["hypers", "--indir", out, "--grid-res", "250", "--out", npz2,
          "--datapath", tiny_season, "--target-grid-res", "500",
          "--target-datapath", coarse])
    info3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info3["shape"] == [16, 16] and info3["finite_cells"] > 0


def test_daily_cli_prior_background(tiny_season, tmp_path, capsys):
    """--prior-background N: the spatially varying first-N-days mean prior
    (dev/sparseGP_example.ipynb cell-1) reaches the production daily path."""
    out = str(tmp_path)
    main([
        "daily", "--datapath", tiny_season, "--grid-res", "250",
        "--prior-background", "9", "--max-iters", "5", "--seed-stride", "0",
        "--dtype", "float64", "--outdir", out,
    ])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["cells"] > 0


def test_validate_cli_skill_metrics(tiny_season, tmp_path, capsys):
    """validate subcommand: perfect point obs sampled from the field itself
    must score bias 0 / rmse 0 / corr 1 / coverage 1."""
    out = str(tmp_path)
    main([
        "daily", "--datapath", tiny_season, "--grid-res", "250",
        "--prior-mean", "0.15", "--max-iters", "5", "--seed-stride", "0",
        "--dtype", "float64", "--outdir", out,
    ])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from optimalinterpolation_tpu.io.pickles import load_pickle

    date = info["date"]
    field = load_pickle(info["output"])[f"{date}_interp"]
    gx = np.load(f"{tiny_season}/x_250km.npy")[:, 0]
    gy = np.load(f"{tiny_season}/y_250km.npy")[0, :]
    ix, iy = np.nonzero(np.isfinite(field))
    pts = str(tmp_path / "points.npz")
    np.savez(pts, x=gx[ix], y=gy[iy], value=field[ix, iy],
             date=np.full(ix.shape, date, dtype="U8"))

    main(["validate", "--indir", out, "--datapath", tiny_season,
          "--grid-res", "250", "--points", pts])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n"] == ix.size and stats["coverage"] == 1.0
    assert abs(stats["bias"]) < 1e-12 and stats["rmse"] < 1e-12
    assert stats["corr"] > 0.999999
    assert stats["mean_z"] < 1e-9


def _run_cell(tiny_season, capsys, *extra):
    main([
        "cell", "--datapath", tiny_season, "--grid-res", "250",
        "--prior-mean", "0.15", "--x", "4e6", "--y", "4e6",
        "--radius-km", "700", "--max-iters", "8", "--dtype", "float64",
        *extra,
    ])
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cell_cli_methods_agree(tiny_season, tmp_path, capsys):
    """The GP_example workflow: exact vs Nystroem vs SVGP on one cell
    (reference cross-method check, sparseGP_example cell-3 vs cell-5)."""
    fig = str(tmp_path / "cell")
    exact = _run_cell(tiny_season, capsys, "--figure", fig)
    assert exact["n_points"] > 10
    assert set(exact["hypers"]) == {"ell_x", "ell_y", "ell_t", "sf2", "sn2"}
    assert np.isfinite(exact["lZ"])
    import os

    assert all(os.path.exists(f) for f in exact["figures"])

    nyst = _run_cell(tiny_season, capsys, "--method", "nystroem",
                     "--landmarks", "64")
    # rank-32 approximation of an n<~2k problem: same prediction to ~cm
    assert abs(nyst["mean"] - exact["mean"]) < 0.05
    assert nyst["std"] > 0

    svgp = _run_cell(tiny_season, capsys, "--method", "svgp",
                     "--svgp-iters", "100", "--num-inducing", "16")
    assert np.isfinite(svgp["elbo"])
    assert np.isfinite(svgp["mean"]) and svgp["std"] > 0


def test_cell_cli_rejects_empty_neighborhood(tiny_season, capsys):
    with pytest.raises(SystemExit, match="no observations"):
        main([
            "cell", "--datapath", tiny_season, "--grid-res", "250",
            "--prior-mean", "0.15", "--x", "9e9", "--y", "9e9",
            "--radius-km", "100", "--dtype", "float64",
        ])


def test_daily_cli_writes_pickle_and_quicklook(tiny_season, tmp_path, capsys):
    out = str(tmp_path)
    main([
        "daily", "--datapath", tiny_season, "--grid-res", "250",
        "--prior-mean", "0.15", "--max-iters", "5", "--seed-stride", "0",
        "--dtype", "float64", "--outdir", out, "--quicklook",
    ])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["cells"] > 0

    from optimalinterpolation_tpu.io.pickles import load_pickle

    d = load_pickle(info["output"])
    assert len(d) == 15  # reference result-dict keys per date
    date = info["date"]
    assert f"{date}_interp_smth" in d and f"{date}_ell_x" in d

    from optimalinterpolation_tpu.io.quicklook import read_quicklook

    ql = read_quicklook(info["quicklook"])
    assert ql.date == date
    assert ql.radar_freeboard.shape == ql.lat.shape
    # [iy, ix] orientation: quicklook grids transpose the internal [ix, iy]
    np.testing.assert_allclose(
        ql.radar_freeboard.T, d[f"{date}_interp_smth"], equal_nan=True
    )
    assert np.isfinite(ql.uncertainty).sum() == info["cells"]


def test_days_spec_parsing():
    """--days: bare INT = that one window; colon forms = python slice
    semantics incl. step; junk = argparse error, not a traceback."""
    import argparse

    import pytest

    from optimalinterpolation_tpu.cli import _days_spec

    windows = range(20)
    assert list(windows[_days_spec("5")]) == [5]
    assert list(windows[_days_spec("-1")]) == [19]
    assert list(windows[_days_spec("2:6")]) == [2, 3, 4, 5]
    assert list(windows[_days_spec("17:")]) == [17, 18, 19]
    assert list(windows[_days_spec(":3")]) == [0, 1, 2]
    assert list(windows[_days_spec("0:10:3")]) == [0, 3, 6, 9]
    with pytest.raises(argparse.ArgumentTypeError):
        _days_spec("1:3:2:9")
    with pytest.raises(argparse.ArgumentTypeError):
        _days_spec("abc")


def test_run_season_resolves_slice_days():
    """run_season owns the valid-window range: a slice selects from
    ds.n_days - T + 1 windows (the CLI passes the slice through)."""
    from optimalinterpolation_tpu.pipeline.season import run_season

    seen = []

    class _DS:
        n_days = 12
        grid_res_km = 250
        dates = [f"d{i}" for i in range(12)]

    import optimalinterpolation_tpu.pipeline.season as S
    from optimalinterpolation_tpu.pipeline.daily import DailyConfig

    cfg = S.SeasonConfig(
        daily=DailyConfig(window_days=9),
        outdir="/tmp/oi_days_slice_test",
        write_pickles=False,
        write_quicklook=False,
    )

    class _Stop(Exception):
        pass

    def boom(day):
        # prior_fn is the first per-day call: record which window the slice
        # resolved to, then abort before any GP work runs.
        seen.append(day)
        raise _Stop()

    # 12 days, T=9 -> valid windows are range(4)
    for spec, first in ((slice(1, 3), 1), (slice(3, None), 3),
                        (slice(None, None, 2), 0), (None, 0)):
        seen.clear()
        try:
            run_season(_DS(), cfg, days=spec, prior_fn=boom, log=lambda s: None)
        except _Stop:
            pass
        assert seen == [first]
