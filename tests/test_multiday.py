"""Wave-parallel multi-day pipeline (pipeline.multiday + season waves).

The reference parallelizes days one-per-mpirun-job (GPR_CS2S3.py:336); the
rebuild stacks a wave of days into one combined cell batch. Per-cell
trajectories are independent of batch composition (every optimizer update is
a row-wise select), so a wave must reproduce the serial per-day results —
these tests pin that on the 8-virtual-device CPU backend in float64, plus the
(days, cells)-mesh sharding and the strided-wave season scheduler.
"""

import numpy as np
import pytest

from optimalinterpolation_tpu.data.reader import read_freeboard_season
from optimalinterpolation_tpu.data.synthetic import make_synthetic_season
from optimalinterpolation_tpu.models.optimizer import OptimizeConfig
from optimalinterpolation_tpu.pipeline.daily import DailyConfig, interpolate_daily
from optimalinterpolation_tpu.pipeline.multiday import interpolate_days


@pytest.fixture(scope="module")
def wave_season(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("wave_season"))
    # 12 days -> 4 valid 9-day windows; thin the active set hard (the CPU
    # oracle backend optimizes every cell of every day in f64).
    truth, dates = make_synthetic_season(
        outdir, grid_res_km=125, n_days=12, seed=5, noise_std=0.03,
        tracks_per_day=(5, 2, 4, 4),
    )
    ds = read_freeboard_season(outdir, 125, "2018-2019")
    sie = ds.sie.copy()
    keep = np.zeros(sie.shape[:2], bool)
    keep[::4, ::4] = True
    ij = np.nonzero(~keep)
    sie[ij[0], ij[1], :] = np.nan
    ds.sie = sie
    return ds, truth, dates


# Batch-composition-independent config: no valid-point shuffling (cascade /
# Nystrom off) so combined and per-day buckets run identical per-row math.
_CFG = DailyConfig(
    window_days=9,
    radius_km=450.0,
    opt=OptimizeConfig(max_iters=10, nystroem_min_n=0),
    buckets=(128, 256),
    dtype="float64",
    warmstart_n=0,
    spatial_seed_stride=0,
)


def test_wave_matches_serial_days(wave_season):
    ds, truth, dates = wave_season
    days = [0, 1, 2]
    serial = [
        interpolate_daily(ds, day=d, prior_mean=0.15, config=_CFG)
        for d in days
    ]
    stats = []
    wave = interpolate_days(
        ds, days, [0.15] * len(days), config=_CFG, stats=stats
    )
    assert [r.date for r in wave] == [r.date for r in serial]
    for w, s in zip(wave, serial):
        np.testing.assert_allclose(
            w.interp, s.interp, rtol=1e-8, atol=1e-10, equal_nan=True
        )
        np.testing.assert_allclose(
            w.interp_smth, s.interp_smth, rtol=1e-8, atol=1e-10,
            equal_nan=True,
        )
        np.testing.assert_allclose(
            w.interp_error_smth, s.interp_error_smth, rtol=1e-8, atol=1e-10,
            equal_nan=True,
        )
        for name in w.hypers:
            np.testing.assert_allclose(
                w.hypers[name], s.hypers[name], rtol=1e-7, equal_nan=True
            )
    # economics entries cover all stages of the stacked run
    stages = {e["stage"] for e in stats}
    assert {"opt", "predict", "smooth", "pass2"} <= stages


def test_wave_prior_fields_match_scalars(wave_season):
    """Wave per-day priors may mix scalars and (G, G) spatially varying
    fields (dev/sparseGP_example.ipynb cell-1 background prior); constant
    fields must reproduce the all-scalar wave exactly."""
    ds, truth, dates = wave_season
    days = [0, 2]
    base = interpolate_days(ds, days, [0.15, 0.18], config=_CFG)
    fields = [np.full(ds.sie.shape[:2], 0.15), 0.18]
    got = interpolate_days(ds, days, fields, config=_CFG)
    for b, g in zip(base, got):
        np.testing.assert_allclose(
            g.interp_smth, b.interp_smth, rtol=0, atol=0, equal_nan=True
        )
        np.testing.assert_allclose(
            g.interp, b.interp, rtol=0, atol=0, equal_nan=True
        )


def test_wave_day_cell_mesh_sharding_matches_unsharded(wave_season):
    """The combined cells axis sharded over BOTH axes of a (days, cells)
    mesh (the season-scale production layout) must not change results."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from optimalinterpolation_tpu.parallel.mesh import day_cell_mesh

    ds, truth, dates = wave_season
    days = [0, 2]
    base = interpolate_days(ds, days, [0.15, 0.15], config=_CFG)
    mesh = day_cell_mesh((2, 4))
    shard = NamedSharding(mesh, P(("days", "cells")))
    sharded = interpolate_days(
        ds, days, [0.15, 0.15], config=_CFG, cell_sharding=shard
    )
    for b, s in zip(base, sharded):
        np.testing.assert_allclose(
            s.interp_smth, b.interp_smth, rtol=1e-6, atol=1e-8, equal_nan=True
        )


def test_wave_seeding_and_cascade_run(wave_season):
    """Defaults path (spatial seeding + cascade) through the wave pipeline:
    not bit-comparable to serial (shuffling differs by batch composition),
    but must produce finite, truth-tracking fields."""
    ds, truth, dates = wave_season
    cfg = DailyConfig(
        window_days=9, radius_km=450.0,
        opt=OptimizeConfig(max_iters=10, nystroem_min_n=0),
        buckets=(128, 256), dtype="float64",
        warmstart_n=64, spatial_seed_stride=3, seed_opt_n=64,
    )
    res = interpolate_days(ds, [0, 1], [0.15, 0.15], config=cfg)
    for day, r in zip((0, 1), res):
        active = np.isfinite(ds.sie[:, :, day + 4])
        got = np.isfinite(r.interp_smth[active])
        assert got.mean() > 0.9
        err = r.interp_smth[active] - truth[day + 4][active]
        assert np.sqrt(np.nanmean(err**2)) < 0.06


def test_run_season_waves_matches_serial(wave_season, tmp_path):
    """run_season(day_parallel=2) must write the same per-day results as the
    serial loop (chaining off => day results are batch-independent)."""
    from optimalinterpolation_tpu.pipeline.season import SeasonConfig, run_season

    ds, truth, dates = wave_season
    scfg = dict(
        daily=_CFG, write_quicklook=False, chain_warmstart=False,
    )
    serial = run_season(
        ds, SeasonConfig(outdir=str(tmp_path / "serial"), **scfg),
        days=[0, 1, 2, 3], prior_fn=lambda d: 0.15, log=lambda s: None,
    )
    waved = run_season(
        ds,
        SeasonConfig(outdir=str(tmp_path / "waved"), day_parallel=2, **scfg),
        days=[0, 1, 2, 3], prior_fn=lambda d: 0.15, log=lambda s: None,
    )
    assert [r.date for r in waved] == [r.date for r in serial]
    for w, s in zip(waved, serial):
        np.testing.assert_allclose(
            w.interp_smth, s.interp_smth, rtol=1e-8, atol=1e-10,
            equal_nan=True,
        )
    import os

    assert sorted(os.listdir(tmp_path / "waved")) == sorted(
        os.listdir(tmp_path / "serial")
    )


def test_wave_precomputed_hypers_matches_serial_quicklook(wave_season):
    """Waves + precomputed_hypers (the quicklook reuse path,
    GPR_CS2S3.py:170-172): a pass-2-only wave batch must reproduce the
    serial per-day quicklook predictions."""
    ds, truth, dates = wave_season
    g = ds.sie.shape[0]
    pre = {
        "ell_x": np.full((g, g), 300e3), "ell_y": np.full((g, g), 300e3),
        "ell_t": np.full((g, g), 2.0), "sf2": np.full((g, g), 0.05),
        "sn2": np.full((g, g), 0.01),
    }
    days = [0, 2]
    serial = [
        interpolate_daily(
            ds, day=d, prior_mean=0.15, config=_CFG, precomputed_hypers=pre
        )
        for d in days
    ]
    wave = interpolate_days(
        ds, days, [0.15] * len(days), config=_CFG, precomputed_hypers=pre
    )
    assert [r.date for r in wave] == [r.date for r in serial]
    for w, s in zip(wave, serial):
        np.testing.assert_allclose(
            w.interp_smth, s.interp_smth, rtol=1e-8, atol=1e-10,
            equal_nan=True,
        )
        np.testing.assert_allclose(
            w.interp_error_smth, s.interp_error_smth, rtol=1e-8, atol=1e-10,
            equal_nan=True,
        )
        np.testing.assert_allclose(
            w.lZ, s.lZ, rtol=1e-8, atol=1e-10, equal_nan=True
        )
        # quicklook semantics: unsmoothed outputs mirror the predictions
        np.testing.assert_allclose(
            w.interp, w.interp_smth, rtol=0, atol=0, equal_nan=True
        )
        for name in w.hypers:
            np.testing.assert_allclose(w.hypers[name], pre[name])


def test_run_season_waves_with_precomputed_hypers(wave_season, tmp_path):
    """run_season(day_parallel=2, precomputed_hypers=...) must no longer
    fall back to the serial loop and must match its results (VERDICT r2 #7)."""
    from optimalinterpolation_tpu.pipeline.season import SeasonConfig, run_season

    ds, truth, dates = wave_season
    g = ds.sie.shape[0]
    pre = {
        "ell_x": np.full((g, g), 300e3), "ell_y": np.full((g, g), 300e3),
        "ell_t": np.full((g, g), 2.0), "sf2": np.full((g, g), 0.05),
        "sn2": np.full((g, g), 0.01),
    }
    scfg = dict(daily=_CFG, write_quicklook=False, chain_warmstart=False)
    serial = run_season(
        ds, SeasonConfig(outdir=str(tmp_path / "serial"), **scfg),
        days=[0, 1, 2], prior_fn=lambda d: 0.15,
        precomputed_hypers=pre, log=lambda s: None,
    )
    waved = run_season(
        ds,
        SeasonConfig(outdir=str(tmp_path / "waved"), day_parallel=2, **scfg),
        days=[0, 1, 2], prior_fn=lambda d: 0.15,
        precomputed_hypers=pre, log=lambda s: None,
    )
    assert [r.date for r in waved] == [r.date for r in serial]
    for w, s in zip(waved, serial):
        np.testing.assert_allclose(
            w.interp_smth, s.interp_smth, rtol=1e-8, atol=1e-10,
            equal_nan=True,
        )


def test_run_season_waves_chain_and_resume(wave_season, tmp_path):
    """Strided waves chain day p from day p-1 across waves, and resumed
    (already-written) days still feed the chain."""
    from optimalinterpolation_tpu.pipeline.season import SeasonConfig, run_season

    ds, truth, dates = wave_season
    out = str(tmp_path / "chained")
    cfg = SeasonConfig(
        daily=_CFG, outdir=out, write_quicklook=False, day_parallel=2,
    )
    first = run_season(
        ds, cfg, days=[0, 1, 2, 3], prior_fn=lambda d: 0.15,
        log=lambda s: None,
    )
    assert len(first) == 4
    # all four pickles written; re-run resumes (computes nothing new)
    second = run_season(
        ds, cfg, days=[0, 1, 2, 3], prior_fn=lambda d: 0.15,
        log=lambda s: None,
    )
    assert second == []
