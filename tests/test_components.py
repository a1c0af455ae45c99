"""Regridder (C2), validation (C17), and figure (C16) components."""

import numpy as np

from optimalinterpolation_tpu.data.regrid import bilinear_regrid, nearest_fill, regrid_field
from optimalinterpolation_tpu.validation import PointObs, validate_fields
from optimalinterpolation_tpu.utils import StageTimer


def test_bilinear_regrid_exact_on_linear_field():
    sx = np.linspace(0, 100, 21)
    sy = np.linspace(0, 80, 17)
    gx, gy = np.meshgrid(sx, sy)
    src = 2.0 * gx + 3.0 * gy + 1.0  # bilinear kernel reproduces linear exactly
    dx = np.linspace(5, 95, 37)
    dy = np.linspace(4, 76, 29)
    out = bilinear_regrid(src, sx, sy, dx, dy)
    ex, ey = np.meshgrid(dx, dy)
    np.testing.assert_allclose(out, 2.0 * ex + 3.0 * ey + 1.0, rtol=1e-12)


def test_regrid_nan_handling_and_fill():
    sx = np.linspace(0, 10, 11)
    sy = np.linspace(0, 10, 11)
    src = np.ones((11, 11))
    src[4:7, 4:7] = np.nan
    out = bilinear_regrid(src, sx, sy, sx, sy)
    # partial-NaN neighborhoods renormalize; the all-NaN interior stays NaN
    assert np.isnan(out[5, 5])
    filled = nearest_fill(out, sx, sy)
    assert np.isfinite(filled).all() and np.allclose(filled, 1.0)

    full = regrid_field(src, sx, sy, sx, sy, fill=True)
    assert np.isfinite(full).all()


def test_validation_stats():
    g = np.linspace(0, 90, 10)
    field = np.add.outer(g, g) / 100.0  # f(x, y) = (x + y)/100
    rng = np.random.default_rng(0)
    xs = rng.uniform(0, 90, 50)
    ys = rng.uniform(0, 90, 50)
    ix = np.round(xs / 10).astype(int)
    iy = np.round(ys / 10).astype(int)
    truth = field[ix, iy] + rng.normal(0, 0.01, 50)
    obs = PointObs(x=xs, y=ys, date=np.array(["20190101"] * 50), value=truth)
    unc = {"20190101": np.full_like(field, 0.01)}
    stats = validate_fields(obs, {"20190101": field}, g, g, uncertainties=unc)
    assert stats.n == 50
    assert abs(stats.bias) < 0.01
    assert stats.rmse < 0.02
    assert stats.corr > 0.95
    assert stats.coverage == 1.0
    assert 0.2 < stats.mean_z < 3.0


def test_figures_render(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from optimalinterpolation_tpu import viz

    viz.plot_prior_posterior(0.15, 0.1, 0.3, 0.03, path=str(tmp_path / "pdf.png"))
    g = np.linspace(0, 8e6, 32)
    gx, gy = np.meshgrid(g, g, indexing="ij")
    field = np.hypot(gx - 4e6, gy - 4e6) / 1e7
    viz.plot_daily_field(field, gx, gy, path=str(tmp_path / "map.png"))
    rng = np.random.default_rng(0)
    xy = rng.uniform(-3e5, 3e5, (200, 2))
    viz.plot_training_footprint(
        xy + 4e6, rng.normal(0.15, 0.05, 200), (4e6, 4e6),
        inducing_xy=rng.uniform(-2e5, 2e5, (20, 2)) + 4e6,
        path=str(tmp_path / "footprint.png"),
    )
    viz.plot_hyperparameter_maps(
        {"ell_x": field, "sf2": field * 0.1}, gx, gy, path=str(tmp_path / "hyp.png")
    )
    for f in ("pdf.png", "map.png", "footprint.png", "hyp.png"):
        assert (tmp_path / f).stat().st_size > 1000


def test_stage_timer():
    t = StageTimer()
    with t.stage("work", items=100):
        sum(range(10000))
    s = t.summary()
    assert s["work"]["items"] == 100 and s["work"]["seconds"] >= 0


def test_builtin_ocean_mask_loads_and_regrids():
    """The committed quicklook-derived ocean mask (reference C2's
    global_land_mask replacement, regrid_xesmf.py:14): native load,
    nearest resample to another grid, and the regrid_field wiring."""
    from optimalinterpolation_tpu.data.regrid import load_ocean_mask

    mask, x, y = load_ocean_mask()
    assert mask.shape == (320, 320) and mask.dtype == bool
    assert mask[157:163, 157:163].all()  # pole is ice-capable ocean
    assert not mask[0, 0] and not mask[-1, -1]  # domain corners are not
    assert 0.1 < mask.mean() < 0.3

    # resample to a coarser grid: agrees with direct subsampling at centres
    cx = x[2::4]
    cy = y[2::4]
    m2, _, _ = load_ocean_mask(cx, cy)
    np.testing.assert_array_equal(m2, mask[2::4][:, 2::4])

    # regrid_field(ocean_mask="builtin") masks land, keeps central ocean
    src = np.ones((320, 320))
    out = regrid_field(src, x, y, x, y, ocean_mask="builtin")
    assert np.isnan(out[0, 0]) and out[160, 160] == 1.0
