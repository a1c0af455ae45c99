"""End-to-end daily pipeline on a small synthetic season.

The reference's verification is visual + cross-method (SURVEY.md section 4);
here the synthetic truth gives a quantitative surface: interpolated fields
must track the truth within a few cm RMSE over observed regions, and the
output dict must carry the reference's full key schema."""

import numpy as np
import pytest

from optimalinterpolation_tpu.data.neighbors import gather_neighborhoods
from optimalinterpolation_tpu.data.reader import read_freeboard_season
from optimalinterpolation_tpu.data.synthetic import make_synthetic_season
from optimalinterpolation_tpu.models.optimizer import OptimizeConfig
from optimalinterpolation_tpu.pipeline.daily import DailyConfig, interpolate_daily


@pytest.fixture(scope="module")
def small_season(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("season"))
    # 64x64 grid at 125 km keeps the test fast; 9-day window still applies.
    # Sparse tracks keep neighborhoods small: the per-cell GP is O(n^3) and
    # this fixture feeds a full two-pass optimize of every active cell on a
    # CPU oracle backend in float64.
    truth, dates = make_synthetic_season(
        outdir, grid_res_km=125, n_days=9, seed=3, noise_std=0.03,
        tracks_per_day=(5, 2, 4, 4),
    )
    ds = read_freeboard_season(outdir, 125, "2018-2019")
    # Thin the active-cell set: optimize every 7th ice cell instead of all
    # ~2k (the per-cell problems are independent; coverage of the bucketing
    # logic does not need every cell).
    sie = ds.sie.copy()
    keep = np.zeros(sie.shape[:2], bool)
    keep[::3, ::3] = True
    ij = np.nonzero(~keep)
    sie[ij[0], ij[1], :] = np.nan
    ds.sie = sie
    return ds, truth, dates


def test_pipeline_end_to_end(small_season):
    ds, truth, dates = small_season
    cfg = DailyConfig(
        window_days=9,
        radius_km=450.0,  # scaled for the coarse grid
        opt=OptimizeConfig(max_iters=15),
        buckets=(128, 256, 512),
        dtype="float64",
    )
    res = interpolate_daily(ds, day=0, prior_mean=0.15, config=cfg)

    assert res.date == dates[4]
    d = res.to_reference_dict()
    suffixes = (
        "interp interp_error lZ ell_x ell_y ell_t sf2 sn2 "
        "ell_x_smth ell_y_smth ell_t_smth sf2_smth sn2_smth "
        "interp_smth interp_error_smth"
    ).split()
    assert set(d) == {f"{res.date}_{s}" for s in suffixes}

    sie = ds.sie[:, :, 4]
    active = np.isfinite(sie)
    n_active = active.sum()
    assert n_active > 50

    for field_name in ("interp", "interp_smth"):
        field = d[f"{res.date}_{field_name}"]
        got = np.isfinite(field[active])
        # Nearly all active cells interpolated (cells with zero neighbors or
        # a failed Cholesky are NaN, like the reference's LinAlgError path);
        # the sparse-track fixture leaves up to ~10% with no neighbors.
        assert got.mean() > 0.9, f"{field_name}: only {got.mean():.1%} finite"
        err = field[active] - truth[4][active]
        rmse = np.sqrt(np.nanmean(err**2))
        assert rmse < 0.06, f"{field_name}: RMSE {rmse:.3f} m vs truth"

    # uncertainties positive and bounded by the prior std
    for err_name in ("interp_error", "interp_error_smth"):
        e = d[f"{res.date}_{err_name}"][active]
        e = e[np.isfinite(e)]
        assert (e >= 0).all() and (e < 1.0).all()


def test_pipeline_sharded_matches_unsharded(small_season):
    """The mesh-sharded cells axis must not change results (virtual 8-dev CPU)."""
    import jax

    from optimalinterpolation_tpu.parallel.mesh import cell_sharding, make_mesh

    ds, truth, dates = small_season
    cfg = DailyConfig(
        window_days=9,
        radius_km=450.0,
        opt=OptimizeConfig(max_iters=8),
        buckets=(128, 512),
        batch_multiple=8,
        dtype="float64",
    )
    base = interpolate_daily(ds, day=0, prior_mean=0.15, config=cfg)
    mesh = make_mesh()
    assert mesh.size == 8, "conftest should provide 8 virtual CPU devices"
    sharded = interpolate_daily(
        ds, day=0, prior_mean=0.15, config=cfg, cell_sharding=cell_sharding(mesh)
    )
    np.testing.assert_allclose(
        sharded.interp_smth, base.interp_smth, rtol=1e-6, atol=1e-8, equal_nan=True
    )


def test_spatially_varying_prior_field(small_season):
    """C9's dev-notebook background prior (dev/sparseGP_example.ipynb cell-1
    ``background``/``priorXS``): interpolate_daily accepts a (G, G) prior
    field. A constant field (with NaN holes falling back to the field mean)
    must reproduce the scalar-prior run exactly; a varying field must reach
    the predictions; malformed fields fail loudly."""
    ds, truth, dates = small_season
    cfg = DailyConfig(
        window_days=9, radius_km=450.0, opt=OptimizeConfig(max_iters=8),
        buckets=(128, 512), dtype="float64", spatial_seed_stride=0,
    )
    base = interpolate_daily(ds, day=0, prior_mean=0.15, config=cfg)
    shape = ds.sie.shape[:2]
    const = np.full(shape, 0.15)
    const[0, 0] = np.nan  # never-observed ocean -> falls back to field mean
    res_const = interpolate_daily(ds, day=0, prior_mean=const, config=cfg)
    np.testing.assert_allclose(
        res_const.interp_smth, base.interp_smth, rtol=0, atol=0,
        equal_nan=True,
    )
    ramp = np.full(shape, 0.15)
    ramp[:, shape[1] // 2 :] = 0.45
    res_ramp = interpolate_daily(ds, day=0, prior_mean=ramp, config=cfg)
    assert (
        np.isfinite(res_ramp.interp_smth) == np.isfinite(base.interp_smth)
    ).all()
    assert np.nanmax(np.abs(res_ramp.interp_smth - base.interp_smth)) > 1e-4

    with pytest.raises(ValueError, match="shape"):
        interpolate_daily(ds, day=0, prior_mean=np.zeros((3, 3)), config=cfg)
    with pytest.raises(ValueError, match="all-NaN"):
        interpolate_daily(
            ds, day=0, prior_mean=np.full(shape, np.nan), config=cfg
        )


def test_opt_n_max_caps_estimation_not_prediction(small_season):
    """DailyConfig.opt_n_max (default 1024 since the r4 hardware A/B):
    hyperparameters are estimated from a uniform opt_n_max-point subsample
    while prediction keeps the full neighborhood — so optimize stages run
    at n <= cap, predict stages at bucket capacity, and accuracy holds."""
    ds, truth, dates = small_season
    cfg = DailyConfig(
        window_days=9, radius_km=450.0, opt=OptimizeConfig(max_iters=10),
        buckets=(128, 512), dtype="float64", spatial_seed_stride=0,
        warmstart_n=0, opt_n_max=128,
    )
    stats = []
    res = interpolate_daily(
        ds, day=0, prior_mean=0.15, config=cfg, stats=stats
    )
    opt_ns = {e["n"] for e in stats if e["stage"] == "opt"}
    pred_ns = {e["n"] for e in stats if e["stage"] == "predict"}
    assert max(opt_ns) <= 128, stats
    assert 512 in pred_ns, stats  # prediction stays full-N
    active = np.isfinite(ds.sie[:, :, 4])
    err = res.interp_smth[active] - truth[4][active]
    assert np.sqrt(np.nanmean(err**2)) < 0.06


def test_quicklook_precomputed_hypers_path(small_season):
    """The opt=False production path (GPR_CS2S3.py:170-172; quicklook README):
    precomputed hyper fields -> single predict pass, no optimization; must
    reproduce the pass-2 predictions of a full two-pass run that used the
    same smoothed hypers."""
    ds, truth, dates = small_season
    cfg = DailyConfig(
        window_days=9,
        radius_km=450.0,
        opt=OptimizeConfig(max_iters=8),
        buckets=(128, 256, 512),
        dtype="float64",
    )
    full = interpolate_daily(ds, day=0, prior_mean=0.15, config=cfg)
    quick = interpolate_daily(
        ds, day=0, prior_mean=0.15, config=cfg,
        precomputed_hypers=full.hypers_smth,
    )
    np.testing.assert_allclose(
        quick.interp_smth, full.interp_smth, rtol=1e-10, equal_nan=True
    )
    np.testing.assert_allclose(
        quick.interp_error_smth, full.interp_error_smth, rtol=1e-10, equal_nan=True
    )
    # quicklook reports the precomputed hypers unchanged
    for k, v in quick.hypers_smth.items():
        np.testing.assert_array_equal(v, full.hypers_smth[k])


def test_permuted_prefix_subsets_are_nested_uniform_subsamples():
    from optimalinterpolation_tpu.data.neighbors import NeighborhoodBatch
    from optimalinterpolation_tpu.pipeline.daily import (
        _permute_valid_points,
        _prefix_subset,
    )

    rng = np.random.default_rng(0)
    nb, cap = 3, 40
    x = rng.normal(size=(nb, cap, 3)).astype(np.float64)
    z = rng.normal(size=(nb, cap)).astype(np.float64)
    mask = np.zeros((nb, cap))
    counts = (40, 13, 0)  # full, undersize, empty rows
    for r, k in enumerate(counts):
        mask[r, :k] = 1.0
    b = NeighborhoodBatch(
        x=x.copy(), z=z.copy(), mask=mask, xstar=np.zeros((nb, 3)),
        cell_index=np.arange(nb, dtype=np.int64), n_valid_cells=nb,
    )
    _permute_valid_points(b)
    # the permutation preserves each row's (point, obs) pairs as a set
    for r, k in enumerate(counts):
        orig = {tuple(x[r, i]) + (z[r, i],) for i in range(k)}
        perm = {tuple(b.x[r, i]) + (b.z[r, i],) for i in range(k)}
        assert orig == perm
        # padding slots untouched
        np.testing.assert_array_equal(b.x[r, k:], x[r, k:])
    # prefixes are nested: the 8-subset is the head of the 16-subset
    s8 = _prefix_subset(b, 8)
    s16 = _prefix_subset(b, 16)
    np.testing.assert_array_equal(s16[0][:, :8], s8[0])
    np.testing.assert_array_equal(s16[2][:, :8], s8[2])
    # undersize row keeps its true count in the mask slice
    assert s16[2][1].sum() == 13
    assert s8[2][1].sum() == 8


def test_pipeline_warmstart_path(small_season):
    """Subsampled warm start (DailyConfig.warmstart_n) must keep the same
    quality bar as cold-start optimization while running buckets > n through
    the two-stage pre-optimize + fine-tune path."""
    ds, truth, dates = small_season
    cfg = DailyConfig(
        window_days=9,
        radius_km=450.0,
        opt=OptimizeConfig(max_iters=15, ftol_abs=1e-3),
        buckets=(16, 512),  # force a bucket whose capacity exceeds warmstart_n
        dtype="float64",
        warmstart_n=64,
    )
    res = interpolate_daily(ds, day=0, prior_mean=0.15, config=cfg)
    sie = ds.sie[:, :, 4]
    active = np.isfinite(sie)
    field = res.interp_smth
    assert np.isfinite(field[active]).mean() > 0.9
    rmse = np.sqrt(np.nanmean((field[active] - truth[4][active]) ** 2))
    assert rmse < 0.06, f"warm-start RMSE {rmse:.3f} m vs truth"
    for name, h in res.hypers.items():
        assert np.isfinite(h[active]).mean() > 0.9, name


def test_cascade_drain_skips_settled_cells(small_season):
    """cascade_skip_tol: cells whose log-hypers stop moving exit the
    warm-start cascade early, and a fully-drained stage launches nothing
    (VERDICT r2 #4: median-0-iteration stages at 11-27 s wall each)."""
    ds, truth, dates = small_season
    base = dict(
        window_days=9, radius_km=450.0,
        opt=OptimizeConfig(max_iters=15, ftol_abs=1e-3),
        buckets=(16, 512), dtype="float64", warmstart_n=64,
    )

    def cascade_entries(tol):
        stats = []
        res = interpolate_daily(
            ds, day=0, prior_mean=0.15,
            config=DailyConfig(cascade_skip_tol=tol, **base), stats=stats,
        )
        return res, [e for e in stats if e["stage"] == "cascade"]

    res_off, ents_off = cascade_entries(0.0)
    # gate off: every stage of the 512 bucket runs with the full population
    assert [e["n"] for e in ents_off] == [64, 128, 256]
    assert len({e["cells"] for e in ents_off}) == 1

    res_all, ents_all = cascade_entries(1e9)
    # everything drains after the first stage; stages 128/256 never launch
    assert [e["n"] for e in ents_all] == [64]

    res_def, ents_def = cascade_entries(0.05)
    # default: later stages run at most the earlier stages' population, and
    # quality is unchanged (the fine full-N pass governs accuracy)
    assert all(e["n"] in (64, 128, 256) for e in ents_def)
    pops = {e["n"]: e["cells"] for e in ents_def}
    assert all(pops[n] <= pops[64] for n in pops)
    sie = ds.sie[:, :, 4]
    active = np.isfinite(sie)
    for res in (res_off, res_all, res_def):
        field = res.interp_smth
        assert np.isfinite(field[active]).mean() > 0.9
        rmse = np.sqrt(np.nanmean((field[active] - truth[4][active]) ** 2))
        assert rmse < 0.06, f"cascade-drain RMSE {rmse:.3f} m vs truth"


def test_init_hypers_chained_start_reaches_same_optimum(small_season):
    """init_hypers (day-to-day chaining): starting pass-1 from a previous
    optimum must reach the same predictions — it changes the optimization
    path, not the target (unlike precomputed_hypers, which skips opt)."""
    ds, truth, dates = small_season
    cfg = DailyConfig(
        window_days=9,
        radius_km=450.0,
        opt=OptimizeConfig(max_iters=15, ftol_abs=1e-3),
        buckets=(128, 256, 512),
        dtype="float64",
    )
    cold = interpolate_daily(ds, day=0, prior_mean=0.15, config=cfg)
    warm = interpolate_daily(
        ds, day=0, prior_mean=0.15, config=cfg, init_hypers=cold.hypers
    )
    # Warm start continues refining from where the (max_iters-truncated)
    # cold run stopped, so predictions agree to mm level and quality vs the
    # synthetic truth is at least as good.
    sie = ds.sie[:, :, 4]
    active = np.isfinite(sie)
    both = active & np.isfinite(cold.interp) & np.isfinite(warm.interp)
    assert both.sum() > 50
    np.testing.assert_allclose(warm.interp[both], cold.interp[both], atol=2e-2)
    rmse_w = np.sqrt(np.nanmean((warm.interp_smth[active] - truth[4][active]) ** 2))
    rmse_c = np.sqrt(np.nanmean((cold.interp_smth[active] - truth[4][active]) ** 2))
    assert rmse_w < rmse_c + 5e-3
    assert rmse_w < 0.06


def test_spatial_seeding_two_phase(tmp_path):
    """spatial_seed_stride: phase A optimizes the seed sublattice, phase B
    warm-starts every cell from its nearest seed; quality must match the
    cold two-pass run."""
    outdir = str(tmp_path)
    truth, dates = make_synthetic_season(
        outdir, grid_res_km=125, n_days=9, seed=5, noise_std=0.03,
        tracks_per_day=(5, 2, 4, 4),
    )
    ds = read_freeboard_season(outdir, 125, "2018-2019")
    sie = ds.sie.copy()
    keep = np.zeros(sie.shape[:2], bool)
    keep[1::2, 1::2] = True  # intersects the stride-3 seed lattice [1::3]
    ij = np.nonzero(~keep)
    sie[ij[0], ij[1], :] = np.nan
    ds.sie = sie

    cfg = DailyConfig(
        window_days=9,
        radius_km=450.0,
        opt=OptimizeConfig(max_iters=15, ftol_abs=1e-3),
        buckets=(128, 256, 512),
        dtype="float64",
        spatial_seed_stride=3,
        # Exercise the capped seed pass (phase A optimizes 256/512-point
        # neighborhoods on a 128-point subsample) and the seeded cascade
        # floor (phase B runs a 128-point stage before full-N fine).
        seed_opt_n=128,
        warmstart_n_seeded=128,
    )
    res = interpolate_daily(ds, day=0, prior_mean=0.15, config=cfg)
    active = np.isfinite(ds.sie[:, :, 4])
    assert np.isfinite(res.interp_smth[active]).mean() > 0.9
    rmse = np.sqrt(np.nanmean((res.interp_smth[active] - truth[4][active]) ** 2))
    assert rmse < 0.06, f"seeded RMSE {rmse:.3f} m vs truth"


def test_chunk_shapes_come_from_tile_menu():
    """Chunk shapes must come from the fixed TILE_MENU so compiled
    programs are shared across days/runs regardless of active-cell counts."""
    from optimalinterpolation_tpu.data.neighbors import NeighborhoodBatch
    from optimalinterpolation_tpu.pipeline.daily import _chunks_of

    def batch(n):
        return NeighborhoodBatch(
            x=np.zeros((n, 16, 3), np.float32),
            z=np.zeros((n, 16), np.float32),
            mask=np.zeros((n, 16), np.float32),
            xstar=np.zeros((n, 3), np.float32),
            cell_index=np.arange(n, dtype=np.int64),
            n_valid_cells=n,
        )

    from optimalinterpolation_tpu.models.optimizer import TILE_MENU

    menu = {t for t in TILE_MENU if t <= 128}
    for total in (3, 8, 11, 40, 100, 300):
        sizes = [len(c) for c in _chunks_of(batch(total), 128)]
        assert all(s in menu for s in sizes), (total, sizes)
        # all real cells survive exactly once
        idx = np.concatenate([c.cell_index for c in _chunks_of(batch(total), 128)])
        assert sorted(idx[idx >= 0]) == list(range(total))
        # fixed-tile mode: one shape only, padded tail
        fsizes = [len(c) for c in _chunks_of(batch(total), 0, fixed_tile=32)]
        assert set(fsizes) == {32}, (total, fsizes)
        idx = np.concatenate(
            [c.cell_index for c in _chunks_of(batch(total), 0, fixed_tile=32)]
        )
        assert sorted(idx[idx >= 0]) == list(range(total))


def test_chunk_rows_backend_memory_models(monkeypatch):
    """_chunk_rows must budget HBM with the model of the backend that will
    actually run (mirrors optimizer._resolve_backend): fused Pallas for
    N < 512, the lean 3.5-buffer blocked model only for N % 128 == 0, and
    the ~10-buffer XLA model for odd capacities and f64."""
    import jax

    from optimalinterpolation_tpu.pipeline import daily as D

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    budget = 8e9

    # N=256 f32: pallas branch, duration-capped
    assert D._chunk_rows(256, 8, budget, 4) == D._PALLAS_CHUNK_CAP[256]

    # N=512 f32: blocked model (3.5 buffers)
    expect = int(budget // (D._MEM_BUFFERS_BLOCKED * 512 * 512 * 4))
    got = D._chunk_rows(512, 8, budget, 4)
    assert got == (expect // 8) * 8 and got > 1024  # far beyond the old cap

    # N=2000 f32 (not a multiple of 128): resolves to XLA -> 10-buffer model
    expect_xla = int(budget // (D._MEM_BUFFERS * 2000 * 2000 * 4))
    assert D._chunk_rows(2000, 8, budget, 4) == max(8, (expect_xla // 8) * 8)

    # f64 never takes the blocked model even at multiple-of-128 sizes
    expect_f64 = int(budget // (D._MEM_BUFFERS * 2048 * 2048 * 8))
    assert D._chunk_rows(2048, 8, budget, 8) == max(8, (expect_f64 // 8) * 8)

    # restarts divide the per-chunk row budget
    assert D._chunk_rows(512, 8, budget, 4, restarts=2) <= got // 2 + 8


def test_blocked_crossover_env_knob(monkeypatch):
    """OI_BLOCKED_MIN_N moves the pallas<->blocked crossover in BOTH the
    backend router and the chunk memory model (they must stay in lockstep:
    the chunk budget assumes the backend that will actually run)."""
    import jax
    import jax.numpy as jnp

    from optimalinterpolation_tpu.models import optimizer as O
    from optimalinterpolation_tpu.pipeline import daily as D

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    budget = 8e9
    cfg = O.OptimizeConfig()
    exact = O.OptimizeConfig(nystroem_min_n=0)

    # default routing (r3): N >= 1024 goes to the Nystrom objective
    monkeypatch.delenv("OI_BLOCKED_MIN_N", raising=False)
    monkeypatch.delenv("OI_NYSTROEM_MIN_N", raising=False)
    assert O._resolve_backend(cfg, 1024, jnp.float32) == "nystroem:512"
    assert O.routed_nystroem_m(cfg, 1024) == 512  # 1024 == 2 * nystroem_m
    assert O.routed_nystroem_m(cfg, 512) == 0  # below 2 * nystroem_m

    # exact crossover: 1024 routes blocked, duration caps don't apply
    assert O._resolve_backend(exact, 1024, jnp.float32) == "blocked"
    expect = int(budget // (D._MEM_BUFFERS_BLOCKED * 1024 * 1024 * 4))
    assert D._chunk_rows(1024, 8, budget, 4) == (expect // 8) * 8

    # raised crossover: 1024 routes pallas, duration cap governs the chunk
    monkeypatch.setenv("OI_BLOCKED_MIN_N", "2049")
    assert O._resolve_backend(exact, 1024, jnp.float32) == "pallas"
    assert D._chunk_rows(1024, 8, budget, 4) == D._PALLAS_CHUNK_CAP[1024]
    # default: the largest buckets route to the Nystrom objective; with it
    # disabled, sizes beyond pallas support fall through to blocked
    assert O._resolve_backend(cfg, 4096, jnp.float32) == "nystroem:512"
    assert O.routed_nystroem_m(cfg, 4096) == 512
    monkeypatch.setenv("OI_NYSTROEM_MIN_N", "0")
    assert O._resolve_backend(cfg, 4096, jnp.float32) == "blocked"
    exact_cfg = O.OptimizeConfig(nystroem_min_n=0)
    monkeypatch.delenv("OI_NYSTROEM_MIN_N", raising=False)
    assert O._resolve_backend(exact_cfg, 4096, jnp.float32) == "blocked"
    # nystroem chunk memory model: (N, M) buffers, far leaner than (N, N)
    expect_nys = int(
        budget // ((D._MEM_BUFFERS_NYSTROEM * 4096 * 512 + 4 * 512 * 512) * 4)
    )
    assert D._chunk_rows(4096, 8, budget, 4, nystroem_m=512) == (
        max(8, (expect_nys // 8) * 8)
    )


def test_init_hypers_nan_holes_nearest_filled(small_season):
    """Newly active (ice-edge) cells with no chained optimum must start
    from the NEAREST chained cell's optimum, not the cold x0: passing init
    fields with NaN holes must be exactly equivalent to nearest-filling
    them by hand (the fill is deterministic preprocessing; r5 — the holes
    dominated the steady-state opt:n512 stage)."""
    from optimalinterpolation_tpu.data.regrid import nearest_fill
    from optimalinterpolation_tpu.pipeline.daily import HYPER_NAMES

    ds, truth, dates = small_season
    cfg = DailyConfig(
        window_days=9,
        radius_km=450.0,
        opt=OptimizeConfig(max_iters=12, ftol_abs=1e-3),
        buckets=(128, 256, 512),
        dtype="float64",
    )
    cold = interpolate_daily(ds, day=0, prior_mean=0.15, config=cfg)
    sie_day = ds.sie[:, :, cfg.t_mid]
    holey = {}
    rng = np.random.default_rng(3)
    holes = rng.random(sie_day.shape) < 0.3  # knock out 30% of init cells
    for n in HYPER_NAMES:
        f = cold.hypers[n].copy()
        f[holes] = np.nan
        holey[n] = f
    prefilled = {
        n: nearest_fill(holey[n], ds.x, ds.y,
                        valid_mask=np.isfinite(sie_day))
        for n in HYPER_NAMES
    }
    ra = interpolate_daily(
        ds, day=0, prior_mean=0.15, config=cfg, init_hypers=holey
    )
    rb = interpolate_daily(
        ds, day=0, prior_mean=0.15, config=cfg, init_hypers=prefilled
    )
    np.testing.assert_array_equal(ra.interp, rb.interp)
    np.testing.assert_array_equal(ra.interp_smth, rb.interp_smth)
    for n in HYPER_NAMES:
        np.testing.assert_array_equal(ra.hypers[n], rb.hypers[n])
