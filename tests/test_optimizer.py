"""Batched L-BFGS MLL optimization vs the scipy-CG oracle.

The comparison surface is the *prediction* (posterior mean/std), not the raw
hyperparameters: different optimizers land in slightly different spots of the
same basin, but predictions must agree to well under the 1e-4 m production
tolerance (SURVEY.md section 7 "hard parts" (b))."""

import jax.numpy as jnp
import numpy as np
import pytest

from optimalinterpolation_tpu.models import exact_gp
from optimalinterpolation_tpu.models.optimizer import (
    OptimizeConfig,
    optimize_mll,
    optimize_mll_batch,
    optimize_mll_chunked,
)

from . import oracle


def _make_cell(seed, n=60):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-3e5, 3e5, size=(n, 3)) * np.asarray([1, 1, 1.2e-5])
    ell_true = np.array([1.8e5, 1.2e5, 3.0])
    k = oracle.matern32_gram(x, ell_true, 0.03)
    y = rng.multivariate_normal(np.zeros(n), k + 0.003 * np.eye(n))
    return x, y


X0 = np.log(np.array([25e3, 25e3, 1.0, 1.0, 0.1]))  # reference x0 (cell-3)


@pytest.mark.parametrize("method", ["lbfgs", "adam"])
def test_single_cell_matches_scipy_cg(method):
    x, y = _make_cell(7)
    xstar = np.array([[2e4, -1e4, 4.0]])

    ref_lh, ref_nll = oracle.cg_optimize(X0, x, y)
    fs_ref, std_ref, _ = oracle.gp_predict(ref_lh, x, y + 0.1, xstar, 0.1)

    cfg = OptimizeConfig(method=method, max_iters=300 if method == "adam" else 80)
    res = optimize_mll(
        jnp.asarray(X0), jnp.asarray(x), jnp.asarray(y), jnp.ones(len(y)), cfg
    )
    assert np.isfinite(float(res.nll))
    # Same basin: our NLL must be at least as good (or negligibly worse).
    assert float(res.nll) <= ref_nll + 0.5

    pred = exact_gp.predict(
        res.log_hypers, jnp.asarray(x), jnp.asarray(y) + 0.1,
        jnp.asarray(xstar), jnp.ones(len(y)), 0.1,
    )
    np.testing.assert_allclose(float(pred.mean[0]), fs_ref[0], atol=2e-4)
    np.testing.assert_allclose(float(pred.std[0]), std_ref[0], atol=2e-4)


def test_batch_matches_per_cell():
    cells = [_make_cell(s, n=48) for s in range(3)]
    nmax = 64
    xs = np.zeros((3, nmax, 3))
    ys = np.zeros((3, nmax))
    masks = np.zeros((3, nmax))
    for i, (x, y) in enumerate(cells):
        xs[i, : len(y)] = x
        ys[i, : len(y)] = y
        masks[i, : len(y)] = 1.0

    cfg = OptimizeConfig(max_iters=40)
    h0 = jnp.tile(jnp.asarray(X0)[None], (3, 1))
    batch = optimize_mll_batch(h0, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(masks), cfg)

    for i, (x, y) in enumerate(cells):
        single = optimize_mll(
            jnp.asarray(X0), jnp.asarray(x), jnp.asarray(y), jnp.ones(len(y)), cfg
        )
        np.testing.assert_allclose(
            float(batch.nll[i]), float(single.nll), rtol=1e-5,
            err_msg=f"cell {i}: batched vs single optimization diverged",
        )


def _padded_cells(seeds, n=48, nmax=64):
    cells = [_make_cell(s, n=n) for s in seeds]
    b = len(cells)
    xs = np.zeros((b, nmax, 3), np.float64)
    ys = np.zeros((b, nmax), np.float64)
    masks = np.zeros((b, nmax), np.float64)
    for i, (x, y) in enumerate(cells):
        xs[i, : len(y)] = x
        ys[i, : len(y)] = y
        masks[i, : len(y)] = 1.0
    return xs, ys, masks


@pytest.mark.parametrize("restarts", [1, 2])
def test_chunked_compaction_matches_monolithic(restarts):
    """Segment+compact driver is trajectory-identical to one big batch.

    Every in-program update is a row-wise select, so re-packing live cells
    into different chunks between segments must not change any cell's result
    (this is the property that makes compaction safe in the production
    pipeline)."""
    xs, ys, masks = _padded_cells(range(19))
    b = xs.shape[0]
    cfg = OptimizeConfig(max_iters=40, restarts=restarts)
    h0_np = np.tile(X0[None], (b, 1))

    mono = optimize_mll_batch(
        jnp.asarray(h0_np), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(masks), cfg
    )
    # chunk of 8 forces multiple 8-row tiles with a padded tail
    # (19 -> 8+8+8 with 5 dupes) and multiple compaction segments
    chunked = optimize_mll_chunked(
        h0_np, xs, ys, masks, cfg, chunk_rows=8, segment_iters=7
    )
    np.testing.assert_allclose(np.asarray(mono.nll), chunked.nll, rtol=1e-12)
    # Launch tiles have TILE_MENU shapes (launch_tiles), so the chunked run
    # evaluates the NLL at batch shapes the monolithic run never uses; XLA
    # vectorizes reductions differently per shape, and ~1e-16 evaluation
    # jitter amplifies along the optimization trajectory into ~1e-9 parameter
    # scatter across the optimum's flat valley (the NLL itself still agrees
    # to 1e-12 above).
    np.testing.assert_allclose(
        np.asarray(mono.log_hypers), chunked.log_hypers, rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(mono.converged), chunked.converged)
    np.testing.assert_array_equal(np.asarray(mono.iters), chunked.iters)


def test_plateau_stop_matches_full_run_predictions():
    """ftol_abs plateau stop: fewer iterations, same predictions.

    scipy-CG (the reference optimizer) also exits on its own internal
    criteria; the surface that must match is the prediction, and sub-0.01-nat
    NLL movement cannot shift it at the 1e-4 m level."""
    xs, ys, masks = _padded_cells(range(4))
    b = xs.shape[0]
    h0 = jnp.tile(jnp.asarray(X0)[None], (b, 1))
    full = optimize_mll_batch(
        jnp.asarray(h0), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(masks),
        OptimizeConfig(max_iters=80),
    )
    plat = optimize_mll_batch(
        jnp.asarray(h0), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(masks),
        OptimizeConfig(max_iters=80, ftol_abs=1e-3, ftol_patience=3),
    )
    assert (np.asarray(plat.iters) <= np.asarray(full.iters)).all()
    assert np.asarray(plat.converged).all()
    # NLL within a small fraction of a nat of the full run
    np.testing.assert_allclose(
        np.asarray(plat.nll), np.asarray(full.nll), atol=0.25
    )
    xstar = np.tile(np.array([[2e4, -1e4, 4.0]]), (b, 1))
    from optimalinterpolation_tpu.models.exact_gp_batch import predict_batch

    pf = predict_batch(full.log_hypers, jnp.asarray(xs), jnp.asarray(ys) + 0.1,
                       jnp.asarray(xstar), jnp.asarray(masks),
                       jnp.full((b,), 0.1))
    pp = predict_batch(plat.log_hypers, jnp.asarray(xs), jnp.asarray(ys) + 0.1,
                       jnp.asarray(xstar), jnp.asarray(masks),
                       jnp.full((b,), 0.1))
    np.testing.assert_allclose(np.asarray(pp.mean), np.asarray(pf.mean), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pp.std), np.asarray(pf.std), atol=1e-4)


def test_plateau_patience_one_stops_fast():
    xs, ys, masks = _padded_cells([5])
    h0 = jnp.asarray(X0)[None]
    res = optimize_mll_batch(
        h0, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(masks),
        OptimizeConfig(max_iters=60, ftol_abs=1e9, ftol_patience=1),
    )
    # every accepted step improves by < 1e9 nats, so one iteration suffices
    assert int(res.iters[0]) <= 1
    assert bool(res.converged[0])


def test_multi_restart_never_worse():
    """restarts > 1 keeps the best NLL per cell; never worse than single."""
    cells = [_make_cell(s, n=48) for s in (11, 12)]
    nmax = 64
    xs = np.zeros((2, nmax, 3))
    ys = np.zeros((2, nmax))
    masks = np.zeros((2, nmax))
    for i, (x, y) in enumerate(cells):
        xs[i, : len(y)] = x
        ys[i, : len(y)] = y
        masks[i, : len(y)] = 1.0
    h0 = jnp.tile(jnp.asarray(X0)[None], (2, 1))
    single = optimize_mll_batch(
        h0, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(masks),
        OptimizeConfig(max_iters=30),
    )
    multi = optimize_mll_batch(
        h0, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(masks),
        OptimizeConfig(max_iters=30, restarts=3),
    )
    assert (np.asarray(multi.nll) <= np.asarray(single.nll) + 1e-9).all()


def test_blocked_backend_trajectory_matches_xla():
    """The blocked backend's factor-reuse path (line search carries the
    factorization; the gradient reuses it — models.optimizer._lbfgs_segment
    ``pair``) must walk the same trajectory as the XLA autodiff backend:
    same math, different programs. f64, N=256 (2 blocks)."""
    rng = np.random.default_rng(3)
    b, n = 3, 256
    xs = rng.uniform(-3e5, 3e5, size=(b, n, 3)) * np.asarray([1, 1, 1.2e-5])
    ys = rng.normal(0.0, 0.1, size=(b, n))
    masks = (rng.random((b, n)) < 0.9).astype(np.float64)
    h0 = jnp.tile(jnp.asarray(X0)[None], (b, 1))
    kw = dict(max_iters=25, grad_tol=1e-6, jitter=1e-6)
    rb = optimize_mll_batch(
        h0, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(masks),
        OptimizeConfig(backend="blocked", **kw),
    )
    rx = optimize_mll_batch(
        h0, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(masks),
        OptimizeConfig(backend="xla", **kw),
    )
    np.testing.assert_allclose(
        np.asarray(rb.nll), np.asarray(rx.nll), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(rb.log_hypers), np.asarray(rx.log_hypers), atol=1e-5
    )
    # Iteration counts may differ by one: Armijo accept/reject is a hard
    # threshold on values that differ at ~1e-13 between the two numerically
    # distinct f64 implementations, so a BLAS/XLA version change can flip a
    # single line-search decision without moving the optimum.
    assert np.all(np.abs(np.asarray(rb.iters) - np.asarray(rx.iters)) <= 1)


def test_zero_lead_verify_sweep_matches_monolithic():
    """A leading 0-length segment (the fine-pass entry drain: init NLL+grad
    verification, zero L-BFGS iterations, then compaction) must be
    trajectory-identical to the monolithic run — cells converged at init
    exit with their inits; all others continue unchanged."""
    xs, ys, masks = _padded_cells(range(19))
    b = xs.shape[0]
    cfg = OptimizeConfig(max_iters=40)
    h0_np = np.tile(X0[None], (b, 1))
    mono = optimize_mll_batch(
        jnp.asarray(h0_np), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(masks), cfg,
    )
    drained = optimize_mll_chunked(
        h0_np, xs, ys, masks, cfg, chunk_rows=8, segment_iters=7,
        lead_schedule=(0, 1, 4),
    )
    np.testing.assert_allclose(np.asarray(mono.nll), drained.nll, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(mono.log_hypers), drained.log_hypers, rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(mono.converged), drained.converged)
    np.testing.assert_array_equal(np.asarray(mono.iters), drained.iters)


def test_zero_lead_drains_converged_at_init():
    """Cells whose init already satisfies grad_tol exit the 0-lead sweep
    with ZERO iterations and their init hypers unchanged."""
    xs, ys, masks = _padded_cells(range(9))
    b = xs.shape[0]
    cfg = OptimizeConfig(max_iters=40)
    h0_np = np.tile(X0[None], (b, 1))
    # converge once, then re-enter the optimizer from the optimum
    first = optimize_mll_chunked(
        h0_np, xs, ys, masks, cfg, chunk_rows=8, segment_iters=7
    )
    again = optimize_mll_chunked(
        np.asarray(first.log_hypers), xs, ys, masks, cfg, chunk_rows=8,
        segment_iters=7, lead_schedule=(0, 1, 4),
    )
    conv = np.asarray(first.converged)
    assert conv.any()
    np.testing.assert_array_equal(np.asarray(again.iters)[conv], 0)
    np.testing.assert_allclose(
        np.asarray(again.log_hypers)[conv],
        np.asarray(first.log_hypers)[conv], rtol=0, atol=0,
    )
