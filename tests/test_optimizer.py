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
