"""Exact-GP MLL + predict vs the NumPy oracle, incl. padding invariance."""

import jax
import jax.numpy as jnp
import numpy as np

from optimalinterpolation_tpu.models import exact_gp

from . import oracle

LOG_H = np.log(np.array([2.2e5, 1.4e5, 2.0, 0.028, 0.003]))


def _cell(rng, n=80):
    x = rng.normal(size=(n, 3)) * np.asarray([2e5, 2e5, 2.5])
    ell_true = np.array([1.5e5, 1.5e5, 2.0])
    k = oracle.matern32_gram(x, ell_true, 0.03)
    y = rng.multivariate_normal(np.zeros(n), k + 0.002 * np.eye(n))
    return x, y


def test_nll_matches_oracle(rng):
    x, y = _cell(rng)
    ours = exact_gp.neg_log_marginal_likelihood(
        jnp.asarray(LOG_H), jnp.asarray(x), jnp.asarray(y), jnp.ones(len(y))
    )
    ref, _ = oracle.nll_and_grad(LOG_H, x, y)
    # rtol floor: the MXU-friendly matmul-expansion distances differ from the
    # oracle's exact pairwise differences by O(eps * |x|^2 / ell^2).
    np.testing.assert_allclose(float(ours), ref, rtol=1e-8)


def test_nll_grad_matches_oracle(rng):
    """jax.grad == hand-derived trace-identity gradients.

    The sf2 coordinate uses the TRUE gradient; the reference's factor-2
    convention (GPR_CS2S3.py:136) is checked via ref_sf2_convention=False.
    """
    x, y = _cell(rng)
    g = jax.grad(exact_gp.neg_log_marginal_likelihood)(
        jnp.asarray(LOG_H), jnp.asarray(x), jnp.asarray(y), jnp.ones(len(y))
    )
    _, gref = oracle.nll_and_grad(LOG_H, x, y, ref_sf2_convention=False)
    np.testing.assert_allclose(np.asarray(g), gref, rtol=1e-5, atol=1e-8)


def test_nll_padding_invariance(rng):
    """Padding with masked points must not change the NLL at all."""
    x, y = _cell(rng, n=50)
    base = exact_gp.neg_log_marginal_likelihood(
        jnp.asarray(LOG_H), jnp.asarray(x), jnp.asarray(y), jnp.ones(50)
    )
    pad = 30
    xp = np.concatenate([x, rng.normal(size=(pad, 3)) * 1e5])
    yp = np.concatenate([y, np.full(pad, 123.456)])  # garbage in padding
    mask = np.concatenate([np.ones(50), np.zeros(pad)])
    padded = exact_gp.neg_log_marginal_likelihood(
        jnp.asarray(LOG_H), jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(padded), float(base), rtol=1e-12)


def test_predict_matches_oracle(rng):
    x, y = _cell(rng)
    xstar = np.array([[1e5, -5e4, 4.0]])
    mean = 0.1
    res = exact_gp.predict(
        jnp.asarray(LOG_H),
        jnp.asarray(x),
        jnp.asarray(y),
        jnp.asarray(xstar),
        jnp.ones(len(y)),
        jnp.asarray(mean),
    )
    fs, std, lz = oracle.gp_predict(LOG_H, x, y, xstar, mean)
    np.testing.assert_allclose(np.asarray(res.mean), fs, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res.std), std, rtol=1e-8)
    np.testing.assert_allclose(float(res.lZ), lz, rtol=1e-10)
    assert bool(res.ok)


def test_predict_padding_invariance(rng):
    x, y = _cell(rng, n=40)
    xstar = np.array([[0.0, 0.0, 4.0]])
    res = exact_gp.predict(
        jnp.asarray(LOG_H), jnp.asarray(x), jnp.asarray(y), jnp.asarray(xstar),
        jnp.ones(40), 0.1,
    )
    pad = 24
    xp = np.concatenate([x, np.zeros((pad, 3))])
    yp = np.concatenate([y, np.full(pad, np.nan)])  # NaN garbage in padding
    yp_clean = np.where(np.isnan(yp), 0.0, yp)  # pipeline zeroes padded y
    mask = np.concatenate([np.ones(40), np.zeros(pad)])
    resp = exact_gp.predict(
        jnp.asarray(LOG_H), jnp.asarray(xp), jnp.asarray(yp_clean),
        jnp.asarray(xstar), jnp.asarray(mask), 0.1,
    )
    np.testing.assert_allclose(np.asarray(resp.mean), np.asarray(res.mean), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(resp.std), np.asarray(res.std), rtol=1e-12)


def test_failed_cholesky_gives_nan_cell():
    """Non-PSD system -> NaN outputs, matching GPR3D's LinAlgError path."""
    x = np.zeros((8, 3))  # identical points, sn2 ~ 0 -> singular
    y = np.arange(8.0)
    log_h = np.log(np.array([1.0, 1.0, 1.0, 1.0, 1e-30]))
    res = exact_gp.predict(
        jnp.asarray(log_h), jnp.asarray(x), jnp.asarray(y),
        jnp.zeros((1, 3)), jnp.ones(8), 0.0,
    )
    assert not bool(res.ok)
    assert np.isnan(np.asarray(res.mean)).all()
