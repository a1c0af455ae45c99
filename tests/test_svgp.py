"""Native SVGP: ELBO sanity, convergence toward the exact GP, masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimalinterpolation_tpu.models import exact_gp
from optimalinterpolation_tpu.models.svgp import (
    SVGPConfig,
    svgp_fit,
    svgp_init,
    svgp_predict,
)

from . import oracle

LOG_H = np.log(np.array([1.8e5, 1.8e5, 3.0, 0.03, 0.004]))
X0 = np.log(np.array([25e3, 25e3, 1.0, 1.0, 0.1]))  # reference init


def _cell(rng, n=200):
    x = rng.uniform(-3e5, 3e5, size=(n, 3)) * np.asarray([1, 1, 1.2e-5])
    k = oracle.matern32_gram(x, np.exp(LOG_H[:3]), np.exp(LOG_H[3]))
    y = 0.15 + rng.multivariate_normal(np.zeros(n), k + np.exp(LOG_H[4]) * np.eye(n))
    return x, y


@pytest.mark.slow
def test_svgp_approaches_exact_gp():
    """SVGP vs exact GP *at the SVGP's learned hyperparameters*.

    Comparing against the exact GP at the TRUE hypers confounds two errors:
    hyperparameter learning from n=200 points (poorly identified) and the
    inducing-point approximation. The reference's own check (7 mm agreement,
    sparseGP_example.ipynb cell-3 vs cell-5) used a dense real cell where
    hypers are well identified. Here the sparse-approximation error is
    isolated: same hypers, same mean -> sub-mm agreement on a field smooth
    enough for 50 inducing points to represent.
    """
    # local generator: the session rng's state depends on which tests ran
    # before, and this assertion is data-sensitive
    rng = np.random.default_rng(1234)
    log_h = np.log(np.array([4.0e5, 4.0e5, 6.0, 0.03, 0.004]))
    n = 200
    x = rng.uniform(-3e5, 3e5, size=(n, 3)) * np.asarray([1, 1, 1.2e-5])
    k = oracle.matern32_gram(x, np.exp(log_h[:3]), np.exp(log_h[3]))
    y = 0.15 + rng.multivariate_normal(np.zeros(n), k + np.exp(log_h[4]) * np.eye(n))

    cfg = SVGPConfig(num_inducing=50, iterations=2000, batch_size=64, learning_rate=1e-2)
    params0 = svgp_init(jnp.asarray(x), jnp.ones(n), 50, jnp.asarray(X0), mean=0.15)
    fit = svgp_fit(
        params0, jnp.asarray(x), jnp.asarray(y), jnp.ones(n),
        jax.random.key(0), cfg,
    )
    # ELBO increased substantially and is finite
    el = np.asarray(fit.elbo_log)
    assert np.isfinite(el[-1])
    assert el[-1] > el[0] + 10

    xstar = np.array([[0.0, 0.0, 4.0]])
    sp = svgp_predict(fit.params, jnp.asarray(xstar))
    pe = exact_gp.predict(
        fit.params.log_hypers, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(xstar), jnp.ones(n), fit.params.mean,
    )
    assert abs(float(sp.mean[0]) - float(pe.mean[0])) < 0.005
    assert abs(float(sp.std[0]) - float(pe.std[0])) < 0.005
    assert float(sp.std[0]) > 0


def test_svgp_kl_zero_at_init_and_elbo_bounds():
    """Two cheap variational-correctness properties that need no GPflow:

    1. KL(q||p) == 0 at init: whitened params start at q(v) = N(0, I) == the
       prior, so the ELBO at step 0 equals the expected log-likelihood alone.
    2. The ELBO lower-bounds the exact log marginal likelihood (Titsias
       bound) for ANY variational state — checked at the fitted state with
       full-batch evaluation at the SVGP's own hypers.
    """
    from optimalinterpolation_tpu.models.svgp import _kl, elbo

    rng = np.random.default_rng(77)
    x, y = _cell(rng, n=120)
    n = len(y)
    p0 = svgp_init(jnp.asarray(x), jnp.ones(n), 24, jnp.asarray(LOG_H), 0.15)
    assert abs(float(_kl(p0))) < 1e-10

    cfg = SVGPConfig(num_inducing=24, iterations=300, batch_size=n)
    fit = svgp_fit(
        p0, jnp.asarray(x), jnp.asarray(y), jnp.ones(n),
        jax.random.key(2), cfg,
    )
    for params in (p0, fit.params):
        full_elbo = float(elbo(
            params, jnp.asarray(x), jnp.asarray(y), jnp.ones(n),
            jnp.asarray(float(n)), cfg.kind, cfg.jitter,
        ))
        # exact lml at the SAME hypers/mean (lZ from the oracle exact GP)
        pe = exact_gp.predict(
            params.log_hypers, jnp.asarray(x), jnp.asarray(y),
            jnp.asarray([[0.0, 0.0, 4.0]]), jnp.ones(n), params.mean,
        )
        lml = float(pe.lZ)
        assert np.isfinite(full_elbo)
        assert full_elbo <= lml + 1e-6, (full_elbo, lml)


def test_svgp_mask_excludes_padding(rng):
    x, y = _cell(rng, n=80)
    xp = np.concatenate([x, np.zeros((48, 3))])
    yp = np.concatenate([y, np.full(48, 99.0)])  # poison padding
    mask = np.concatenate([np.ones(80), np.zeros(48)])
    cfg = SVGPConfig(num_inducing=16, iterations=200, batch_size=32)
    p0 = svgp_init(jnp.asarray(xp), jnp.asarray(mask), 16, jnp.asarray(X0), 0.15)
    fit = svgp_fit(
        p0, jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(mask),
        jax.random.key(1), cfg,
    )
    sp = svgp_predict(fit.params, jnp.asarray([[0.0, 0.0, 4.0]]))
    # poisoned padding (value 99) must not drag the prediction away
    assert abs(float(sp.mean[0])) < 1.0

    # inducing range must come from valid points only (padding sits at 0)
    z = np.asarray(fit.params.z)
    assert np.isfinite(z).all()
