"""Nystrom approximation: M=n exactness + approximation quality + masking."""

import jax.numpy as jnp
import numpy as np

from optimalinterpolation_tpu.models import exact_gp
from optimalinterpolation_tpu.models.nystroem import nystroem_nll, nystroem_predict

from . import oracle

LOG_H = np.log(np.array([2.0e5, 1.5e5, 2.5, 0.03, 0.004]))


def _cell(rng, n=120):
    x = rng.uniform(-3e5, 3e5, size=(n, 3)) * np.asarray([1, 1, 1.2e-5])
    k = oracle.matern32_gram(x, np.exp(LOG_H[:3]), np.exp(LOG_H[3]))
    y = rng.multivariate_normal(np.zeros(n), k + np.exp(LOG_H[4]) * np.eye(n))
    return x, y


def test_full_rank_matches_exact(rng):
    """With M = n landmarks the Nystrom approximation is exact."""
    x, y = _cell(rng, n=60)
    lm = jnp.arange(60)
    approx = nystroem_nll(
        jnp.asarray(LOG_H), jnp.asarray(x), jnp.asarray(y), lm, jnp.ones(60)
    )
    exact = exact_gp.neg_log_marginal_likelihood(
        jnp.asarray(LOG_H), jnp.asarray(x), jnp.asarray(y), jnp.ones(60)
    )
    np.testing.assert_allclose(float(approx), float(exact), rtol=1e-6)

    xstar = np.array([[1e4, -2e4, 4.0]])
    pn = nystroem_predict(
        jnp.asarray(LOG_H), jnp.asarray(x), jnp.asarray(y) + 0.1,
        jnp.asarray(xstar), lm, jnp.ones(60), 0.1,
    )
    pe = exact_gp.predict(
        jnp.asarray(LOG_H), jnp.asarray(x), jnp.asarray(y) + 0.1,
        jnp.asarray(xstar), jnp.ones(60), 0.1,
    )
    np.testing.assert_allclose(float(pn.mean[0]), float(pe.mean[0]), atol=1e-6)
    np.testing.assert_allclose(float(pn.std[0]), float(pe.std[0]), atol=1e-5)


def test_low_rank_converges_to_exact():
    """Approximation error decreases with M; near-exact by M ~ 2n/3.

    Uses length-scales long relative to the domain so the kernel spectrum
    decays fast — the regime where rank-M Nystrom is accurate. (With short
    length-scales the eigenvalues at the rank cutoff exceed sn2 and NO
    rank-M < n approximation can be close; that is inherent to the method,
    not an implementation property.)
    """
    local = np.random.default_rng(1234)
    log_h = np.log(np.array([4.0e5, 4.0e5, 6.0, 0.03, 0.004]))
    n = 150
    x = local.uniform(-3e5, 3e5, size=(n, 3)) * np.asarray([1, 1, 1.2e-5])
    k = oracle.matern32_gram(x, np.exp(log_h[:3]), np.exp(log_h[3]))
    y = local.multivariate_normal(np.zeros(n), k + np.exp(log_h[4]) * np.eye(n))
    xstar = np.array([[0.0, 0.0, 4.0]])
    pe = exact_gp.predict(
        jnp.asarray(log_h), jnp.asarray(x), jnp.asarray(y) + 0.1,
        jnp.asarray(xstar), jnp.ones(150), 0.1,
    )
    errs = {}
    for m in (50, 100, 150):
        lm = jnp.asarray(sorted(local.choice(150, m, replace=False)))
        pn = nystroem_predict(
            jnp.asarray(log_h), jnp.asarray(x), jnp.asarray(y) + 0.1,
            jnp.asarray(xstar), lm, jnp.ones(150), 0.1,
        )
        errs[m] = (
            abs(float(pn.mean[0]) - float(pe.mean[0])),
            abs(float(pn.std[0]) - float(pe.std[0])),
        )
    assert errs[150][0] < 1e-6 and errs[150][1] < 1e-5
    assert errs[100][0] < 0.05 and errs[100][1] < 0.03
    assert errs[100][1] <= errs[50][1] + 1e-6
    assert errs[100][0] <= errs[50][0] + 1e-6


def test_padding_invariance(rng):
    x, y = _cell(rng, n=40)
    lm = jnp.asarray(sorted(rng.choice(40, 20, replace=False)))
    base = nystroem_nll(
        jnp.asarray(LOG_H), jnp.asarray(x), jnp.asarray(y), lm, jnp.ones(40)
    )
    xp = np.concatenate([x, rng.normal(size=(24, 3)) * 1e5])
    yp = np.concatenate([y, np.full(24, 7.0)])
    mask = np.concatenate([np.ones(40), np.zeros(24)])
    padded = nystroem_nll(
        jnp.asarray(LOG_H), jnp.asarray(xp), jnp.asarray(yp), lm, jnp.asarray(mask)
    )
    np.testing.assert_allclose(float(padded), float(base), rtol=1e-8)
