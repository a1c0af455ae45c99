"""Kernel golden tests vs the NumPy oracle + property tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from optimalinterpolation_tpu.ops import kernels as K

from . import oracle


def _cloud(rng, n=40, d=3, scale=(1e6, 1e6, 4.0)):
    return rng.normal(size=(n, d)) * np.asarray(scale)


ELL = np.array([2.2e5, 1.4e5, 2.0])
SF2 = 0.028


def test_matern32_matches_oracle(rng):
    x = _cloud(rng)
    ours = np.asarray(K.kernel_matrix(jnp.asarray(x), jnp.asarray(ELL), SF2))
    ref = oracle.matern32_gram(x, ELL, SF2)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_cross_kernel_matches_oracle(rng):
    x = _cloud(rng)
    xs = _cloud(rng, n=5)
    ours = np.asarray(K.cross_kernel(jnp.asarray(x), jnp.asarray(xs), jnp.asarray(ELL), SF2))
    ref = oracle.matern32_cross(x, xs, ELL, SF2)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("kind", list(K.Kernel))
def test_psd_and_diag(rng, kind):
    x = _cloud(rng, n=60)
    k = np.asarray(K.kernel_matrix(jnp.asarray(x), jnp.asarray(ELL), SF2, kind=kind))
    np.testing.assert_allclose(np.diag(k), SF2, rtol=1e-12)
    np.testing.assert_allclose(k, k.T, rtol=1e-12)
    evals = np.linalg.eigvalsh(k + 1e-10 * np.eye(len(k)))
    assert evals.min() > -1e-8 * SF2


def test_masked_rows_zeroed(rng):
    x = _cloud(rng, n=16)
    mask = np.ones(16)
    mask[10:] = 0.0
    k = np.asarray(
        K.kernel_matrix(jnp.asarray(x), jnp.asarray(ELL), SF2, mask=jnp.asarray(mask))
    )
    assert np.all(k[10:, :] == 0) and np.all(k[:, 10:] == 0)
    ref = oracle.matern32_gram(x[:10], ELL, SF2)
    np.testing.assert_allclose(k[:10, :10], ref, rtol=1e-9, atol=1e-12)


def test_gradient_finite_at_zero_distance():
    """safe_sqrt must keep d k / d log ell finite on the diagonal."""
    import jax

    x = jnp.zeros((3, 3))  # all points coincide -> all distances zero
    g = jax.grad(lambda le: jnp.sum(K.kernel_matrix(x, jnp.exp(le), 1.0)))(
        jnp.zeros(3)
    )
    assert np.all(np.isfinite(np.asarray(g)))
