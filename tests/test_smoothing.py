"""NaN-aware Gaussian smoothing vs a NumPy normalized-convolution oracle."""

import jax.numpy as jnp
import numpy as np

from optimalinterpolation_tpu.ops.smoothing import (
    gaussian_kernel_2d,
    nan_gaussian_smooth,
    smooth_hyper_field,
)


def _np_nan_smooth(field, std):
    k = np.asarray(gaussian_kernel_2d(std, dtype=jnp.float64))
    from scipy.signal import convolve2d

    finite = np.isfinite(field)
    num = convolve2d(np.where(finite, field, 0.0), k, mode="same")
    den = convolve2d(finite.astype(float), k, mode="same")
    out = np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)
    return out


def test_matches_scipy_normalized_convolution(rng):
    f = rng.normal(size=(40, 40))
    f[rng.random((40, 40)) < 0.4] = np.nan
    ours = np.asarray(nan_gaussian_smooth(jnp.asarray(f), std=2.0))
    ref = _np_nan_smooth(f, 2.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-12)


def test_kernel_normalized():
    k = np.asarray(gaussian_kernel_2d(2.0))
    assert k.shape == (17, 17)  # 8*std support, odd
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)


def test_smooth_hyper_field_semantics(rng):
    f = np.full((30, 30), np.nan)
    f[10:20, 10:20] = rng.normal(2e5, 1e4, size=(10, 10))
    f[12, 12] = np.inf  # inf -> NaN path
    f[13, 13] = 9e9  # clipped at vmax
    sie = np.full((30, 30), np.nan)
    sie[5:25, 5:25] = 1.0
    out = np.asarray(
        smooth_hyper_field(jnp.asarray(f), vmax=6e5, sie_mask=jnp.asarray(sie), std=1.0)
    )
    # masked where SIE is NaN
    assert np.isnan(out[0, 0])
    # no NaN/inf inside the SIE region, nothing above vmax by much
    inside = out[5:25, 5:25]
    assert np.isfinite(inside).all()
    assert inside.max() <= 6e5 + 1e-3
