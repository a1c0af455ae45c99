"""NaN-aware Gaussian smoothing of hyperparameter fields.

Rebuilds the reference's ``smooth()`` (``/root/reference/2021_paper_production/
GPR_CS2S3.py:65-76``), which uses astropy's ``convolve(data,
Gaussian2DKernel(std))``: clip at a physical vmax, normalized NaN-interpolating
Gaussian convolution, zeros -> field mean, re-mask by sea-ice extent.

Implemented as a single XLA convolution pair (numerator / denominator of the
normalized convolution) so the smoothing step runs on-device between the two
pjit passes instead of gathering to a rank-0 host as the reference's MPI flow
does (``GPR_CS2S3.py:299-311``).

Astropy parity notes:
  * Gaussian2DKernel(std) support is 8*std, rounded up to the next odd integer
    (astropy default ``factor`` semantics); kernel sampled at integer offsets
    and normalized to sum 1.
  * ``convolve`` treats NaN as missing: out = conv(data_0) / conv(finite),
    boundary zero-filled; pixels whose kernel support contains no valid data
    come out as exactly 0 — which the reference then replaces by the field
    mean (``:74``), a behaviour we replicate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "gaussian_kernel_2d",
    "nan_gaussian_smooth",
    "smooth_hyper_field",
    "smoothing_device",
]


def smoothing_device():
    """Preferred device for the smoothing convolutions: the HOST CPU when
    the default backend is an accelerator, else None (use the default).

    The smoothing step is ~10 MFLOP once per day (five 320x320 normalized
    convolutions) — pure launch overhead on an accelerator. Measured on the
    tunneled TPU runtime it cost 636 s of a 783 s daily pass (program-load +
    degraded-phase launch latency); on the host CPU it is milliseconds. The
    reference runs it on rank 0's CPU too (GPR_CS2S3.py:299-307). Use as
    ``with jax.default_device(smoothing_device() or jax.devices()[0]): ...``
    or guard on None."""
    if jax.default_backend() == "cpu":
        return None
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def gaussian_kernel_2d(std: float, dtype=jnp.float32) -> jax.Array:
    """Odd-sized 2-D Gaussian tap matrix, normalized to sum 1."""
    half = int(4.0 * std)  # support = 8*std -> radius 4*std
    size = 2 * half + 1
    r = jnp.arange(-half, half + 1, dtype=dtype)
    g1 = jnp.exp(-0.5 * (r / std) ** 2)
    k = jnp.outer(g1, g1)
    return k / jnp.sum(k)


@partial(jax.jit, static_argnames=("std",))
def nan_gaussian_smooth(field: jax.Array, std: float = 1.0) -> jax.Array:
    """Normalized (NaN-interpolating) Gaussian convolution of a 2-D field.

    Pixels with no valid data under the kernel return 0 (astropy behaviour the
    reference relies on at ``GPR_CS2S3.py:74``).
    """
    k = gaussian_kernel_2d(std, dtype=field.dtype)
    finite = jnp.isfinite(field)
    data0 = jnp.where(finite, field, 0.0)
    w = finite.astype(field.dtype)

    def conv2(img):
        return jax.lax.conv_general_dilated(
            img[None, None],
            k[None, None],
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0, 0]

    num = conv2(data0 * 1.0)
    den = conv2(w)
    return jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 0.0)


@partial(jax.jit, static_argnames=("std",))
def smooth_hyper_field(
    field: jax.Array,
    vmax: float,
    sie_mask: jax.Array,
    std: float = 1.0,
) -> jax.Array:
    """Full reference ``smooth()`` semantics (``GPR_CS2S3.py:65-76``):

      1. inf -> NaN;
      2. clip above ``vmax`` (physical bound per hyperparameter, ``:303-307``);
      3. NaN-aware Gaussian convolution;
      4. exact zeros -> mean of the smoothed field (nanmean in the reference;
         after step 3 the field has no NaNs, only zeros outside coverage);
      5. re-apply NaN where ``sie_mask`` is NaN.
    """
    f = jnp.where(jnp.isinf(field), jnp.nan, field)
    f = jnp.where(f > vmax, vmax, f)
    s = nan_gaussian_smooth(f, std=std)
    # Reference ``:74``: zeros -> np.nanmean(field). After the normalized
    # convolution our field has no NaNs (only zeros outside coverage), so
    # nanmean == plain mean over the whole field, zeros included.
    s = jnp.where(s != 0.0, s, jnp.mean(s))
    return jnp.where(jnp.isnan(sie_mask), jnp.nan, s)
