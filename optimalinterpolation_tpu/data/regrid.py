"""Grid-to-grid regridding of sea-ice-concentration fields (reference C2).

Rebuilds the capability of ``/root/reference/regrid_xesmf.py`` (25 km NSIDC
sea-ice concentration -> 5 km EASE grid) without the xESMF/ESMF stack:

  * bilinear interpolation between regular grids (pure NumPy, separable
    index arithmetic — no scattered-mesh weights needed for the regular
    source grids used here; matches xesmf's ``method='bilinear'`` on the
    interior),
  * nearest-neighbour fill of NaN holes (the reference's post-pass with
    ``scipy cKDTree``-style filling),
  * ocean masking: the reference uses the ``global_land_mask`` package; that
    dependency is replaced by masking against the source product's own
    validity footprint (NSIDC SIC is only defined over ocean), with an
    optional user-supplied mask taking precedence.

Also used to regrid 50 km seasonal-average hyperparameter fields onto the
25 km production grid — the quicklook acceleration path
(``QuickLook Data/README.txt:1``).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

__all__ = ["bilinear_regrid", "nearest_fill", "regrid_field"]


def bilinear_regrid(
    src: np.ndarray,  # (ny, nx) source field (NaN = missing)
    src_x: np.ndarray,  # (nx,) or (ny, nx) source coords
    src_y: np.ndarray,
    dst_x: np.ndarray,  # (my,) / (my, mx) destination coords
    dst_y: np.ndarray,
) -> np.ndarray:
    """Bilinear interpolation from one regular grid to another.

    NaN-aware: a destination point whose 4 surrounding source cells are all
    NaN comes out NaN; partial NaN neighbourhoods renormalize the weights
    (xesmf's behaviour with ``skipna``-style handling).
    """
    sx = np.asarray(src_x[0] if np.ndim(src_x) == 2 else src_x, dtype=np.float64)
    sy = np.asarray(
        src_y[:, 0] if np.ndim(src_y) == 2 else src_y, dtype=np.float64
    )
    dx = np.asarray(dst_x if np.ndim(dst_x) == 2 else np.meshgrid(dst_x, dst_y)[0])
    dy = np.asarray(dst_y if np.ndim(dst_y) == 2 else np.meshgrid(dst_x, dst_y)[1])

    fx = np.interp(dx.ravel(), sx, np.arange(len(sx)))
    fy = np.interp(dy.ravel(), sy, np.arange(len(sy)))
    ix = np.clip(fx.astype(np.int64), 0, len(sx) - 2)
    iy = np.clip(fy.astype(np.int64), 0, len(sy) - 2)
    tx = np.clip(fx - ix, 0.0, 1.0)
    ty = np.clip(fy - iy, 0.0, 1.0)

    corners = [
        (src[iy, ix], (1 - ty) * (1 - tx)),
        (src[iy, ix + 1], (1 - ty) * tx),
        (src[iy + 1, ix], ty * (1 - tx)),
        (src[iy + 1, ix + 1], ty * tx),
    ]
    num = np.zeros(dx.size)
    den = np.zeros(dx.size)
    for v, wgt in corners:
        good = np.isfinite(v)
        num += np.where(good, v * wgt, 0.0)
        den += np.where(good, wgt, 0.0)
    out = np.where(den > 0, num / np.where(den > 0, den, 1.0), np.nan)
    return out.reshape(dx.shape)


def nearest_fill(
    field: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    valid_mask: np.ndarray | None = None,
) -> np.ndarray:
    """Fill NaNs with the nearest finite value (the reference's NaN fill).

    ``valid_mask`` restricts which NaN pixels get filled (e.g. ocean only);
    pixels outside it stay NaN.
    """
    gx = x if np.ndim(x) == 2 else np.meshgrid(x, y)[0]
    gy = y if np.ndim(y) == 2 else np.meshgrid(x, y)[1]
    finite = np.isfinite(field)
    if not finite.any():
        return field.copy()
    holes = ~finite if valid_mask is None else (~finite) & valid_mask
    if not holes.any():
        return field.copy()
    tree = cKDTree(np.column_stack([gx[finite], gy[finite]]))
    _, idx = tree.query(np.column_stack([gx[holes], gy[holes]]))
    out = field.copy()
    out[holes] = field[finite][idx]
    return out


def regrid_field(
    src: np.ndarray,
    src_x: np.ndarray,
    src_y: np.ndarray,
    dst_x: np.ndarray,
    dst_y: np.ndarray,
    fill: bool = True,
    ocean_mask: np.ndarray | None = None,
) -> np.ndarray:
    """The full reference C2 flow: bilinear regrid -> NaN fill -> mask.

    ``ocean_mask`` (destination-shaped bool, True = ocean) replaces the
    reference's ``global_land_mask``; when None, the regridded validity
    footprint itself is the mask (SIC products are ocean-only by
    construction).
    """
    out = bilinear_regrid(src, src_x, src_y, dst_x, dst_y)
    if ocean_mask is None:
        ocean_mask = np.isfinite(
            nearest_fill(out, dst_x, dst_y)
        )  # footprint of the product
    if fill:
        out = nearest_fill(out, dst_x, dst_y, valid_mask=ocean_mask)
    out = np.where(ocean_mask, out, np.nan)
    return out
