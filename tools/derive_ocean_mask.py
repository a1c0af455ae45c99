"""Derive the committed ocean mask from the reference's quicklook products.

The reference's SIC regridder masks land with the ``global_land_mask``
package (``/root/reference/regrid_xesmf.py:14``), which is unavailable in
this offline environment (and carries its own baked-in dataset). The
equivalent information PRESENT in the reference repo is its 232 published
quicklook NetCDFs (``QuickLook Data/``): a 320x320 grid cell that carries a
finite freeboard on ANY published day is ice-capable ocean by construction.
The union footprint over all 232 days (Dec-Apr + Oct-Dec — maximum winter
extent) is therefore the supported ocean mask for this framework's domain:
every cell the pipeline can ever interpolate is inside it, land never is.

Writes optimalinterpolation_tpu/data/static/ocean_mask_25km.npz with
  mask: (320, 320) bool   True = ice-capable ocean
  x, y: (320,) float64    polar-stereographic cell-centre coords [m]
  plus provenance attrs. Run from the repo root:
  python tools/derive_ocean_mask.py [quicklook_dir]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np


def derive(quicklook_dir: str, out_path: str) -> dict:
    import h5py

    files = sorted(glob.glob(os.path.join(quicklook_dir, "*_quicklook.nc")))
    if not files:
        raise FileNotFoundError(f"no quicklook files under {quicklook_dir}")
    mask = None
    for path in files:
        with h5py.File(path, "r") as f:
            fb = f["radar_freeboard"][...]
        finite = np.isfinite(fb) & (fb > -9000)  # some files use fill values
        mask = finite if mask is None else (mask | finite)
    # cell-centre coords of the production grid: 320 bins over [0, 8e6] m
    # (read_and_bin.py:48-49), shifted to the projection's centred frame the
    # framework uses (data.synthetic/_grid_coords convention)
    n = mask.shape[0]
    step = 8e6 / n
    coords = (np.arange(n) + 0.5) * step - 4e6
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(
        out_path,
        mask=mask,
        x=coords,
        y=coords,
        source=np.bytes_(
            "union of finite radar_freeboard over the reference's 232 "
            "QuickLook Data NetCDFs (max winter ice extent 2018-2019)"
        ),
        n_files=np.int64(len(files)),
    )
    return {"files": len(files), "ocean_cells": int(mask.sum())}


if __name__ == "__main__":
    qdir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/QuickLook Data"
    out = os.path.join(
        os.path.dirname(__file__), os.pardir, "optimalinterpolation_tpu",
        "data", "static", "ocean_mask_25km.npz",
    )
    print(derive(qdir, os.path.normpath(out)))
