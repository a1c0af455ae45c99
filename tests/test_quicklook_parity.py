"""IO parity against the reference's shipped quicklook NetCDF products.

These are the only binary artifacts the reference publishes (232 daily
files); reading one with our h5py-based reader and pinning its known
statistics (SURVEY.md section 6) validates schema compatibility in the
direction that matters: a user of the reference data can open it with this
framework. Skipped when the reference tree is not mounted.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/QuickLook Data/CS2S3_20190128_25km_quicklook.nc"


pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference quicklook data not mounted"
)


def test_read_reference_quicklook():
    from optimalinterpolation_tpu.io.quicklook import read_quicklook

    q = read_quicklook(REF)
    assert q.radar_freeboard.shape == (320, 320)
    assert q.lat.shape == (320, 320) and q.lon.shape == (320, 320)
    fb = q.radar_freeboard
    finite = np.isfinite(fb)
    # SURVEY.md section 6: 17,697 finite cells; fb in [-0.100, 0.449] m,
    # mean 0.0975; uncertainty in [0.006, 0.316] m
    assert finite.sum() == 17697
    np.testing.assert_allclose(np.nanmin(fb), -0.100, atol=5e-4)
    np.testing.assert_allclose(np.nanmax(fb), 0.449, atol=5e-4)
    np.testing.assert_allclose(np.nanmean(fb), 0.0975, atol=5e-4)
    # NB: the reference product has cells with finite freeboard but NaN
    # uncertainty — a real data quirk worth knowing about.
    un = q.uncertainty[finite]
    un = un[np.isfinite(un)]
    assert un.size > 15000 and (un > 0).all() and un.max() < 0.35
    # latitudes cover the pan-Arctic domain poleward of ~55N
    assert np.nanmin(q.lat) > 30 and np.nanmax(q.lat) <= 90.01


def test_roundtrip_matches_reference_schema(tmp_path):
    """Write with our writer, read the reference file and ours with the same
    reader — same variables, dtypes, and value semantics."""
    from optimalinterpolation_tpu.io.quicklook import (
        QuicklookField,
        read_quicklook,
        write_quicklook,
    )

    ref = read_quicklook(REF)
    out = str(tmp_path / "ours.nc")
    write_quicklook(
        QuicklookField(
            date="20190128",
            lat=ref.lat,
            lon=ref.lon,
            radar_freeboard=ref.radar_freeboard,
            uncertainty=ref.uncertainty,
        ),
        out,
    )
    ours = read_quicklook(out)
    np.testing.assert_array_equal(ours.radar_freeboard, ref.radar_freeboard)
    np.testing.assert_array_equal(ours.lat, ref.lat)
    assert ours.date == "20190128"


def test_projection_matches_reference_grid():
    """Our dependency-free polar-stereographic projection reproduces the
    reference production grid's lat/lon to 2e-12 degrees (the reference files
    are [iy, ix]-oriented; internal grids are [ix, iy])."""
    from optimalinterpolation_tpu.data.projection import north_polar_grid
    from optimalinterpolation_tpu.io.quicklook import read_quicklook

    q = read_quicklook(REF)
    gx, gy, lon, lat = north_polar_grid(25)
    np.testing.assert_allclose(lat.T, q.lat, atol=1e-9)
    dlon = np.abs((lon.T - q.lon + 180) % 360 - 180)
    assert np.nanmax(dlon) < 1e-9
