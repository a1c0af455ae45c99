"""C++ data-plane (native/oi_native.cpp): grid-hash radius neighbors and the
.proc parser vs their SciPy/NumPy oracles. Skipped when no compiler built the
shared library (the framework falls back to the SciPy paths)."""

import numpy as np
import pytest

from optimalinterpolation_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler)"
)


def test_radius_neighbors_matches_kdtree(rng):
    pts = rng.uniform(0, 8e6, (4000, 2))
    cells = rng.uniform(0, 8e6, (300, 2))
    r = 3e5
    off, idx = native.radius_neighbors(
        np.ascontiguousarray(pts), np.ascontiguousarray(cells), r
    )
    from scipy.spatial import cKDTree

    ref = cKDTree(pts).query_ball_point(cells, r=r)
    assert len(off) == len(cells) + 1
    for i in range(len(cells)):
        got = sorted(idx[off[i] : off[i + 1]])
        assert got == sorted(ref[i]), f"cell {i} neighbor mismatch"


def test_radius_neighbors_empty_and_boundary(rng):
    pts = np.array([[0.0, 0.0], [10.0, 0.0]])
    cells = np.array([[100.0, 100.0], [0.0, 0.0], [5.0, 0.0]])
    off, idx = native.radius_neighbors(pts, cells, 5.0)
    assert off[1] - off[0] == 0          # far cell: no neighbors
    assert off[2] - off[1] == 1          # origin: itself only
    assert off[3] - off[2] == 2          # midpoint: both (exactly at r)


def test_parse_proc_matches_genfromtxt(tmp_path, rng):
    rows = rng.normal(size=(50, 6))
    path = tmp_path / "t.proc"
    np.savetxt(path, rows, fmt="%.10g")
    got = native.parse_proc(str(path))
    ref = np.genfromtxt(path)
    np.testing.assert_allclose(got, ref, rtol=1e-9)
