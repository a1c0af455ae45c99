"""Neighborhood gather: equivalence with a brute-force radius query."""

import numpy as np

from optimalinterpolation_tpu.data.neighbors import gather_neighborhoods
from optimalinterpolation_tpu.data.window import TrainingVectors


def _vectors(rng, n=500):
    return TrainingVectors(
        x=rng.uniform(0, 1e6, n),
        y=rng.uniform(0, 1e6, n),
        t=rng.integers(0, 9, n).astype(float),
        z=rng.normal(0.1, 0.05, n),
    )


def test_gather_covers_exactly_the_radius(rng):
    tv = _vectors(rng)
    cells = rng.uniform(2e5, 8e5, size=(20, 2))
    radius = 1.5e5
    batches = gather_neighborhoods(tv, cells, t_star=4.0, radius_m=radius,
                                   buckets=(64, 256, 1024), dtype=np.float64)

    seen_cells = set()
    for b in batches:
        for r in range(len(b)):
            ci = b.cell_index[r]
            if ci < 0:
                assert b.mask[r].sum() == 0
                continue
            seen_cells.add(int(ci))
            got = b.mask[r].astype(bool)
            pts = b.x[r][got]
            # every gathered point is inside the radius
            d = np.hypot(pts[:, 0] - cells[ci, 0], pts[:, 1] - cells[ci, 1])
            assert (d <= radius + 1e-6).all()
            # count matches brute force
            bf = np.hypot(tv.x - cells[ci, 0], tv.y - cells[ci, 1]) <= radius
            assert got.sum() == bf.sum()
            # values agree as a multiset
            np.testing.assert_allclose(
                np.sort(b.z[r][got]), np.sort(tv.z[bf]), rtol=1e-12
            )
            # test input is the cell itself at t_star
            np.testing.assert_allclose(b.xstar[r], [*cells[ci], 4.0])
    assert seen_cells == set(range(20))


def test_batch_multiple_padding(rng):
    tv = _vectors(rng, n=200)
    cells = rng.uniform(2e5, 8e5, size=(5, 2))
    batches = gather_neighborhoods(
        tv, cells, t_star=4.0, radius_m=2e5, buckets=(64, 4096), batch_multiple=8
    )
    for b in batches:
        assert len(b) % 8 == 0


def test_oversize_keeps_nearest(rng):
    tv = _vectors(rng, n=300)
    cells = np.array([[5e5, 5e5]])
    # bucket cap of 16 forces truncation
    (b,) = gather_neighborhoods(tv, cells, t_star=4.0, radius_m=5e5, buckets=(16,))
    got = b.mask[0].astype(bool)
    assert got.sum() == 16
    d_all = np.sort(np.hypot(tv.x - 5e5, tv.y - 5e5))
    d_got = np.sort(np.hypot(b.x[0][got, 0] - 5e5, b.x[0][got, 1] - 5e5))
    np.testing.assert_allclose(d_got, d_all[:16], rtol=1e-6)


def test_bucket_128_routing_is_semantically_noop(rng):
    """OI_BUCKET_128 is a launch-economics knob only: the same cells routed
    to a 128-capacity bucket vs padded into 256 must optimize to the same
    hypers (masked identity-padding makes every per-row quantity independent
    of bucket capacity). The reference never pads (GPR_CS2S3.py:159-161)."""
    import jax.numpy as jnp

    from optimalinterpolation_tpu.models.exact_gp import HYPER_INIT_LOG
    from optimalinterpolation_tpu.models.optimizer import (
        OptimizeConfig,
        optimize_mll_batch,
    )

    tv = _vectors(rng, n=400)
    cells = rng.uniform(2e5, 8e5, size=(6, 2))
    radius = 1.2e5  # ~40-90 neighbors per cell: all fit in a 128 bucket
    outs = {}
    for buckets in ((128, 256, 4096), (256, 4096)):
        batches = gather_neighborhoods(
            tv, cells, t_star=4.0, radius_m=radius, buckets=buckets,
            dtype=np.float64, batch_multiple=2,
        )
        assert batches[0].capacity == buckets[0]
        b = batches[0]
        h0 = jnp.tile(HYPER_INIT_LOG(1e5, dtype=jnp.float64)[None], (len(b), 1))
        res = optimize_mll_batch(
            h0, jnp.asarray(b.x), jnp.asarray(b.z - 0.1 * b.mask),
            jnp.asarray(b.mask),
            OptimizeConfig(backend="xla", max_iters=25),
        )
        lh = np.asarray(res.log_hypers)
        outs[buckets[0]] = {
            int(ci): lh[r] for r, ci in enumerate(b.cell_index) if ci >= 0
        }
    assert set(outs[128]) == set(outs[256]) == set(range(6))
    for ci in outs[128]:
        np.testing.assert_allclose(outs[128][ci], outs[256][ci], rtol=1e-9)
