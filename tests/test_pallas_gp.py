"""Fused Pallas GP-NLL kernel vs the XLA/autodiff path (interpret mode).

The kernel computes the masked NLL and its 5 analytic gradients in one pass
(ops/pallas_gp.py); here it runs in Pallas interpret mode on the CPU test
backend in float64, where agreement with jax.grad of the XLA implementation
must be at rounding level (~1e-12), far tighter than any f32 tolerance.
N=128 keeps interpret-mode compile time tolerable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimalinterpolation_tpu.models import exact_gp
from optimalinterpolation_tpu.ops import pallas_gp
from optimalinterpolation_tpu.ops.kernels import Kernel

N = 128


def _problem(rng, b=3, n=N, mask_p=0.85):
    x = rng.uniform(-3e5, 3e5, (b, n, 3)) * np.asarray([1, 1, 1.2e-5])
    y = rng.normal(0.1, 0.05, (b, n))
    mask = (rng.random((b, n)) < mask_p).astype(np.float64)
    h = np.tile(np.log([1.5e5, 2.0e5, 2.0, 0.03, 0.005]), (b, 1))
    h[1] += 0.3
    a = jnp.asarray
    return a(h), a(x), a(y), a(mask)


def _xla_vg(kind=Kernel.MATERN32, jitter=1e-6):
    return jax.vmap(
        jax.value_and_grad(
            lambda hh, xx, yy, mm: exact_gp.neg_log_marginal_likelihood(
                hh, xx, yy, mm, kind=kind, jitter=jitter
            )
        )
    )


def test_value_and_grad_match_autodiff(rng):
    h, x, y, mask = _problem(rng)
    nll_p, grad_p = pallas_gp.gp_nll_and_grad(h, x, y, mask, jitter=1e-6, interpret=True)
    nll_x, grad_x = _xla_vg()(h, x, y, mask)
    np.testing.assert_allclose(np.asarray(nll_p), np.asarray(nll_x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_x), atol=1e-10)
    # value-only variant agrees with the grad variant
    nll_v = pallas_gp.gp_nll(h, x, y, mask, jitter=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(nll_v), np.asarray(nll_p), rtol=1e-13)


@pytest.mark.parametrize("kind", [Kernel.MATERN12, Kernel.MATERN52, Kernel.SE])
def test_all_kernel_families(rng, kind):
    h, x, y, mask = _problem(rng, b=2)
    nll_p, grad_p = pallas_gp.gp_nll_and_grad(
        h, x, y, mask, kind=kind, jitter=1e-6, interpret=True
    )
    nll_x, grad_x = _xla_vg(kind=kind)(h, x, y, mask)
    np.testing.assert_allclose(np.asarray(nll_p), np.asarray(nll_x), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_x), atol=1e-9)


def test_tile_padding_rows_are_isolated(rng):
    """b=3 pads to a tile of 8; padded rows must not change real outputs."""
    h, x, y, mask = _problem(rng, b=3)
    n3, g3 = pallas_gp.gp_nll_and_grad(h, x, y, mask, jitter=1e-6, interpret=True)
    h1, x1, y1, m1 = h[:1], x[:1], y[:1], mask[:1]
    n1, g1 = pallas_gp.gp_nll_and_grad(h1, x1, y1, m1, jitter=1e-6, interpret=True)
    np.testing.assert_allclose(float(n3[0]), float(n1[0]), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(g3[0]), np.asarray(g1[0]), rtol=1e-10)


def test_optimizer_pallas_backend_matches_xla(rng):
    """Full batched L-BFGS through the pallas backend == xla backend (f64)."""
    from optimalinterpolation_tpu.models.optimizer import (
        OptimizeConfig,
        optimize_mll_batch,
    )

    h, x, y, mask = _problem(rng, b=2)
    cfg_p = OptimizeConfig(max_iters=12, jitter=1e-6, backend="pallas")
    cfg_x = OptimizeConfig(max_iters=12, jitter=1e-6, backend="xla")
    rp = optimize_mll_batch(h, x, y, mask, cfg_p)
    rx = optimize_mll_batch(h, x, y, mask, cfg_x)
    np.testing.assert_allclose(
        np.asarray(rp.nll), np.asarray(rx.nll), rtol=1e-8,
        err_msg="pallas-backend optimization diverged from xla backend",
    )
    np.testing.assert_allclose(
        np.asarray(rp.log_hypers), np.asarray(rx.log_hypers), atol=1e-5
    )


def test_fused_predict_matches_xla(rng):
    """gp_predict (fused) == exact_gp.predict (vmapped XLA) in f64 interpret."""
    from optimalinterpolation_tpu.models.exact_gp_batch import _predict_batch_xla
    from optimalinterpolation_tpu.ops.pallas_gp import gp_predict

    h, x, y, mask = _problem(rng, b=3)
    xs = jnp.asarray(
        np.random.default_rng(5).uniform(-1e5, 1e5, (3, 3)) * np.asarray([1, 1, 0])
        + np.asarray([0.0, 0.0, 4.0])
    )
    mean = jnp.full((3,), 0.15)
    m_, s_, lz_, ps_, ok_ = gp_predict(
        h, x, y, xs, mask, mean, jitter=1e-6, interpret=True
    )
    r = _predict_batch_xla(h, x, y, xs, mask, mean, jitter=1e-6)
    np.testing.assert_allclose(np.asarray(m_), np.asarray(r.mean), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_), np.asarray(r.std), atol=1e-12)
    np.testing.assert_allclose(np.asarray(lz_), np.asarray(r.lZ), rtol=1e-12)
    assert np.asarray(ok_).all()


def test_blocked_backend_matches_xla(rng):
    """Block-tensor large-N path (ops.blocked_gp) == XLA autodiff in f64."""
    from optimalinterpolation_tpu.ops import blocked_gp

    # n=384 -> nb=3 blocks: exercises the multi-column history contractions
    # of the left-looking Cholesky and the triangle K^-1 assembly (nb=2 has
    # degenerate k-ranges).
    h, x, y, mask = _problem(rng, b=2, n=384)
    nb_, gb_ = blocked_gp.gp_nll_and_grad_blocked(h, x, y, mask, jitter=1e-6)
    nx, gx = _xla_vg()(h, x, y, mask)
    np.testing.assert_allclose(np.asarray(nb_), np.asarray(nx), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gb_), np.asarray(gx), atol=1e-10)

    nv = blocked_gp.gp_nll_blocked(h, x, y, mask, jitter=1e-6)
    np.testing.assert_allclose(np.asarray(nv), np.asarray(nb_), rtol=1e-13)

    # Factor-reuse split (the optimizer's line-search path): value+factors
    # followed by grad-from-factors must match the composed evaluation (same
    # math; last-ulp differences allowed — the composed path compiles as one
    # fused program, the split calls here run op-by-op).
    nf, factors = blocked_gp.gp_nll_blocked_with_factors(h, x, y, mask, jitter=1e-6)
    gf = blocked_gp.gp_grad_blocked_from_factors(
        h, x, y, mask, factors, jitter=1e-6
    )
    np.testing.assert_allclose(np.asarray(nf), np.asarray(nb_), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gb_), rtol=1e-10, atol=1e-11)

    from optimalinterpolation_tpu.models.exact_gp_batch import _predict_batch_xla

    xs = jnp.asarray(
        np.random.default_rng(5).uniform(-1e5, 1e5, (2, 3)) * np.asarray([1, 1, 0])
        + np.asarray([0.0, 0.0, 4.0])
    )
    mean = jnp.full((2,), 0.15)
    m_, s_, lz_, ps_, ok_ = blocked_gp.gp_predict_blocked(
        h, x, y, xs, mask, mean, jitter=1e-6
    )
    r = _predict_batch_xla(h, x, y, xs, mask, mean, jitter=1e-6)
    np.testing.assert_allclose(np.asarray(m_), np.asarray(r.mean), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_), np.asarray(r.std), atol=1e-12)
    assert np.asarray(ok_).all()


def test_blocked_panel_path_matches_xla(rng):
    """n=2048 routes through the 512-wide panel factorization
    (blocked_gp._panel_size): panel Cholesky + recursive diagonal factor +
    re-blocked T must still match the f64 autodiff oracle."""
    from optimalinterpolation_tpu.ops import blocked_gp

    assert blocked_gp._panel_size(2048) == blocked_gp.PANEL
    h, x, y, mask = _problem(rng, b=2, n=2048)
    nb_, gb_ = blocked_gp.gp_nll_and_grad_blocked(h, x, y, mask, jitter=1e-6)
    nx, gx = _xla_vg()(h, x, y, mask)
    np.testing.assert_allclose(np.asarray(nb_), np.asarray(nx), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(gb_), np.asarray(gx), atol=1e-9)

    from optimalinterpolation_tpu.models.exact_gp_batch import _predict_batch_xla

    xs = jnp.asarray(
        np.random.default_rng(5).uniform(-1e5, 1e5, (2, 3)) * np.asarray([1, 1, 0])
        + np.asarray([0.0, 0.0, 4.0])
    )
    mean = jnp.full((2,), 0.15)
    m_, s_, lz_, ps_, ok_ = blocked_gp.gp_predict_blocked(
        h, x, y, xs, mask, mean, jitter=1e-6
    )
    r = _predict_batch_xla(h, x, y, xs, mask, mean, jitter=1e-6)
    np.testing.assert_allclose(np.asarray(m_), np.asarray(r.mean), atol=1e-11)
    np.testing.assert_allclose(np.asarray(s_), np.asarray(r.std), atol=1e-11)
    assert np.asarray(ok_).all()
