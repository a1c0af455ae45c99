"""Tests for the batched Nystrom optimizer backend (ops.nystroem_gp).

The production pipeline optimizes the largest neighborhood buckets against
the rank-M Nystrom marginal likelihood (the reference's own large-n device:
``GP_example.ipynb`` cell-5, ``SMLII(approx=True)``) while predicting
exactly. These tests pin, in float64 on CPU:

  1. the custom-VJP of the blocked factor-and-invert against jax autodiff
     through a plain-jnp Cholesky (the backward-pass math);
  2. the batched masked NLL value AND gradient against a dense
     naive-Woodbury oracle of the identical objective;
  3. the limit M >= n_valid -> exact NLL;
  4. padding invariance;
  5. the VERDICT-required parity bound: predictions made with
     Nystrom-optimized hypers vs exact-objective hypers.
"""

import jax
import jax.numpy as jnp
import numpy as np

from optimalinterpolation_tpu.models import exact_gp
from optimalinterpolation_tpu.models.optimizer import (
    OptimizeConfig,
    optimize_mll_batch,
)
from optimalinterpolation_tpu.ops import nystroem_gp
from optimalinterpolation_tpu.ops.kernels import Kernel

X0 = np.log([25e3, 25e3, 1.0, 1.0, 0.1])


def _problem(rng, b=3, n=256, n_valid=None, ell=(1.5e5, 1.2e5, 2.0)):
    """Valid points first (so tests can slice the valid block statically)."""
    x = rng.uniform(-3e5, 3e5, size=(b, n, 3))
    x[..., 2] = rng.uniform(0, 9, size=(b, n))
    mask = np.zeros((b, n))
    nv = n_valid or n
    mask[:, :nv] = 1.0
    # correlated targets so the MLL landscape is non-trivial
    y = (
        0.1 * np.sin(x[..., 0] / ell[0])
        + 0.05 * np.cos(x[..., 1] / ell[1])
        + 0.03 * rng.standard_normal((b, n))
    )
    h = np.tile(np.log([2.0e5, 2.0e5, 2.0, 0.02, 0.002]), (b, 1))
    h += 0.1 * rng.standard_normal((b, 5))
    return jnp.asarray(h), jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)


# ---------------------------------------------------------------------------
# 1. chol_inv custom VJP vs autodiff through plain-jnp Cholesky
# ---------------------------------------------------------------------------


def test_chol_inv_vjp_matches_autodiff(rng):
    b, m = 2, 256  # 256 exercises the panel recursion path
    p0 = jnp.asarray(rng.standard_normal((b, m, m)) / np.sqrt(m))
    cl = jnp.asarray(rng.standard_normal((b, m, m)))
    cw = jnp.asarray(rng.standard_normal((b, m, m)))
    cd = jnp.asarray(rng.standard_normal((b,)))

    def build_a(p):
        sym = p + jnp.swapaxes(p, 1, 2)
        return (
            jnp.einsum("bij,bkj->bik", sym, sym)
            + 2.0 * jnp.eye(m, dtype=p.dtype)[None]
        )

    def loss_ours(p):
        l, w, logdet, _ = nystroem_gp.chol_inv(build_a(p))
        return jnp.sum(cl * l) + jnp.sum(cw * w) + jnp.sum(cd * logdet)

    def loss_ref(p):
        a = build_a(p)
        l = jnp.linalg.cholesky(a)
        eye = jnp.broadcast_to(jnp.eye(m, dtype=p.dtype)[None], a.shape)
        w = jax.vmap(
            lambda li, ei: jax.scipy.linalg.solve_triangular(li, ei, lower=True)
        )(l, eye)
        logdet = jnp.sum(jnp.log(jnp.diagonal(l, axis1=1, axis2=2)), axis=1)
        return jnp.sum(cl * l) + jnp.sum(cw * w) + jnp.sum(cd * logdet)

    v_ours, g_ours = jax.value_and_grad(loss_ours)(p0)
    v_ref, g_ref = jax.value_and_grad(loss_ref)(p0)
    np.testing.assert_allclose(float(v_ours), float(v_ref), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_ref), rtol=1e-9, atol=1e-11
    )


# ---------------------------------------------------------------------------
# 2. NLL value + gradient vs a dense naive-Woodbury oracle
# ---------------------------------------------------------------------------


def _oracle_nll(h, x, y, mask, mi, jitter):
    """Same objective, built densely on the valid block (valid-first masks)."""
    from optimalinterpolation_tpu.ops import kernels as K

    nv = int(mask.sum())
    ell = jnp.exp(h[:3])
    sf2 = jnp.exp(h[3])
    sn2 = jnp.exp(h[4])
    xv, yv = x[:nv], y[:nv]
    xm = x[:mi]
    kmm = K.kernel_matrix(xm, ell, sf2) + (
        nystroem_gp._MM_JITTER * sf2
    ) * jnp.eye(mi, dtype=x.dtype)
    knm = K.cross_kernel(xv, xm, ell, sf2)
    ktil = knm @ jnp.linalg.solve(kmm, knm.T)
    d = sn2 + jitter * sf2
    a = ktil + d * jnp.eye(nv, dtype=x.dtype)
    l = jnp.linalg.cholesky(a)
    z = jax.scipy.linalg.solve_triangular(l, yv, lower=True)
    return (
        0.5 * jnp.sum(z * z)
        + jnp.sum(jnp.log(jnp.diagonal(l)))
        + 0.5 * nv * np.log(2 * np.pi)
    )


def test_nll_and_grad_match_dense_oracle(rng):
    mi = 128
    h, x, y, mask = _problem(rng, b=3, n=384, n_valid=300)
    jitter = 1e-6
    nll = nystroem_gp.gp_nll_nystroem(h, x, y, mask, mi, jitter=jitter)
    nll2, grad = nystroem_gp.gp_nll_and_grad_nystroem(
        h, x, y, mask, mi, jitter=jitter
    )
    np.testing.assert_allclose(np.asarray(nll), np.asarray(nll2), rtol=1e-13)
    for i in range(3):
        o, go = jax.value_and_grad(_oracle_nll)(
            h[i], x[i], y[i], mask[i], mi, jitter
        )
        np.testing.assert_allclose(float(nll[i]), float(o), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(grad[i]), np.asarray(go), rtol=1e-7, atol=1e-9
        )


def test_padding_invariance(rng):
    mi = 128
    h, x, y, mask = _problem(rng, b=2, n=256, n_valid=200)
    xb = jnp.concatenate([x, jnp.zeros((2, 128, 3), x.dtype)], axis=1)
    yb = jnp.concatenate([y, jnp.zeros((2, 128), y.dtype)], axis=1)
    mb = jnp.concatenate([mask, jnp.zeros((2, 128), mask.dtype)], axis=1)
    a = nystroem_gp.gp_nll_nystroem(h, x, y, mask, mi, jitter=1e-6)
    bigger = nystroem_gp.gp_nll_nystroem(h, xb, yb, mb, mi, jitter=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bigger), rtol=1e-12)


def test_masked_landmarks_match_fewer_landmarks(rng):
    """Rows whose valid count < M: masked landmark slots must drop out
    exactly (identity padding in Amm, zero Phi columns)."""
    h, x, y, mask = _problem(rng, b=2, n=256, n_valid=100)
    # M=128 > n_valid=100: 28 landmark slots are masked
    nll = nystroem_gp.gp_nll_nystroem(h, x, y, mask, 128, jitter=1e-6)
    assert np.all(np.isfinite(np.asarray(nll)))
    # oracle with exactly the 100 valid landmarks
    from optimalinterpolation_tpu.ops import kernels as K

    for i in range(2):
        o = _oracle_nll(h[i], x[i], y[i], mask[i], 100, 1e-6)
        np.testing.assert_allclose(float(nll[i]), float(o), rtol=1e-9)


# ---------------------------------------------------------------------------
# 3. limit M >= n_valid -> exact NLL
# ---------------------------------------------------------------------------


def test_full_rank_limits_to_exact(rng):
    h, x, y, mask = _problem(rng, b=2, n=128, n_valid=128)
    nys = nystroem_gp.gp_nll_nystroem(h, x, y, mask, 128, jitter=1e-6)
    exact = jax.vmap(
        lambda hi, xi, yi, mi: exact_gp.neg_log_marginal_likelihood(
            hi, xi, yi, mi, kind=Kernel.MATERN32, jitter=1e-6
        )
    )(h, x, y, mask)
    # identical up to the O(_MM_JITTER) Kmm regularization
    diff = np.abs(np.asarray(nys) - np.asarray(exact))
    assert np.all(diff < 5e-3 * np.abs(np.asarray(exact)) + 0.5), (
        nys, exact,
    )


# ---------------------------------------------------------------------------
# 5. prediction parity: hypers from the Nystrom objective vs exact
# ---------------------------------------------------------------------------


def test_nystroem_hypers_prediction_parity(rng):
    """Optimize one batch with the exact objective and with the Nystrom
    objective; exact predictions made with either hyper set must agree to
    well under the bench's +-1 mm guard (VERDICT round-1 item 2)."""
    from optimalinterpolation_tpu.models.exact_gp_batch import predict_batch

    b, n, mi = 4, 512, 256
    h0 = jnp.tile(jnp.asarray(X0)[None], (b, 1))
    _, x, y, mask = _problem(rng, b=b, n=n, n_valid=480)
    xstar = jnp.asarray(
        np.concatenate(
            [np.asarray(x[:, :1, :2].mean(axis=1)), np.full((b, 1), 4.5)],
            axis=1,
        )
    )
    kw = dict(max_iters=40, grad_tol=1e-5, jitter=1e-6)
    r_exact = optimize_mll_batch(
        h0, x, y, mask, OptimizeConfig(backend="xla", **kw)
    )
    r_nys = optimize_mll_batch(
        h0, x, y, mask,
        OptimizeConfig(backend="nystroem", nystroem_m=mi, **kw),
    )
    mean = jnp.zeros((b,), x.dtype)
    p_exact = predict_batch(
        r_exact.log_hypers, x, y, xstar, mask, mean, jitter=1e-6
    )
    p_nys = predict_batch(
        r_nys.log_hypers, x, y, xstar, mask, mean, jitter=1e-6
    )
    dm = np.abs(np.asarray(p_exact.mean) - np.asarray(p_nys.mean))
    ds = np.abs(np.asarray(p_exact.std) - np.asarray(p_nys.std))
    assert np.all(np.isfinite(dm))
    assert np.max(dm) < 5e-4, dm  # < 0.5 mm on ~0.1 m freeboards
    assert np.max(ds) < 2e-3, ds
