"""Whole-flow f64 parity: `interpolate_daily` vs the NumPy reference port.

The strongest available end-to-end oracle (VERDICT r1 item 4): every field
of the reference 15-key daily dict, produced by the production pipeline
(`pipeline/daily.interpolate_daily`) in float64 with trajectory shortcuts
off, pinned against `tests/reference_flow.run_reference_flow` — a pure
NumPy/SciPy two-pass port of `GPR_CS2S3.py:201-336` semantics (flatten ->
per-cell scipy-CG optimize -> assemble -> smooth -> opt=False re-predict).

The fixture truth is an exact Matern-3/2 GP draw, so every cell's MLL has a
sharply identified interior optimum and two independent optimizers (our
batched L-BFGS, scipy CG) land on the SAME point — the comparison then
tests FLOW semantics (masking, prior centering, smoothing order, pass-2
lookup), not optimizer trajectories.
"""

from __future__ import annotations

import numpy as np
import pytest

from .reference_flow import HYPER_NAMES, make_tiny_dataset, run_reference_flow

# Per-field absolute tolerances. Endpoint log-hyper gaps between the two
# optimizers measure <= 5e-6 (median 1e-7) on this fixture; predictions are
# quadratically insensitive to hyper error near the optimum. VERDICT asked
# predictions atol <= 1e-4 m; we pin 20x tighter.
ATOL = {
    "interp": 5e-6,          # m
    "interp_error": 5e-6,    # m
    "interp_smth": 5e-6,     # m
    "interp_error_smth": 5e-6,
    "lZ": 5e-4,              # nats; dNLL ~ quadratic but lZ is O(100)
    "ell_x": 50.0,           # m (lengthscales are O(2.5e5) m) ~ rtol 2e-4
    "ell_y": 50.0,
    "ell_t": 1e-3,           # days
    "sf2": 1e-7,
    "sn2": 1e-7,
    "ell_x_smth": 50.0,
    "ell_y_smth": 50.0,
    "ell_t_smth": 1e-3,
    "sf2_smth": 1e-7,
    "sn2_smth": 1e-7,
}


@pytest.fixture(scope="module")
def flows():
    import jax.numpy as jnp  # noqa: F401  (x64 enabled by conftest)

    from optimalinterpolation_tpu.models.optimizer import OptimizeConfig
    from optimalinterpolation_tpu.pipeline.daily import (
        DailyConfig,
        interpolate_daily,
    )

    ds = make_tiny_dataset()
    prior = 0.2
    ref = run_reference_flow(ds, 0, prior_mean=prior)

    cfg = DailyConfig(
        dtype="float64",
        # Trajectory shortcuts off: both flows must run every cell from the
        # reference x0 to its own converged endpoint.
        spatial_seed_stride=0,
        warmstart_n=0,
        # Shape-stable batching: batch_multiple >= the cell count keeps
        # segment compaction from changing the batch shape, so the whole
        # optimization reuses ONE compiled executable (~45 s f64 CPU compile
        # each); segment draining still stops converged cells' work early.
        batch_multiple=64,
        opt_segment_iters=50,
        opt=OptimizeConfig(backend="xla", grad_tol=1e-7, max_iters=150),
    )
    res = interpolate_daily(ds, 0, prior_mean=prior, config=cfg)
    return ref, res.to_reference_dict(), res.date


def test_all_fifteen_fields_match(flows):
    ref, ours, date = flows
    assert set(ref) == set(ours)
    assert len(ref) == 15
    failures = []
    for suffix, atol in ATOL.items():
        key = f"{date}_{suffix}"
        a, b = ref[key], ours[key]
        # NaN patterns must agree exactly (no-neighbor cells, masked ocean).
        if not (np.isfinite(a) == np.isfinite(b)).all():
            failures.append(f"{suffix}: NaN pattern mismatch")
            continue
        both = np.isfinite(a)
        gap = np.abs(a[both] - b[both]).max() if both.any() else 0.0
        if gap > atol:
            failures.append(f"{suffix}: max|diff|={gap:.3e} > atol={atol:g}")
    assert not failures, "\n".join(failures)


def test_smoothing_and_pass2_semantics_isolated(flows):
    """Pin smoothing + the opt=False pass-2 lookup in ISOLATION from the
    optimizer: feed the PIPELINE's pass-1 hyper fields into the NumPy port
    (pass1_hypers=...) and require the smoothed hypers and re-predictions to
    match at float-noise level — any gap here is a flow-semantics bug
    (smoothing order, vmax clips, zeros->mean, lookup indexing), not an
    optimization difference."""
    _, ours, date = flows
    ds = make_tiny_dataset()
    ref2 = run_reference_flow(
        ds, 0, prior_mean=0.2,
        pass1_hypers={n: ours[f"{date}_{n}"] for n in HYPER_NAMES},
    )
    for suffix in [f"{n}_smth" for n in HYPER_NAMES] + [
        "interp_smth", "interp_error_smth",
    ]:
        a, b = ref2[f"{date}_{suffix}"], ours[f"{date}_{suffix}"]
        assert (np.isfinite(a) == np.isfinite(b)).all(), suffix
        both = np.isfinite(a)
        np.testing.assert_allclose(
            a[both], b[both], atol=1e-10, rtol=1e-9, err_msg=suffix
        )
