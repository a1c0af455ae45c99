"""Batched (vmapped) exact-GP predict over buckets of cells.

Companion to :mod:`optimalinterpolation_tpu.models.exact_gp`: the per-cell
``predict`` vmapped over a padded bucket, with per-cell hyperparameters and
per-cell prior means — covering both reference predict paths:
  * pass-1 (freshly optimized hypers, ``GPR3D(opt=True)``,
    ``/root/reference/2021_paper_production/GPR_CS2S3.py:165-184``), and
  * pass-2 (externally supplied smoothed hypers, ``GPR3D(opt=False)``,
    ``GPR_CS2S3.py:169-186``) — the quicklook production path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from optimalinterpolation_tpu.models import exact_gp
from optimalinterpolation_tpu.ops import kernels as K

__all__ = ["predict_batch"]


@partial(jax.jit, static_argnames=("kind",))
def _predict_batch_xla(
    log_hypers, x, y, xstar, mask, mean,
    kind: K.Kernel = K.Kernel.MATERN32,
    jitter: float = 0.0,
) -> exact_gp.PredictResult:
    def one(lh, xi, yi, xsi, mi, mni):
        r = exact_gp.predict(lh, xi, yi, xsi[None, :], mi, mni, kind=kind, jitter=jitter)
        return exact_gp.PredictResult(
            mean=r.mean[0], std=r.std[0], lZ=r.lZ, prior_std=r.prior_std[0], ok=r.ok
        )

    return jax.vmap(one)(log_hypers, x, y, xstar, mask, mean)


def predict_batch(
    log_hypers: jax.Array,  # (B, 5)
    x: jax.Array,  # (B, N, 3)
    y: jax.Array,  # (B, N) raw observations (uncentered)
    xstar: jax.Array,  # (B, 3)
    mask: jax.Array,  # (B, N)
    mean: jax.Array,  # (B,) per-cell prior mean
    kind: K.Kernel = K.Kernel.MATERN32,
    jitter: float = 0.0,
    backend: str = "auto",
) -> exact_gp.PredictResult:
    """Batched posterior predict; fused Pallas kernel on TPU when the bucket
    size supports it (``ops.pallas_gp.gp_predict``), vmapped XLA otherwise.
    """
    from optimalinterpolation_tpu.ops import pallas_gp

    n = x.shape[1]
    if backend == "auto":
        if jax.default_backend() == "tpu" and x.dtype == jnp.float32:
            if pallas_gp.supported(n):
                backend = "pallas"
            elif n % 128 == 0:
                backend = "blocked"
            else:
                backend = "xla"
        else:
            backend = "xla"
    if backend == "blocked":
        from optimalinterpolation_tpu.ops import blocked_gp

        m, s, lz, ps, ok = blocked_gp.gp_predict_blocked(
            log_hypers, x, y, xstar, mask, mean, kind=kind, jitter=jitter
        )
        return exact_gp.PredictResult(mean=m, std=s, lZ=lz, prior_std=ps, ok=ok)
    if backend == "pallas":
        interp = jax.default_backend() != "tpu"
        m, s, lz, ps, ok = pallas_gp.gp_predict(
            log_hypers, x, y, xstar, mask, mean,
            kind=kind, jitter=jitter, interpret=interp,
        )
        return exact_gp.PredictResult(mean=m, std=s, lZ=lz, prior_std=ps, ok=ok)
    return _predict_batch_xla(
        log_hypers, x, y, xstar, mask, mean, kind=kind, jitter=jitter
    )
