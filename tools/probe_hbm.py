"""Static HBM probe for the blocked-optimize executables (no execution).

ADVICE r1 (medium): `_MEM_BUFFERS_BLOCKED` was probed empirically against
the pre-factor-reuse program structure; the factor-reuse line search now
carries each trial's factorization (O(N^2)/cell) through the while_loop, so
the live set may have grown. This probe AOT-compiles the actual L-BFGS
segment executable (`_lbfgs_sweep_impl`) for the production shapes and
prints XLA's own memory analysis (`temp` = peak on-device workspace) — the
authoritative live-set number, with zero device seconds spent.

Run on the real TPU:  python tools/probe_hbm.py [N B [N B ...]]
Defaults: the shapes `pipeline.daily._chunk_rows` emits on a 16 GB v5e for
the blocked-optimize path at N=4096/2048/1024 plus the headroom cases from
the round-1 probe (N=4096 B=48, N=2048 B=192).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oi_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def probe(n: int, b: int) -> dict:
    from optimalinterpolation_tpu.models import optimizer as O
    from optimalinterpolation_tpu.ops import kernels as K

    knobs = O._Knobs.of(
        O.OptimizeConfig(backend="blocked", max_iters=10), jnp.float32
    )
    h0 = jnp.zeros((b, 5), jnp.float32)
    x = jnp.zeros((b, n, 3), jnp.float32)
    y = jnp.zeros((b, n), jnp.float32)
    mask = jnp.ones((b, n), jnp.float32)
    state = O._blank_state(h0)
    lowered = O._lbfgs_sweep_impl.lower(
        state, x, y, mask, jnp.asarray(True), knobs,
        jnp.asarray(10, jnp.int32),
        kind=K.Kernel.MATERN32, jitter=0.0, backend="blocked",
    )
    mem = lowered.compile().memory_analysis()
    gib = 1024.0**3
    return {
        "n": n,
        "b": b,
        "temp_gib": round(mem.temp_size_in_bytes / gib, 3),
        "args_gib": round(mem.argument_size_in_bytes / gib, 3),
        "out_gib": round(mem.output_size_in_bytes / gib, 3),
        # peak live set as XLA accounts it (args may alias outputs)
        "peak_gib": round(
            (mem.temp_size_in_bytes + mem.argument_size_in_bytes
             + mem.output_size_in_bytes) / gib, 3),
        "nn_buffers_equiv": round(
            mem.temp_size_in_bytes / (b * n * n * 4), 2),
    }


def main() -> None:
    shapes = []
    argv = sys.argv[1:]
    if argv:
        it = iter(argv)
        shapes = [(int(a), int(next(it))) for a in it]
    else:
        shapes = [(4096, 48), (2048, 192), (1024, 192), (1024, 384)]
    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}")
    for n, b in shapes:
        r = probe(n, b)
        print(r)


if __name__ == "__main__":
    main()
