"""Static HBM probe for the blocked-optimize executables (no execution).

ADVICE r1 (medium): `_MEM_BUFFERS_BLOCKED` was probed empirically against
the pre-factor-reuse program structure; the factor-reuse line search now
carries each trial's factorization (O(N^2)/cell) through the while_loop, so
the live set may have grown. This probe AOT-compiles the actual L-BFGS
segment executable (`_lbfgs_sweep_impl`) for the production shapes and
prints XLA's own memory analysis (`temp` = peak on-device workspace) — the
authoritative live-set number, with zero device seconds spent.

Round 2 extends it to the Nystrom-objective sweep (backend "nystroem:M",
probed per (N, B, M)) and the predict executable — the 0.25-scale bench
economics showed launch count dominating wall (eff 0.13 TFLOP/s vs ~22
sustained), and launch tiles are sized by these conservative buffer models.

Run on the real TPU:  python tools/probe_hbm.py [N B M [N B M ...]]
(M=0 probes the blocked objective, M>0 the Nystrom:M objective;
``predict N B`` probes the predict executable instead).
Defaults: the shapes `pipeline.daily._chunk_rows` emits on a 16 GB v5e for
the blocked-optimize path at N=4096/2048/1024 plus the headroom cases from
the round-1 probe (N=4096 B=48, N=2048 B=192), the Nystrom sweep at the
current and next-tile-size batch, and the large-bucket predict tiles.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oi_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _mem_report(n: int, b: int, mem, unit_bytes: float, tag: str) -> dict:
    gib = 1024.0**3
    return {
        "probe": tag,
        "n": n,
        "b": b,
        "temp_gib": round(mem.temp_size_in_bytes / gib, 3),
        "args_gib": round(mem.argument_size_in_bytes / gib, 3),
        "out_gib": round(mem.output_size_in_bytes / gib, 3),
        # peak live set as XLA accounts it (args may alias outputs)
        "peak_gib": round(
            (mem.temp_size_in_bytes + mem.argument_size_in_bytes
             + mem.output_size_in_bytes) / gib, 3),
        # temp in units of the pipeline memory model's per-cell buffer
        # ((N,N) f32 for blocked/predict, (N,M) f32 for nystroem)
        "buffers_equiv": round(mem.temp_size_in_bytes / (b * unit_bytes), 2),
    }


def probe(n: int, b: int, m: int = 0) -> dict:
    from optimalinterpolation_tpu.models import optimizer as O
    from optimalinterpolation_tpu.ops import kernels as K

    backend = f"nystroem:{m}" if m else "blocked"
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
        kind=K.Kernel.MATERN32, jitter=0.0, backend=backend,
    )
    mem = lowered.compile().memory_analysis()
    unit = (n * m if m else n * n) * 4.0
    r = _mem_report(n, b, mem, unit, backend)
    # Guard the pipeline's chunk memory model (ADVICE r4): flag any probe
    # whose measured live set reaches the model constant that sizes
    # production launch tiles — a kernel change that grows the live set must
    # surface HERE (model_ok=False) instead of as an on-device OOM.
    from optimalinterpolation_tpu.pipeline import daily as D

    if m:
        # model: (_MEM_BUFFERS_NYSTROEM * n * m + 4 m^2) f32 per cell;
        # the 4 m^2 term is (4 m / n) in (n, m)-buffer units
        budget = D._MEM_BUFFERS_NYSTROEM + 4.0 * m / n
    else:
        budget = D._MEM_BUFFERS_BLOCKED
    r["model_budget"] = round(budget, 2)
    r["model_ok"] = bool(r["buffers_equiv"] <= budget)
    return r


def probe_predict(n: int, b: int) -> dict:
    """The blocked predict executable (the path the pipeline's predict and
    pass-2 launches take for N >= 512 on TPU)."""
    from optimalinterpolation_tpu.ops import blocked_gp

    lh = jnp.zeros((b, 5), jnp.float32)
    x = jnp.zeros((b, n, 3), jnp.float32)
    z = jnp.zeros((b, n), jnp.float32)
    xs = jnp.zeros((b, 3), jnp.float32)
    mask = jnp.ones((b, n), jnp.float32)
    mean = jnp.zeros((b,), jnp.float32)
    # gp_predict_blocked is already jitted with its static argnames; lower
    # the existing jitted function instead of re-wrapping (ADVICE r2).
    lowered = blocked_gp.gp_predict_blocked.lower(lh, x, z, xs, mask, mean)
    mem = lowered.compile().memory_analysis()
    return _mem_report(n, b, mem, n * n * 4.0, "predict")


def main() -> None:
    argv = sys.argv[1:]
    if argv:
        # triples: "N B M" (M=0 -> blocked objective) or "predict N B"
        usage = (
            "usage: probe_hbm.py [N B M | predict N B] ...\n"
            "  (M=0 probes the blocked objective, M>0 the Nystrom:M "
            "objective; note the r2 format change from 'N B' pairs)"
        )
        shapes = []
        it = iter(argv)
        for a in it:
            try:
                if a == "predict":
                    shapes.append(("predict", int(next(it)), int(next(it)), 0))
                else:
                    shapes.append(("opt", int(a), int(next(it)), int(next(it))))
            except (StopIteration, ValueError):
                sys.exit(usage)
    else:
        shapes = (
            # blocked optimize: current tiles + the next TILE_MENU step up
            [("opt", n, b, 0) for n, b in
             ((4096, 48), (2048, 192), (1024, 128), (1024, 512),
              (512, 512), (512, 2048))]
            # nystroem m=512 optimize: current tiles + next step up
            + [("opt", n, b, 512) for n, b in
               ((2048, 128), (2048, 512), (4096, 32), (4096, 128),
                (4096, 512))]
            # blocked predict (pass-1 predict / pass-2) large buckets
            + [("predict", n, b, 0) for n, b in
               ((2048, 128), (2048, 512), (4096, 32), (4096, 128),
                (1024, 512), (1024, 2048))]
        )
    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}")
    for tag, n, b, m in shapes:
        r = probe_predict(n, b) if tag == "predict" else probe(n, b, m)
        print(r, flush=True)


if __name__ == "__main__":
    main()
