"""Tracing / profiling utilities (SURVEY.md section 5: the reference's only
instrumentation is wall-clock prints, ``GPR_CS2S3.py:252,335``).

``StageTimer`` collects per-stage wall-clock and derived rates (cells/sec);
``trace`` wraps ``jax.profiler`` so a pipeline run can emit a TensorBoard-
loadable device trace with one context manager.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

__all__ = ["StageTimer", "trace"]


class StageTimer:
    """Accumulates named stage durations and per-stage item counts.

    >>> t = StageTimer()
    >>> with t.stage("optimize", items=1024): ...
    >>> t.summary()  # {'optimize': {'seconds': ..., 'items': 1024, 'rate': ...}}
    """

    def __init__(self, log: Optional[Callable[[str], None]] = None):
        self._acc: dict[str, list[float]] = {}
        self._items: dict[str, int] = {}
        self._log = log

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._acc.setdefault(name, []).append(dt)
            self._items[name] = self._items.get(name, 0) + items
            if self._log:
                rate = f" ({items / dt:.1f}/s)" if items else ""
                self._log(f"[{name}] {dt:.2f}s{rate}")

    def summary(self) -> dict:
        out = {}
        for name, times in self._acc.items():
            total = sum(times)
            items = self._items.get(name, 0)
            out[name] = {
                "seconds": round(total, 3),
                "calls": len(times),
                "items": items,
                "rate": round(items / total, 2) if items and total > 0 else None,
            }
        return out


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace via jax.profiler (view in TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
