"""Tracing / profiling: jax.profiler traces + per-phase wall-clock timers.

The reference's observability is `time.time()` around train/eval written
to CSV (SURVEY.md §5). This build adds:
  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard-viewable XPlane trace of the compiled TPU program;
  * `PhaseTimer` — lightweight named-phase accumulator whose report
    matches the GP-natural metric: MVM count x time per MVM;
  * `mvm_counter` — wraps an MVM closure to count invocations (CG
    iterations) without touching compiled code (host-side, works because
    CG loops are fixed-trip lax.scan: count = trace-time constant).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rpagp_trace"):
    """Profile the enclosed block; view with TensorBoard's profile tab."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulate wall-clock per named phase (blocks on device work)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase               total_s   calls   s/call"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<18} {t:8.3f} {c:7d} {t / max(c, 1):8.4f}")
        return "\n".join(lines)


def annotate(name: str):
    """Decorator: name a function's region in profiler traces."""

    def deco(fn: Callable) -> Callable:
        def wrapped(*a, **kw):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **kw)

        return wrapped

    return deco
