"""Phase timing + JAX profiler traces (SURVEY.md §5: the reference has no
tracing/profiling beyond tqdm; the rebuild provides per-phase wall-clock
logging and optional on-device profiler traces).

Usage:
    prof = Profiler(trace_dir=None)          # or a dir for jax.profiler
    with prof.phase("prior-scoring"):
        scores = ...
        jax.block_until_ready(scores)
    prof.summary()   # prints and returns {phase: seconds}

Set trace_dir (or env DYNHOR_TRACE_DIR) to capture a TensorBoard-viewable
profile of everything inside the phases.
"""
from __future__ import annotations

import contextlib
import os
import time


class Profiler:
    def __init__(self, trace_dir: str | None = None, enabled: bool = True):
        self.trace_dir = trace_dir or os.environ.get("DYNHOR_TRACE_DIR")
        self.enabled = enabled
        self.times: dict[str, float] = {}
        self._tracing = False

    @contextlib.contextmanager
    def phase(self, name: str):
        if not self.enabled:
            yield
            return
        ctx = contextlib.nullcontext()
        if self.trace_dir and not self._tracing:
            import jax

            ctx = jax.profiler.trace(self.trace_dir)
            self._tracing = True
            started_trace = True
        else:
            started_trace = False
        t0 = time.time()
        try:
            with ctx:
                yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (time.time() - t0)
            if started_trace:
                self._tracing = False

    def summary(self, printer=print) -> dict[str, float]:
        if self.enabled and self.times:
            total = sum(self.times.values())
            for k, v in self.times.items():
                printer(f"[profile] {k}: {v:.2f}s ({100 * v / total:.0f}%)")
            printer(f"[profile] total: {total:.2f}s")
        return dict(self.times)
