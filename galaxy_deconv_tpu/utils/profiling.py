"""Profiling helpers (the reference has only wall-clock timing; SURVEY §5
asks for a jax.profiler trace option and per-stage timing)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)
    around a code block; no-op when log_dir is None."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Cheap named wall-clock stage timing with a summary dict."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> dict[str, float]:
        return dict(self.times)
