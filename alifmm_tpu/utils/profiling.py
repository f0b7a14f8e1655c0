"""Timing and device-trace helpers.

The reference has no profiling story beyond commented-out debug plots
(SURVEY.md section 5); this provides the TPU-native equivalents: a wall
clock that forces device completion, and a jax.profiler trace context for
inspecting the compiled pipelines in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["device_timer", "trace", "Timings"]


class Timings(dict):
    def report(self):
        return "\n".join(f"{k}: {v:.4f}s" for k, v in self.items())


@contextlib.contextmanager
def device_timer(timings: Timings, name: str, *results):
    """Context manager measuring device wall time: blocks on everything
    produced inside the context (pass result arrays via ``collect``)."""
    holder = []

    class _Collector:
        @staticmethod
        def collect(x):
            holder.append(x)
            return x

    t0 = time.perf_counter()
    yield _Collector
    for h in holder:
        jax.block_until_ready(h)
    timings[name] = timings.get(name, 0.0) + time.perf_counter() - t0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/alifmm_trace"):
    """jax.profiler trace around a region (view with TensorBoard or
    Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
