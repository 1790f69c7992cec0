"""Profiling helpers: jax.profiler traces + simple step timing.

The reference has no systematic profiling (SURVEY.md section 5 — commented
cuda-event pairs only); this module makes trace capture a one-liner so
per-kernel times back the speed-of-light claims in BENCH_NOTES.md.
"""

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def trace(logdir="/tmp/enerf_tpu_trace"):
    """Capture a TensorBoard-viewable profiler trace around a block.

    with profiling.trace("/tmp/trace"):
        step(...)  # must block_until_ready inside
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall time with device sync."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.times.append(time.perf_counter() - t0)

    def mean_ms(self, skip_first=1):
        t = self.times[skip_first:] or self.times
        return 1000.0 * sum(t) / len(t)
