"""Profiling hooks (SURVEY.md section 5: per-phase timing + traces).

The reference exposes only ``num_iterations``/``num_operations``
counters; since performance is a first-class goal here, this module
adds a ``trace`` context manager around ``jax.profiler`` and a
lightweight wall-clock phase timer usable from the host-driven loops.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock timer keyed by phase name.

    >>> t = PhaseTimer()
    >>> with t("spmv"):
    ...     run()
    >>> t.summary()
    {'spmv': {'calls': 1, 'total_s': ...}}
    """

    def __init__(self):
        self._acc: dict = {}

    @contextlib.contextmanager
    def __call__(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            slot = self._acc.setdefault(phase, {"calls": 0, "total_s": 0.0})
            slot["calls"] += 1
            slot["total_s"] += dt

    def summary(self) -> dict:
        return {k: dict(v) for k, v in self._acc.items()}

    def reset(self):
        self._acc.clear()
