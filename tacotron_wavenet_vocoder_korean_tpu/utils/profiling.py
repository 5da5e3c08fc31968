"""Opt-in profiling (reference: train_vocoder.py:125,158-167 chrome trace).

The reference writes a TF Chrome trace every 50th step when
``store_metadata`` is set; the TPU-native equivalent captures a jax.profiler
trace (viewable in TensorBoard/Perfetto) over a window of steps.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_window(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a device trace for the enclosed steps into
    ``log_dir/trace/`` (the reference's timeline.trace analogue)."""
    if not enabled:
        yield
        return
    trace_dir = os.path.join(log_dir, "trace")
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup skip (compile steps excluded)."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt

    @property
    def mean(self) -> float:
        steps = max(1, self.count - self.warmup)
        return self.total / steps


def maybe_trace_step(step: int, log_dir: str, store_metadata: bool,
                     every: int = 50, span: int = 3):
    """Returns a context manager tracing steps [k*every, k*every+span)."""
    active = store_metadata and step % every < span
    return trace_window(log_dir, enabled=active)
