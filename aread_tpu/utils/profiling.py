"""Tracing / profiling utilities (SURVEY §5: the reference has none — only
tqdm bars, run.py:491,609, and ad-hoc time.time() spans, preprocess.py:190-208).

Three surfaces:
  * ``StepTimer`` — lightweight rolling per-step wall-time and throughput
    stats for the trainer loops (host side, negligible overhead);
  * ``trace`` — context manager around ``jax.profiler.trace`` writing a
    TensorBoard-loadable trace directory (set ``AREAD_TPU_TRACE=/path`` to
    enable tracing of any training run without code changes);
  * ``annotate`` — ``jax.profiler.TraceAnnotation`` + ``jax.named_scope``
    combination so HEI levels / HEMP phases show up both in the host trace
    and as XLA op-name prefixes in the device profile.
"""

from __future__ import annotations

import collections
import contextlib
import os
import time
from typing import Iterator, Optional

import jax


class StepTimer:
    """Rolling wall-clock stats for a training loop.

    >>> timer = StepTimer(window=100)
    >>> with timer.step(n_examples=1024): ...
    >>> timer.summary()  # {'steps': ..., 'mean_ms': ..., 'examples_per_s': ...}
    """

    def __init__(self, window: int = 100):
        self.window = window
        self.durations = collections.deque(maxlen=window)
        self.examples = collections.deque(maxlen=window)
        self.total_steps = 0
        self.total_time = 0.0
        self.total_examples = 0

    @contextlib.contextmanager
    def step(self, n_examples: int = 0) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.durations.append(dt)
            self.examples.append(n_examples)
            self.total_steps += 1
            self.total_time += dt
            self.total_examples += n_examples

    def summary(self) -> dict:
        n = len(self.durations)
        if n == 0:
            return {"steps": 0, "mean_ms": 0.0, "examples_per_s": 0.0}
        window_time = sum(self.durations)
        return {
            "steps": self.total_steps,
            "mean_ms": 1000.0 * window_time / n,
            "examples_per_s": (sum(self.examples) / window_time
                               if window_time > 0 else 0.0),
            "total_s": self.total_time,
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a device+host profile into ``log_dir`` (TensorBoard format).

    If ``log_dir`` is None, the ``AREAD_TPU_TRACE`` env var is consulted;
    when that is unset this is a no-op, so call sites can wrap their hot
    loops unconditionally.
    """
    log_dir = log_dir or os.environ.get("AREAD_TPU_TRACE")
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Host trace annotation + XLA op-name scope for a code region."""
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield


def start_server(port: int = 9999):
    """Start the on-demand profiler server (connect with TensorBoard's
    profile plugin or ``jax.profiler.trace_remote``)."""
    return jax.profiler.start_server(port)
