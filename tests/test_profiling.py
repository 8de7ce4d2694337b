"""Tracing/profiling subsystem (SURVEY §5: the reference has none)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from aread_tpu.utils import profiling


def test_step_timer_counts_and_throughput():
    timer = profiling.StepTimer(window=4)
    for _ in range(6):
        with timer.step(n_examples=128):
            pass
    s = timer.summary()
    assert s["steps"] == 6
    assert s["examples_per_s"] > 0
    assert timer.total_examples == 6 * 128


def test_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("AREAD_TPU_TRACE", raising=False)
    with profiling.trace():
        pass  # must not raise and must not start a profiler


def test_trace_writes_profile(tmp_path, monkeypatch):
    monkeypatch.setenv("AREAD_TPU_TRACE", str(tmp_path / "trace"))
    with profiling.trace():
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    # jax.profiler.trace writes plugins/profile/<ts>/ under the log dir
    produced = list((tmp_path / "trace").rglob("*"))
    assert produced, "no trace output written"


def test_annotate_composes_with_jit():
    @jax.jit
    def f(x):
        with profiling.annotate("hot_region"):
            return x * 2

    np.testing.assert_array_equal(np.asarray(f(jnp.ones(4))), 2 * np.ones(4))
