"""Failure detection for multi-host runs (SURVEY §5: absent in the
reference — its only resilience is early stopping, run.py:459-484).

Two primitives, both cheap and single-host-safe:

  * ``watchdog(timeout_s, tag)`` — context manager that raises
    ``HealthError`` in the main thread's stead (via a daemon timer that
    logs loudly and optionally kills the process) when the wrapped block
    exceeds ``timeout_s``. Wraps epochs / collectives so a hung host (dead
    ICI link, stuck infeed, deadlocked collective) is DETECTED instead of
    hanging the whole job silently; paired with elastic checkpoints
    (--elastic) the job restarts from the last improvement.
  * ``barrier(tag, timeout_s)`` — a cross-host rendezvous with a deadline:
    ``jax.experimental.multihost_utils.sync_global_devices`` guarded by
    the watchdog. No-op when single-process.

JAX collectives have no native timeout — a lost host blocks forever; the
watchdog thread is the standard escape hatch.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from typing import Iterator, Optional


class HealthError(RuntimeError):
    """A watchdog deadline expired (hung collective / stalled epoch)."""


@contextlib.contextmanager
def watchdog(timeout_s: Optional[float], tag: str = "",
             kill_process: bool = False) -> Iterator[None]:
    """Raise HealthError if the block runs longer than ``timeout_s``.

    The deadline fires on a daemon thread; since a hung JAX collective
    cannot be interrupted from Python, the thread (a) records the breach
    so the context exit raises as soon as the block DOES return, and
    (b) with ``kill_process`` (multi-host production: a permanently hung
    collective never returns) prints diagnostics and hard-exits so the
    orchestrator can reschedule the task. ``timeout_s`` None/0 = no-op.
    """
    if not timeout_s:
        yield
        return
    breached = threading.Event()
    completed = threading.Event()

    def _fire():
        # Close the fire-vs-cancel race: a block that already returned
        # (completed is set the instant the body finishes, BEFORE
        # timer.cancel()) must not be flagged breached — and in kill mode
        # must not hard-exit a healthy process that finished its work. A
        # timer that fires while the block is still running keeps the
        # existing contract: breach recorded, HealthError raised on return
        # (or hard exit in kill mode — the block is genuinely over
        # deadline with its work incomplete).
        if completed.is_set():
            return
        breached.set()
        msg = (f"[aread_tpu.health] watchdog '{tag}' exceeded "
               f"{timeout_s}s (process {os.getpid()})")
        print(msg, flush=True)
        if kill_process and not completed.is_set():
            # last resort: a hung collective never returns to Python
            os._exit(42)

    timer = threading.Timer(timeout_s, _fire)
    timer.daemon = True
    timer.start()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        # Set in the finally so an EXCEPTION leaving the block also counts
        # as completed: a timer firing during the unwind (or between the
        # raise and cancel()) must not os._exit(42) and mask the real
        # traceback — the kill contract is for work that never returns.
        completed.set()
        timer.cancel()
    if breached.is_set():
        raise HealthError(
            f"watchdog '{tag}': block took {time.perf_counter() - t0:.1f}s "
            f"(> {timeout_s}s deadline)")


_first_epoch_done = False


def epoch_deadline(timeout_s: Optional[float],
                   first_mult: float = 5.0) -> Optional[float]:
    """Per-epoch watchdog deadline with a cold-start grace for the FIRST
    wrapped epoch of this process: it pays jit compiles (20-40 s per trace
    over the TPU tunnel) and the first device_put (minutes), so a deadline
    tuned to steady-state epoch time would spuriously fire — and with
    kill mode + --elastic could loop killing epoch 0 forever. Process-
    global: the cold-start cost is per process, not per trainer."""
    global _first_epoch_done
    if not timeout_s:
        return timeout_s  # watchdog off: don't consume the grace
    if _first_epoch_done:
        return timeout_s
    _first_epoch_done = True
    return timeout_s * max(first_mult, 1.0)


def barrier(tag: str = "barrier", timeout_s: Optional[float] = None,
            kill_process: bool = False) -> None:
    """Cross-host rendezvous with an optional deadline. Detects a dead or
    straggling host at a known point (epoch boundary, pre-checkpoint)
    instead of hanging inside an arbitrary later collective. Single
    process: no-op."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    with watchdog(timeout_s, tag=f"barrier:{tag}", kill_process=kill_process):
        multihost_utils.sync_global_devices(tag)
