"""Release device memory at process exit.

Why this exists: this image's single-tenant tunneled TPU reclaims HBM that a
dead client session left resident — and that reclaim is SLOW (measured
2026-08-19: ~4 min for 256 MB leaked, ~6 min for the ~1 GB a training run
holds; a session that frees its buffers before exit releases the chip in
<1 s).  Any process that exits while holding large device arrays therefore
blocks the NEXT process's lazy TPU claim for minutes — which is exactly how
the round-1 driver bench timed out with no output (BENCH_r01.json rc=124).

The fix is mechanical: at exit, delete every live jax array so the PJRT
client returns the HBM before the session closes.  `install()` registers an
atexit hook doing exactly that; every TPU entry point (main.py, bench.py,
benchmarks/*) calls it.  On CPU platforms the hook is a harmless no-op cost.

The reference has no analogue (single-process CUDA frees on exit for free);
this is tunnel-backend-specific runtime hygiene.
"""

from __future__ import annotations

import atexit
import os
import signal

_installed = False


def release_device_arrays() -> int:
    """Delete all live jax arrays now. Returns the number deleted.

    Safe to call multiple times and on any platform; errors are swallowed
    (exit-path code must never mask the real exception/exit code).
    """
    try:
        import jax

        n = 0
        for a in jax.live_arrays():
            try:
                if not a.is_deleted():
                    a.delete()
                    n += 1
            except Exception:
                pass
        return n
    except Exception:
        return 0


def _signal_exit(signum, frame):  # noqa: ANN001 - signal handler signature
    """Free HBM, then die with the conventional 128+signum status.

    SIGTERM's default disposition kills the process WITHOUT running atexit
    hooks — so a `timeout`-killed or driver-killed training run would leak
    its resident HBM and block the next process's TPU claim for minutes
    (measured 2026-08-20: 11.9 min after a round-boundary SIGKILL). If the
    cleanup itself wedges (the handler can interrupt arbitrary jax code),
    the killer's SIGKILL follow-up still applies — no worse than before.
    """
    release_device_arrays()
    signal.signal(signum, signal.SIG_DFL)
    os.kill(os.getpid(), signum)


def install() -> None:
    """Register the exit hook (and a SIGTERM hook) once per process.

    The SIGTERM handler is installed only when the process has not set its
    own (disposition still SIG_DFL) — bench.py, for one, installs a
    diagnostic-emitting handler that does its own cleanup. SIGINT needs no
    hook: Python's default KeyboardInterrupt unwinds normally and atexit
    runs.
    """
    global _installed
    if _installed:
        return
    _installed = True
    atexit.register(release_device_arrays)
    try:
        if signal.getsignal(signal.SIGTERM) == signal.SIG_DFL:
            signal.signal(signal.SIGTERM, _signal_exit)
    except (ValueError, OSError):
        pass  # non-main thread or restricted env: atexit hook still covers
        # clean exits; signal path stays default
