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


def install() -> None:
    """Register the exit hook once per process."""
    global _installed
    if _installed:
        return
    _installed = True
    atexit.register(release_device_arrays)
