"""Exit-path HBM release (utils/device_cleanup.py).

Why it matters on this box: the single-tenant tunneled TPU reclaims a dead
client's resident HBM SLOWLY (4-12 min measured), so any process that dies
holding device arrays blocks the next process's claim. Two exit paths must
free buffers:

* normal interpreter exit — the atexit hook;
* SIGTERM (`timeout`, driver kills) — whose DEFAULT disposition skips
  atexit entirely; install() adds a handler that frees then re-raises.

The reference has no analogue (process exit frees CUDA); this is runtime
hygiene specific to the tunneled-PJRT environment (see CLAUDE.md).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys

import aread_tpu.utils.device_cleanup as dc

orig = dc.release_device_arrays

def traced():
    n = orig()
    print(f"RELEASED {n}", flush=True)
    return n

dc.release_device_arrays = traced
dc.install()

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

a = jnp.ones((1024,))
_ = float(a.sum())
print("READY", flush=True)
import time
time.sleep(60)
"""


def _run_child():
    return subprocess.Popen(
        [sys.executable, "-c", CHILD], cwd=REPO, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})


def _wait_ready(proc, timeout=120.0):
    """Read lines until READY (the child holds a live device array).

    Uses select() so a child that hangs BEFORE printing anything still
    fails at the deadline instead of blocking forever in readline()
    (ADVICE r3)."""
    import select

    t0 = time.time()
    lines = []
    while True:
        remaining = timeout - (time.time() - t0)
        if remaining <= 0:
            break
        ready, _, _ = select.select([proc.stdout], [], [], remaining)
        if not ready:
            break
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if "READY" in line:
            return lines
    raise AssertionError(f"child never reached READY: {''.join(lines)}")


def test_sigterm_releases_device_arrays():
    """SIGTERM must run the release hook, then die with the signal."""
    proc = _run_child()
    try:
        _wait_ready(proc)
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    # handler freed >=1 live array, then re-raised SIGTERM (rc -15)
    assert "RELEASED" in out, f"cleanup never ran on SIGTERM: {out!r}"
    released = [int(tok.split()[1]) for tok in out.splitlines()
                if tok.startswith("RELEASED")]
    assert any(n >= 1 for n in released), f"nothing freed: {out!r}"
    assert proc.returncode == -signal.SIGTERM, (
        f"exit status must preserve the killing signal, got "
        f"{proc.returncode}: {out!r}")


def test_install_respects_existing_handler():
    """install() must NOT clobber a process's own SIGTERM handler
    (bench.py installs a diagnostic-emitting one first)."""
    own = lambda s, f: None  # noqa: E731 - sentinel handler
    prev = signal.getsignal(signal.SIGTERM)
    signal.signal(signal.SIGTERM, own)
    try:
        import aread_tpu.utils.device_cleanup as dc
        installed = dc._installed
        dc._installed = False  # force a fresh install pass
        try:
            dc.install()
            assert signal.getsignal(signal.SIGTERM) is own
        finally:
            dc._installed = installed
    finally:
        signal.signal(signal.SIGTERM, prev)


IDEMPOTENT_CHILD = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from aread_tpu.utils.device_cleanup import release_device_arrays

a = jnp.ones((16,))
_ = float(a.sum())
n1 = release_device_arrays()
assert n1 >= 1, n1
# second call: everything already deleted; must not raise
release_device_arrays()
print("IDEMPOTENT OK", flush=True)
"""


def test_release_idempotent():
    """Runs in a subprocess: release_device_arrays() deletes ALL live jax
    arrays, which in the shared pytest process would nuke jit-captured
    constants / fixtures of other test modules (ADVICE r3)."""
    out = subprocess.run(
        [sys.executable, "-c", IDEMPOTENT_CHILD], cwd=REPO, text=True,
        capture_output=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr
    assert "IDEMPOTENT OK" in out.stdout


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
