"""Persistent XLA compilation cache for CLI/bench runs.

Tests already use one (tests/conftest.py, /tmp/jax_test_cache); production
entry points compile over this image's TPU tunnel where a single big jit
costs 20-60 s — the ragged tail chunk of the device-resident epoch and
every dataset-size change retrace, so caching across processes matters.
Set AREAD_TPU_JIT_CACHE=0 to disable, or to a directory to relocate."""

from __future__ import annotations

import os


def enable(default_dir: str = "~/.cache/aread_tpu/jax_cache") -> bool:
    path = os.environ.get("AREAD_TPU_JIT_CACHE",
                          os.path.expanduser(default_dir))
    if not path or path == "0":
        return False
    import jax
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        return True
    except Exception:
        return False  # cache is an optimization, never a hard dependency
