"""Test harness: force an 8-device CPU platform so multi-chip sharding
paths are exercised without TPU hardware (the driver separately dry-runs
the multi-chip path; benches run on the real chip).

Note: this image pre-imports jax via sitecustomize with JAX_PLATFORMS=axon
(the TPU tunnel), so the platform must be switched via jax.config, not env
vars — env is read before our code runs.
"""

import os

# XLA_FLAGS is read lazily when the CPU client initializes, so this still
# takes effect even though jax is already imported.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite re-jits the same model shapes
# every run; caching cuts repeat-run wall time dramatically.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import tempfile

# keep the parsed-tensor cache (data/loader._read_arrays) out of ~/.cache
# during tests — per-run temp dir unless a test overrides it
os.environ.setdefault("AREAD_TPU_CACHE",
                      tempfile.mkdtemp(prefix="aread_tpu_cache_"))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def synthetic_data():
    from aread_tpu.data.loader import make_synthetic_data

    return make_synthetic_data(n_rows=2048, n_domain=4, vocab=100, seed=0)
