"""Epoch-level host/device overlap: pipelined vs per-chunk-synced.

The epoch loops (train/trainer.py, train/hemp.py) accumulate UN-FETCHED
device losses so the host can stage chunk N+1 (numpy stacking, the
batch_fits_kernel precheck, tunnel transfers) while the device executes
chunk N. This script measures what that buys end-to-end by timing
Trainer.train_epoch on synthetic Amazon-scale data twice:

  * pipelined — the shipped behavior;
  * synced    — the scan wrapped so every chunk's losses are fetched
    before the next is staged (the pre-change behavior).

Run on the real chip: python benchmarks/prof_epoch_overlap.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import numpy as np


def main():
    import jax.numpy as jnp

    from aread_tpu.config import Config
    from aread_tpu.models.base import FeatureSpec
    from aread_tpu.models.deepfm import DeepFM
    from aread_tpu.train.trainer import Trainer

    bs, embed_dim, n_batches = 1024, 32, 96
    spec = FeatureSpec(
        one_hot_dims=(1368287, 7, 25, 40, 11, 150000, 12),
        n_seq_fields=2, itemid_idx=0, domain_idx=2, seq_maxlen=5,
    ).with_flat_table(embed_dim)
    cfg = Config(model="deepfm", bs=bs, embed_dim=embed_dim)
    model = DeepFM(spec=spec, embed_dim=embed_dim,
                   mlp_dims=(256, 128, 64), dropout=0.2)
    trainer = Trainer(model, cfg, n_domain=25)

    rng = np.random.default_rng(0)
    def make_batch():
        cols = [rng.integers(0, d, size=(bs, 1)) for d in spec.one_hot_dims]
        seqs = rng.integers(0, spec.one_hot_dims[0], size=(bs, 10))
        return {
            "x": np.concatenate(cols + [seqs], axis=1).astype(np.int32),
            "y": rng.integers(0, 2, size=bs).astype(np.float32),
            "valid": np.ones((bs,), np.float32),
            "domain": rng.integers(0, 25, size=bs).astype(np.int32),
        }
    batches = [make_batch() for _ in range(n_batches)]

    key = jax.random.PRNGKey(0)
    params, state, opt_state = trainer.init(key, batches[0])

    def run_epoch(params, state, opt_state, key, label):
        t0 = time.perf_counter()
        params, state, opt_state, key, loss = trainer.train_epoch(
            params, state, opt_state, iter(batches), key)
        # loss is already materialized by mean_losses -> full epoch synced
        dt = time.perf_counter() - t0
        print(f"{label}: {dt*1e3:.0f} ms for {n_batches} steps "
              f"({bs*n_batches/dt:,.0f} ex/s), loss={loss:.4f}")
        return params, state, opt_state, key, dt

    # compile warmup
    params, state, opt_state, key, _ = run_epoch(
        params, state, opt_state, key, "warmup (compiles)")

    params, state, opt_state, key, t_pipe = run_epoch(
        params, state, opt_state, key, "pipelined")

    # force the pre-change behavior: fetch each chunk's losses immediately
    real_scan = trainer._train_scan
    def synced_scan(*args, **kw):
        out = real_scan(*args, **kw)
        np.asarray(out[-1])  # block on device completion before returning
        return out
    trainer._train_scan = synced_scan
    params, state, opt_state, key, t_sync = run_epoch(
        params, state, opt_state, key, "per-chunk synced")
    trainer._train_scan = real_scan

    print(f"overlap speedup: {t_sync / t_pipe:.2f}x")

    # device-resident epoch (config.device_data): the split lives in HBM,
    # the whole epoch is ONE dispatch; only the [n_batches, bs] int32
    # permutation crosses the tunnel per epoch
    from aread_tpu.data.loader import GlobalBatcher
    all_x = np.concatenate([b["x"] for b in batches])
    all_y = np.concatenate([b["y"] for b in batches])
    batcher = GlobalBatcher(all_x, all_y, bs, spec.domain_idx, seed=0)

    def run_epoch_device(params, state, opt_state, key, label):
        t0 = time.perf_counter()
        params, state, opt_state, key, loss = trainer.train_epoch_device(
            params, state, opt_state, batcher, key)
        dt = time.perf_counter() - t0
        print(f"{label}: {dt*1e3:.0f} ms for {n_batches} steps "
              f"({bs*n_batches/dt:,.0f} ex/s), loss={loss:.4f}")
        return params, state, opt_state, key, dt

    params, state, opt_state, key, _ = run_epoch_device(
        params, state, opt_state, key, "device-resident warmup (compiles)")
    params, state, opt_state, key, t_dev = run_epoch_device(
        params, state, opt_state, key, "device-resident")
    print(f"device-resident vs pipelined host staging: "
          f"{t_pipe / t_dev:.2f}x")


if __name__ == "__main__":
    main()
