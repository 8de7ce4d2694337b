"""Sharded sparse-gradient table Adam: per-shard Pallas kernels under
shard_map.

With the fused embedding table row-sharded over the 'model' axis
(parallel/mesh.table_sharding), the single-device sparse Adam
(ops/sparse_adam.py) cannot be left to GSPMD: its pallas_call has no
partitioning rule, so the SPMD partitioner would all-gather the full
table to every device and run the kernel replicated. The TPU-native
update is instead shard_map'd — each device:

  1. receives its [NF/mp, 128] flat shard of (w, m, v) plus the REPLICATED
     sorted-unique (uids, gsum) from one global dedup (they are small:
     K x (4 + 4D) bytes ~ 2.3 MB at bs=1024/D=32);
  2. slices out its own contiguous run of the sorted ids (two
     searchsorteds + one roll — sortedness means a shard's rows form one
     run), rebases them to shard-local row numbers with sentinel padding;
  3. runs the SAME kernel/XLA dispatch as single-device
     (ops/sparse_adam.sparse_adam_dispatch) on its shard.

No communication at all beyond what the step already did: gradients
arrive replicated from the data-parallel psum; the update itself is
embarrassingly row-parallel. Identical results to the unsharded update
(tests/test_sharded_adam.py asserts bitwise equality on a CPU mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aread_tpu.ops.sparse_adam import dedup_rows, sparse_adam_dispatch


def sharded_sparse_table_adam(w: jnp.ndarray, m: jnp.ndarray, v: jnp.ndarray,
                              flat_ids: jnp.ndarray, flat_grads: jnp.ndarray,
                              t: jnp.ndarray, mesh: Mesh, lr: float,
                              b1: float = 0.9, b2: float = 0.99,
                              eps: float = 1e-8, weight_decay: float = 1e-8,
                              l2: float = 0.0,
                              table_shape: Tuple[int, int] = None,
                              axis: str = "model", lazy: bool = False
                              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense-semantics Adam on a row-sharded table (P(axis, None)).

    w/m/v: [n_rows, D] or flat [n_rows*D/128, 128], row-sharded over
    ``axis``; flat_ids/flat_grads replicated. Leading dim must divide the
    axis size (models/base.FeatureSpec.pad_vocab / with_flat_table)."""
    n_rows, d = table_shape if table_shape is not None else w.shape
    mp = mesh.shape[axis]
    if mp == 1:
        from aread_tpu.ops.sparse_adam import sparse_table_adam
        return sparse_table_adam(w, m, v, flat_ids, flat_grads, t, lr=lr,
                                 b1=b1, b2=b2, eps=eps,
                                 weight_decay=weight_decay, l2=l2,
                                 table_shape=(n_rows, d), lazy=lazy)
    assert w.shape[0] % mp == 0, (w.shape, mp)
    rows_per_shard = (n_rows * d // 128 if w.shape != (n_rows, d)
                      else n_rows) // mp
    # table rows owned per shard (flat shards own rpf table rows per flat row)
    tab_rows_per_shard = n_rows // mp
    kw = dict(lr=lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay, l2=l2,
              lazy=lazy)

    uids, gsum = dedup_rows(flat_ids.reshape(-1),
                            flat_grads.reshape(-1, d), n_rows)

    def shard_update(w_s, m_s, v_s, uids_, gsum_, t_):
        idx = jax.lax.axis_index(axis)
        lo = idx * tab_rows_per_shard
        K = uids_.shape[0]
        # this shard's rows are one contiguous run of the sorted ids
        a = jnp.searchsorted(uids_, lo, side="left")
        run = jnp.searchsorted(uids_, lo + tab_rows_per_shard,
                               side="left") - a
        local = jnp.roll(uids_, -a) - lo
        gloc = jnp.roll(gsum_, -a, axis=0)
        keep = jnp.arange(K) < run
        local = jnp.where(keep, local, tab_rows_per_shard)  # sentinel
        gloc = jnp.where(keep[:, None], gloc, 0)
        # bf16-table stochastic rounding: decorrelate the per-shard SR
        # streams (each shard's dispatch sees shard-LOCAL element indices,
        # so an un-offset seed would reuse one stream on every shard)
        sr_seed = t_.astype(jnp.int32) * mp + idx.astype(jnp.int32)
        return sparse_adam_dispatch(w_s, m_s, v_s, local, gloc, t_,
                                    table_shape=(tab_rows_per_shard, d),
                                    sr_seed=sr_seed, **kw)

    row_spec = P(axis, None)
    return jax.shard_map(
        shard_update, mesh=mesh,
        in_specs=(row_spec, row_spec, row_spec, P(), P(), P()),
        out_specs=(row_spec, row_spec, row_spec),
        check_vma=False,
    )(w, m, v, uids, gsum, t)
