"""Row-sharded embedding lookup over a device mesh.

The reference's single ``nn.Embedding(sum(field_dims))`` (layer.py:150)
becomes a row-sharded table. Two implementations:

  * GSPMD path (default): jit the plain ``jnp.take`` with the table sharded
    P('model', None) and ids sharded P('data') — XLA partitions the gather
    and inserts the collectives itself. Zero custom code, robust backward.
  * explicit shard_map path (``sharded_lookup``): each model-axis shard
    gathers the ids that fall in its row range and psums the partial rows —
    the classic shard-select + reduce formulation. This is the reference
    point for the Pallas fused kernel and lets us control the collective
    (psum over ICI) explicitly. Backward works through shard_map autodiff:
    the transpose of (masked take + psum) is a masked scatter-add into the
    local shard.

Both produce bit-identical results to the unsharded lookup (tested on the
8-device CPU mesh in tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map  # jax>=0.8 top-level API


def pad_table_rows(table: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Pad the row count to a multiple of the model-axis size."""
    rows = table.shape[0]
    padded = ((rows + n_shards - 1) // n_shards) * n_shards
    if padded == rows:
        return table
    return jnp.concatenate(
        [table, jnp.zeros((padded - rows, table.shape[1]), table.dtype)], axis=0)


def sharded_lookup(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Gather rows of a row-sharded table for data-sharded ids.

    table: [R, E] with R % mesh.shape['model'] == 0, sharded P('model', None)
    ids:   int [B, F] (B % mesh.shape['data'] == 0), sharded P('data', None)
    returns [B, F, E] sharded P('data', None, None)
    """
    n_model = mesh.shape["model"]
    rows_per = table.shape[0] // n_model

    def local(table_local, ids_local):
        shard = jax.lax.axis_index("model")
        local_ids = ids_local.astype(jnp.int32) - shard * rows_per
        valid = (local_ids >= 0) & (local_ids < rows_per)
        clipped = jnp.clip(local_ids, 0, rows_per - 1)
        rows = jnp.take(table_local, clipped, axis=0)  # [b, F, E]
        rows = jnp.where(valid[..., None], rows, 0.0)
        return jax.lax.psum(rows, "model")

    return shard_map(
        local, mesh=mesh,
        in_specs=(P("model", None), P("data", None)),
        out_specs=P("data", None, None),
        check_vma=False,
    )(table, ids)


def lookup_reference(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Unsharded ground truth."""
    return jnp.take(table, ids, axis=0)
