"""Device mesh + sharding-spec constants.

The reference is single-process/single-device (SURVEY.md §2.7: no
torch.distributed anywhere); this layer is new, TPU-first design:

  * a 2-D mesh ('data', 'model'): batches shard over 'data' (pure DP,
    gradients psum over ICI), the one large tensor in this workload — the
    fused embedding table (1.37M x d for Amazon, config.py:7) — row-shards
    over 'model';
  * everything downstream of the embedding lookup is replicated compute on
    data-sharded activations — dense tower FLOPs per row are tiny, so DP is
    the right scaling axis; the embedding table is the only memory hog.

All later layers take a Mesh and NamedShardings; nothing touches devices
directly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    n = data * model
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    arr = mesh_utils.create_device_mesh((data, model), devices=list(devs)[:n])
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """The fused embedding table row-shards over 'model'."""
    return NamedSharding(mesh, P("model", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def param_shardings(params, mesh: Mesh, table_path: str = "table"):
    """Replicate everything except embedding tables, which row-shard over
    'model'. Works on any param pytree by leaf-path matching."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for path, leaf in flat.items():
        # GSPMD handles non-divisible row counts by implicit padding, so no
        # divisibility requirement here.
        if path.endswith(table_path) and getattr(leaf, "ndim", 0) == 2:
            out[path] = table_sharding(mesh)
        else:
            out[path] = replicated(mesh)
    return traverse_util.unflatten_dict(out, sep="/")
