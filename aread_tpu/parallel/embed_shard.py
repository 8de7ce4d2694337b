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


# ---------------------------------------------------------------------------
# Dedup + all-to-all exchange (SURVEY §7.3; the designed replacement for the
# reference's monolithic nn.Embedding gather, layer.py:150-157).
#
# Per (data, model) device, with m = model-axis size, n = local flat id count:
#   1. sort + dedup the local ids (ids are replicated across the model axis
#      within a data replica, so no *id* exchange is needed to agree on them —
#      each shard derives the same request list deterministically);
#   2. bucket the unique ids by owner shard (contiguous after the sort) into
#      a static per-owner ``capacity`` — XLA all_to_all needs equal splits;
#   3. all_to_all the id buckets over 'model' (4 B/id), each owner gathers
#      its rows locally, all_to_all the rows back (E·4 B/row);
#   4. un-dedup: out[i] = unique_rows[searchsorted(unique, ids[i])].
#
# Per-device row bytes ≈ 2 · min(u, m·capacity) · E · 4 where u = #unique ids
# — vs the psum formulation's 2 · n · E · 4 ring traffic and n-wide gather on
# EVERY shard. CTR batches are heavily duplicated (a single-domain batch has
# ONE distinct domain id, ≤7 weekdays, …), so u ≪ n.
#
# Capacity is a STATIC shape. Ids that overflow their owner bucket POISON
# the whole output with NaN: an undersized capacity must never silently
# train on zero rows / dropped gradients — the trainers' epoch-level host
# finite check (trainer.raise_if_nonfinite, called on every fetched epoch
# loss) raises loudly instead. The trainers auto-calibrate the bound via
# ``resolve_a2a_capacity`` (sampled batches x headroom) before tracing —
# the same host-checked cond-free dispatch idiom as
# trainer.batch_fits_kernel — and validate any manual bound fail-fast;
# capacity=None is the always-exact (capacity=n) setting.
#
# The backward pass is an explicit custom_vjp: scatter-add the output
# cotangent over the dedup map, route the unique-row cotangents back to their
# owner shards with the SAME bucketing (recomputed from the ids — cheaper
# than carrying residuals across the shard_map boundary), scatter-add into
# the local table shard, and psum over 'data' (every data replica contributes
# to the shared table).
# ---------------------------------------------------------------------------

from typing import NamedTuple


class _A2ACfg(NamedTuple):
    mesh: Mesh
    capacity: int
    rows_per: int
    n_rows: int


def _routing(cfg: _A2ACfg, ids_l: jnp.ndarray):
    """Shared fwd/bwd routing plan, recomputed from the local ids.

    Returns (compact, inv, start, gather_idx, valid_send) where
      compact   [n]   sorted unique ids, tail filled with the sentinel n_rows
      inv       [n]   index of each original flat id inside ``compact``
      start     [m]   bucket start offset per owner shard
      gather_idx[m,c] compact index feeding each send slot
      valid_send[m,c] send-slot validity (bucket member and under capacity)
    """
    m = cfg.mesh.shape["model"]
    flat = ids_l.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    sorted_ids = jnp.sort(flat)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]])
    pos = jnp.cumsum(first) - 1
    sentinel = jnp.int32(cfg.n_rows)  # > every real id; keeps compact sorted
    compact = jnp.full((n,), sentinel, jnp.int32)
    compact = compact.at[jnp.where(first, pos, n)].set(sorted_ids, mode="drop")
    inv = jnp.searchsorted(compact, flat, side="left")
    bounds = jnp.searchsorted(
        compact, (jnp.arange(m + 1) * cfg.rows_per).astype(jnp.int32),
        side="left")
    start, end = bounds[:-1], bounds[1:]
    j = jnp.arange(cfg.capacity)
    gather_idx = start[:, None] + j[None, :]                    # [m, c]
    valid_send = gather_idx < end[:, None]
    gather_idx = jnp.minimum(gather_idx, n - 1)
    return compact, inv, start, gather_idx, valid_send


def _a2a(x, axis):
    return jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=0, tiled=True)


def _fwd_local(cfg: _A2ACfg, table_l, ids_l):
    m = cfg.mesh.shape["model"]
    c, e = cfg.capacity, table_l.shape[-1]
    n = ids_l.size
    compact, inv, start, gather_idx, valid_send = _routing(cfg, ids_l)
    send_ids = jnp.where(valid_send, compact[gather_idx], -1)   # [m, c]
    recv_ids = _a2a(send_ids, "model")                          # [m, c]
    shard = jax.lax.axis_index("model")
    local_idx = recv_ids - shard * cfg.rows_per
    ok = (local_idx >= 0) & (local_idx < cfg.rows_per)
    rows = jnp.take(table_l, jnp.clip(local_idx, 0, cfg.rows_per - 1), axis=0)
    rows = jnp.where(ok[..., None], rows, 0.0)                  # [m, c, E]
    urows = _a2a(rows, "model")           # [m, c, E]; block s = my bucket->s
    # un-bucket: unique k lives at (owner_k, k - start[owner_k])
    owner_k = jnp.clip(compact // cfg.rows_per, 0, m - 1)
    slot_k = jnp.arange(n) - start[owner_k]
    real = compact < cfg.n_rows
    in_cap = (slot_k < c) & real
    flat_idx = owner_k * c + jnp.clip(slot_k, 0, c - 1)
    unique_rows = jnp.where(in_cap[:, None],
                            urows.reshape(m * c, e)[flat_idx], 0.0)
    # An undersized static capacity must FAIL LOUDLY, not silently train on
    # zero rows with dropped gradients: poison the batch with NaN so the
    # trainers' epoch-level finite check raises (see module notes;
    # resolve_a2a_capacity calibrates/validates host-side before tracing).
    overflowed = jnp.any((slot_k >= c) & real)
    unique_rows = unique_rows + jnp.where(overflowed, jnp.nan, 0.0)
    return unique_rows[inv].reshape(ids_l.shape + (e,))


def _bwd_local(cfg: _A2ACfg, ids_l, g_l):
    # ids and the output cotangent are both replicated across 'model' within
    # a data replica (in_specs shard only over 'data'), so every model shard
    # computes the IDENTICAL per-owner gradient buckets — no model-axis
    # all_to_all is needed on the way back: each owner reads its own bucket
    # locally and scatter-adds, then the data replicas psum.
    e = g_l.shape[-1]
    n = ids_l.size
    compact, inv, _, gather_idx, valid_send = _routing(cfg, ids_l)
    g_unique = jnp.zeros((n, e), g_l.dtype).at[inv].add(g_l.reshape(n, e))
    shard = jax.lax.axis_index("model")
    my_slots = gather_idx[shard]                                # [c]
    my_ok = valid_send[shard]
    my_g = jnp.where(my_ok[:, None], g_unique[my_slots], 0.0)   # [c, E]
    local_idx = compact[my_slots] - shard * cfg.rows_per
    ok = my_ok & (local_idx >= 0) & (local_idx < cfg.rows_per)
    scatter_to = jnp.where(ok, local_idx, cfg.rows_per)  # OOB slot -> dropped
    dtable = jnp.zeros((cfg.rows_per, e), g_l.dtype).at[
        scatter_to].add(my_g, mode="drop")
    return jax.lax.psum(dtable, "data")


def _a2a_call(cfg: _A2ACfg, table, ids):
    return shard_map(
        partial(_fwd_local, cfg), mesh=cfg.mesh,
        in_specs=(P("model", None), P("data", None)),
        out_specs=P("data", None, None), check_vma=False)(table, ids)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _a2a_lookup(cfg: _A2ACfg, table, ids):
    return _a2a_call(cfg, table, ids)


def _a2a_lookup_fwd(cfg, table, ids):
    return _a2a_call(cfg, table, ids), ids


def _a2a_lookup_bwd(cfg, ids, g):
    dtable = shard_map(
        partial(_bwd_local, cfg), mesh=cfg.mesh,
        in_specs=(P("data", None), P("data", None, None)),
        out_specs=P("model", None), check_vma=False)(ids, g)
    d_ids = np.zeros(ids.shape, dtype=jax.dtypes.float0)
    return dtable, d_ids


_a2a_lookup.defvjp(_a2a_lookup_fwd, _a2a_lookup_bwd)


def a2a_required_capacity(ids: np.ndarray, n_rows: int, n_model: int,
                          n_data: int = 1) -> int:
    """Host-side exact capacity bound for a batch of ids.

    The max, over data shards, of the largest per-owner unique-id bucket.
    Callers measure their batch stream with this and bake the result into
    the jitted step as the static capacity (the trainers fail fast via
    ``check_a2a_capacity`` on their first batch; a later batch that still
    overflows NaN-poisons its step — see _fwd_local).
    """
    ids = np.asarray(ids).reshape(n_data, -1)
    rows_per = -(-n_rows // n_model)
    worst = 1
    for shard_ids in ids:
        uniq = np.unique(shard_ids)
        cnt = np.bincount(np.minimum(uniq // rows_per, n_model - 1),
                          minlength=n_model)
        worst = max(worst, int(cnt.max()))
    return worst


def lookup_ids(spec, embed_dim: int, x_np) -> Tuple[np.ndarray, int]:
    """The exact (row ids, table row count) ``gather_rows`` sees for a batch
    under the ACTIVE storage mode.

    Under flat storage (FeatureSpec.with_flat_table — the production
    default), the lookup gathers ``fids // rpf`` against the
    ``[n_rows/rpf, 128]`` flat table (ops/embedding.py), so any capacity
    math on the logical ids both overestimates the per-owner unique counts
    and uses the wrong row space (ADVICE r2)."""
    from aread_tpu.ops.embedding import compute_offsets

    offsets = np.asarray(compute_offsets(
        spec.one_hot_dims, spec.n_seq_fields * spec.seq_maxlen,
        spec.itemid_idx))
    n_rows = int(np.sum(spec.one_hot_dims))
    x = np.asarray(x_np).reshape(-1, offsets.shape[0])
    ids = np.clip(x + offsets, 0, n_rows - 1)
    if getattr(spec, "flat_table", False):
        rpf = 128 // embed_dim
        return ids // rpf, n_rows // rpf
    return ids, n_rows


def check_a2a_capacity(config, mesh: Mesh, spec, embed_dim: int,
                       x_np) -> None:
    """Fail-fast host check for a bounded ``config.a2a_capacity`` against a
    real batch (mirrors trainer.batch_fitskernel's host-checked dispatch
    idiom). Raises with an actionable message instead of NaN-poisoning
    step 1. No-op when embed_lookup != 'a2a' or capacity <= 0 (auto /
    always-exact)."""
    if getattr(config, "embed_lookup", "gspmd") != "a2a" or mesh is None:
        return
    cap = int(getattr(config, "a2a_capacity", 0) or 0)
    if cap <= 0:
        return
    ids, n_rows = lookup_ids(spec, embed_dim, x_np)
    need = a2a_required_capacity(ids, n_rows, mesh.shape["model"],
                                 n_data=mesh.shape.get("data", 1))
    if cap < need:
        raise ValueError(
            f"a2a_capacity={cap} is below this batch's requirement {need} "
            f"(largest per-owner unique-id bucket; see "
            f"a2a_required_capacity). An undersized capacity NaN-poisons "
            f"the step — raise --a2a_capacity to >= {need}, pass 0 to "
            f"auto-calibrate, or -1 for the always-exact setting.")


def resolve_a2a_capacity(config, mesh: Mesh, spec, embed_dim: int,
                         pools, *, n_batches: int = 32,
                         headroom: float = 1.25, seed: int = 0,
                         verbose: bool = False) -> int:
    """Resolve ``config.a2a_capacity`` before any step is traced.

    ``pools``: sequence of ``(rows_array, batch_size)`` — the batch streams
    the run will actually dispatch (train batches at cfg.bs AND eval
    batches at their larger eval bs; one static capacity serves every
    jitted fn). Semantics of the incoming knob:

      0/None (default) -> AUTO: measure ``a2a_required_capacity`` over up
          to ``n_batches`` seeded random sample batches per pool, multiply
          by ``headroom`` and round up to a multiple of 8. Later batches
          that still overflow NaN-poison their step and the trainers'
          epoch-level finite check raises loudly (never a silent zero-row
          gather).
      >0 -> manual bound, validated against the same calibration sample
          (raises like check_a2a_capacity if undersized).
      <0 -> always-exact (capacity = local id count; correct for any id
          mix, no traffic win).

    Returns the resolved capacity (callers write it back to the config so
    embed_lookup_ctx bakes it into the jitted steps). No-op — returns the
    knob untouched — when embed_lookup != 'a2a' or there is no mesh."""
    if getattr(config, "embed_lookup", "gspmd") != "a2a" or mesh is None:
        return getattr(config, "a2a_capacity", 0)
    cap = int(getattr(config, "a2a_capacity", 0) or 0)
    if cap < 0:
        return cap
    n_model = mesh.shape["model"]
    n_data = mesh.shape.get("data", 1)
    rng = np.random.default_rng(seed)
    need = 1
    for arr, bs in pools:
        if arr is None or len(arr) == 0:
            continue
        arr = np.asarray(arr)
        size = min(int(bs), len(arr))
        size = max(n_data, size - size % n_data)
        for _ in range(n_batches):
            idx = rng.choice(len(arr), size=size, replace=size > len(arr))
            ids, n_rows = lookup_ids(spec, embed_dim, arr[idx])
            need = max(need, a2a_required_capacity(ids, n_rows, n_model,
                                                   n_data=n_data))
    if cap > 0:
        if cap < need:
            raise ValueError(
                f"a2a_capacity={cap} is below the calibrated requirement "
                f"{need} (largest per-owner unique-id bucket over "
                f"{n_batches} sample batches per pool). An undersized "
                f"capacity NaN-poisons the step — raise --a2a_capacity to "
                f">= {need}, pass 0 to auto-calibrate, or -1 for the "
                f"always-exact setting.")
        return cap
    auto = int(-(-int(np.ceil(need * headroom)) // 8) * 8)
    if verbose:
        print(f"a2a_capacity auto-calibrated: {auto} "
              f"(measured requirement {need} x{headroom} headroom)")
    return auto


def a2a_lookup(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh,
               capacity: int | None = None) -> jnp.ndarray:
    """Dedup + all-to-all row-sharded embedding gather (see module notes).

    table: [R, E], R % mesh.shape['model'] == 0, sharded P('model', None)
    ids:   int [B, F], B % mesh.shape['data'] == 0, sharded P('data', None)
    capacity: static per-owner bucket size. None = always-exact local id
      count (B·F / data-axis) — correct for any id distribution but with
      no traffic win; pass a measured bound (a2a_required_capacity) to get
      the O(unique-rows) exchange. An overflowing batch NaN-poisons its
      output (loud failure; never silent zero rows / dropped gradients).
    returns [B, F, E] sharded P('data', None, None); differentiable w.r.t.
      ``table`` (scatter-add transpose, psum'd over 'data').
    """
    n_model = mesh.shape["model"]
    n_data = mesh.shape.get("data", 1)
    if table.shape[0] % n_model:
        raise ValueError(
            f"table rows {table.shape[0]} not divisible by model={n_model}"
            " (use pad_table_rows / FeatureSpec.pad_vocab)")
    n_local = int(np.prod(ids.shape)) // n_data
    cap = n_local if capacity is None else min(int(capacity), n_local)
    cfg = _A2ACfg(mesh=mesh, capacity=max(cap, 1),
                  rows_per=table.shape[0] // n_model,
                  n_rows=table.shape[0])
    return _a2a_lookup(cfg, table, ids)
