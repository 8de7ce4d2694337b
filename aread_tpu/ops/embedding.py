"""Shared feature-embedding engine.

Functionally reproduces the reference's ``FeaturesEmbedding``
(model/layer.py:129-183): one logical table of ``sum(one_hot_dims)`` rows,
per-field offsets added to raw ids, multi-hot (history-sequence) fields
reusing the itemid field's rows and mean/sum-pooled over ``seq_maxlen``
(pad rows included in the mean, exactly like ``torch.mean(..., dim=2)`` at
layer.py:174).

TPU-first design notes:
  * the lookup is a single ``jnp.take`` over a contiguous table — XLA lowers
    it to one fused dynamic-gather, and under a mesh the table can be
    row-sharded (see aread_tpu.parallel.embed_shard) with the same module
    providing the math reference;
  * offsets are a compile-time constant folded into the gather indices;
  * pooling is a reshape + mean, fused by XLA into the gather consumer.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from aread_tpu.ops.initializers import embedding_init, linear_kernel_init, linear_bias_init_for


# Trace-time override for the table row gather, so a mesh-aware lookup
# (parallel/embed_shard.a2a_lookup: dedup + all-to-all exchange) can replace
# the default jnp.take WITHOUT threading a callable through every model
# constructor. The override is consulted while flax traces __call__; callers
# (parallel/train_step.make_sharded_train_step) activate it around the body
# of their own locally-defined jitted step, so jit caches never mix override
# states (each make_* call produces a fresh function object).
_LOOKUP_OVERRIDE: list = []


class lookup_override:
    """Context manager: route FeaturesEmbedding row gathers through
    ``fn(table, row_ids) -> rows`` (row_ids pre-clipped to the table)."""

    def __init__(self, fn):
        self.fn = fn

    def __enter__(self):
        _LOOKUP_OVERRIDE.append(self.fn)
        return self.fn

    def __exit__(self, *exc):
        _LOOKUP_OVERRIDE.pop()
        return False


def gather_rows(table, row_ids):
    """The one row-gather primitive every lookup path goes through.

    row_ids must already be clipped to [0, table.shape[0]) — jnp.take's
    default out-of-bounds behavior is NaN-fill, which silently poisons
    training (the torch reference IndexErrors instead), and the a2a override
    returns zeros for out-of-range ids; pre-clipping keeps both total.
    """
    if _LOOKUP_OVERRIDE:
        return _LOOKUP_OVERRIDE[-1](table, row_ids)
    return jnp.take(table, row_ids, axis=0)


def compute_offsets(one_hot_dims: Sequence[int], n_multi_hot_slots: int, itemid_idx: int) -> np.ndarray:
    """Per-column row offsets into the fused table (reference layer.py:152-157)."""
    offsets = np.concatenate([[0], np.cumsum(one_hot_dims)[:-1]]).astype(np.int64)
    if n_multi_hot_slots > 0:
        multi = np.full((n_multi_hot_slots,), offsets[itemid_idx], dtype=np.int64)
        offsets = np.concatenate([offsets, multi])
    return offsets


class FeaturesEmbedding(nn.Module):
    """Fused multi-field embedding with multi-hot pooling.

    Input  x: int32 [B, n_one_hot + n_seq_fields*seq_maxlen]
    Output:   float [B, output_dim0, embed_dim]   (or flattened when
              ``squeeze_dim=True``), where
              output_dim0 = n_one_hot + n_seq_fields for mean/sum pooling.
    """

    one_hot_dims: Tuple[int, ...]
    embed_dim: int
    multi_hot_flag: Tuple[bool, ...]
    itemid_idx: int
    seq_maxlen: int
    method: str = "mean"  # 'mean' | 'sum' | None
    param_dtype: jnp.dtype = jnp.float32
    # Store the table as [n_rows*E/128, 128] instead of [n_rows, E].
    # On TPU, f32 arrays are lane-padded to 128 in the minor dim, so a
    # [1.5M, 32] table physically occupies 4x its bytes and every optimizer
    # pass (and any reshape to the packed view) pays 4x HBM traffic /
    # a full relayout. Flat storage makes the table, its Adam moments and
    # the Pallas sparse/fused Adam kernels all run at true byte size.
    # Requires 128 % E == 0 and n_rows % (128/E) == 0 (FeatureSpec.
    # with_flat_table pads the last vocab). Same N(0,1) iid init; row r of
    # the logical table lives at flat[r // rpf, (r % rpf)*E:(r%rpf+1)*E],
    # i.e. plain reshape order.
    flat_storage: bool = False

    @property
    def one_hot_field_num(self) -> int:
        return len(self.one_hot_dims)

    @property
    def multi_hot_slots(self) -> int:
        return int(np.sum(self.multi_hot_flag))

    @property
    def multi_hot_field_num(self) -> int:
        return self.multi_hot_slots // self.seq_maxlen if self.multi_hot_slots else 0

    @property
    def output_dim0(self) -> int:
        if self.method in ("mean", "sum"):
            return self.one_hot_field_num + self.multi_hot_field_num
        return self.one_hot_field_num + self.multi_hot_slots

    @property
    def n_rows(self) -> int:
        return int(np.sum(self.one_hot_dims))

    @nn.compact
    def __call__(self, x, squeeze_dim: bool = False):
        if self.method not in ("mean", "sum", None):
            raise ValueError(f"Invalid multi-hot method {self.method!r}")
        offsets = compute_offsets(self.one_hot_dims, self.multi_hot_slots, self.itemid_idx)
        ids = x + jnp.asarray(offsets, dtype=x.dtype)[None, :]
        if self.flat_storage:
            rpf = 128 // self.embed_dim
            assert 128 % self.embed_dim == 0 and self.n_rows % rpf == 0, (
                "flat_storage requires 128 %% E == 0 and n_rows %% (128/E)"
                " == 0 (use FeatureSpec.with_flat_table)")
            table = self.param("table", embedding_init,
                               (self.n_rows // rpf, 128), self.param_dtype)
            # clip at the table-row level (see mode='clip' note below), then
            # gather the 128-lane flat row and select the id's lane group
            fids = jnp.clip(ids, 0, self.n_rows - 1)
            frows = gather_rows(table, fids // rpf)  # [B, F, 128]
            frows = frows.reshape(fids.shape + (rpf, self.embed_dim))
            lane = (fids % rpf)[..., None, None]
            embed_x = jnp.take_along_axis(frows, lane, axis=2)[..., 0, :]
        else:
            table = self.param("table", embedding_init,
                               (self.n_rows, self.embed_dim), self.param_dtype)
            # pre-clip: see gather_rows — keeps the lookup total and finite
            # if an id exceeds its field vocab (the torch reference
            # IndexErrors in that case); vocab sizing is the loader's
            # contract.
            embed_x = gather_rows(
                table, jnp.clip(ids, 0, self.n_rows - 1))  # [B, F, E]
        # bf16 table storage (config.table_dtype): ALL downstream compute
        # stays f32 — cast the gathered rows up right after the gather
        # (no-op for f32 tables). Placed BEFORE the perturb tap so the
        # sparse data gradients (d loss / d rows) are f32 regardless of
        # storage dtype.
        if embed_x.dtype != jnp.float32:
            embed_x = embed_x.astype(jnp.float32)
        # Sparse-gradient tap: a flax perturbation on the gathered rows.
        # Passthrough unless the caller supplies a 'perturbations'
        # collection; the trainers differentiate w.r.t. it to obtain
        # d loss/d rows WITHOUT materializing the dense [n_rows, E] table
        # cotangent (see ops/sparse_adam.py). Skipped during init so the
        # (batch-shaped) zero variable never enters the saved state.
        if not self.is_initializing():
            embed_x = self.perturb("rows", embed_x)

        if self.multi_hot_field_num > 0 and self.method in ("mean", "sum"):
            n_one = self.one_hot_field_num
            one_hot = embed_x[:, :n_one, :]
            multi = embed_x[:, n_one:, :].reshape(
                -1, self.multi_hot_field_num, self.seq_maxlen, self.embed_dim
            )
            pooled = jnp.mean(multi, axis=2) if self.method == "mean" else jnp.sum(multi, axis=2)
            embed_x = jnp.concatenate([one_hot, pooled], axis=1)

        if squeeze_dim:
            embed_x = embed_x.reshape(embed_x.shape[0], -1)
        return embed_x


class FeaturesLinear(nn.Module):
    """First-order linear head over the flattened embedding
    (reference layer.py:115-126)."""

    input_dim: int
    output_dim: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", linear_kernel_init, (self.input_dim, self.output_dim))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", linear_bias_init_for(self.input_dim), (self.output_dim,))
            y = y + bias
        return y
