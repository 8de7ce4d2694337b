"""Model-zoo foundations: the feature specification, the shared embedding +
first-order linear backbone every model builds on, and the manual
L2-regularization mechanism.

The reference's ``BaseModel`` (model/layer.py:9-112) bundles three things:
the fused embedding, a linear logit head, and a list of
(weights, l1, l2) regularization entries summed into the loss each step.
Here the same contract is expressed functionally:
  * models are flax modules whose __call__ returns a dict with at least
    ``logit`` (pre-sigmoid) and ``prob`` — the trainer always computes BCE
    from logits for numerical stability (mathematically identical to the
    reference's BCELoss-on-probabilities);
  * each model class declares ``REG_RULES``: (path_regex, l2) pairs matched
    against '/'-joined parameter paths; ``regularization_loss`` walks the
    pytree once — reproducing BaseModel.get_regularization_loss
    (layer.py:96-112) without per-step Python overhead inside jit.
"""

from __future__ import annotations

import dataclasses
import re
from typing import ClassVar, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from aread_tpu.ops.embedding import FeaturesEmbedding, FeaturesLinear


@dataclasses.dataclass(frozen=True)
class FeatureSpec:
    """Static description of the tabular input layout.

    Mirrors the reference multi_hot_dict + one_hot_feature_dims contract
    (run.py:151-158, 378-381): ``one_hot_dims[i]`` is the vocab size of
    one-hot column i; multi-hot (history-seq) columns follow the one-hot
    columns, ``seq_maxlen`` per sequence field, and share the itemid rows.
    """

    one_hot_dims: Tuple[int, ...]
    n_seq_fields: int
    itemid_idx: int
    domain_idx: int
    seq_maxlen: int = 5
    method: str = "mean"
    # Store the fused table flat as [n_rows*E/128, 128] (TPU lane-packed;
    # see ops/embedding.FeaturesEmbedding.flat_storage). Set via
    # with_flat_table(embed_dim), which also pads the vocab.
    flat_table: bool = False
    # Storage dtype of the fused table (config.table_dtype): 'bfloat16'
    # halves the table's share of the sparse-Adam sweep AND the forward
    # gather traffic; optimizer compute stays f32 with stochastic-rounded
    # writes (ops/rounding.py), forward casts gathered rows to f32.
    table_dtype: str = "float32"

    @property
    def multi_hot_flag(self) -> Tuple[bool, ...]:
        return tuple([False] * len(self.one_hot_dims) + [True] * (self.n_seq_fields * self.seq_maxlen))

    @property
    def n_columns(self) -> int:
        return len(self.one_hot_dims) + self.n_seq_fields * self.seq_maxlen

    @property
    def field_num(self) -> int:
        return len(self.one_hot_dims) + self.n_seq_fields

    def embed_output_dim(self, embed_dim: int) -> int:
        return self.field_num * embed_dim

    def pad_vocab(self, multiple: int) -> "FeatureSpec":
        """Pad the fused table's total rows to a multiple of the model-mesh
        axis by growing the LAST field's vocab (appended rows are never
        referenced by any id, and offsets of existing fields are unchanged).
        Required because sharded device_put needs divisible leading dims."""
        total = int(np.sum(self.one_hot_dims))
        pad = (-total) % multiple
        if pad == 0:
            return self
        dims = list(self.one_hot_dims)
        dims[-1] += pad
        return dataclasses.replace(self, one_hot_dims=tuple(dims))

    def with_flat_table(self, embed_dim: int) -> "FeatureSpec":
        """Enable TPU lane-packed [n_rows*E/128, 128] table storage (see
        ops/embedding.FeaturesEmbedding.flat_storage), padding the last
        field's vocab so n_rows divides evenly into 128-lane flat rows.
        No-op (returns self) when 128 is not a multiple of embed_dim."""
        if 128 % embed_dim != 0:
            return self
        return dataclasses.replace(self.pad_vocab(128 // embed_dim),
                                   flat_table=True)


def make_embedding(spec: FeatureSpec, embed_dim: int, name: str = "embedding") -> FeaturesEmbedding:
    return FeaturesEmbedding(
        one_hot_dims=tuple(int(d) for d in spec.one_hot_dims),
        embed_dim=embed_dim,
        multi_hot_flag=spec.multi_hot_flag,
        itemid_idx=spec.itemid_idx,
        seq_maxlen=spec.seq_maxlen,
        method=spec.method,
        flat_storage=spec.flat_table,
        param_dtype=jnp.dtype(spec.table_dtype),
        name=name,
    )


class CTRModel(nn.Module):
    """Base class carrying the feature spec and REG_RULES contract.

    Subclasses implement __call__(x, group=None, train=False, mask=None,
    **kw) -> dict with 'logit' and 'prob'. Multi-tower models return
    [B, n_tower]; single-output models return [B].
    """

    # (path_regex, l2) applied to '/'-joined param paths; first match wins.
    REG_RULES: ClassVar[Tuple[Tuple[str, float], ...]] = ()

    def _backbone(self, spec: FeatureSpec, embed_dim: int):
        """Embedding + linear head shared by every model (layer.py:19-24)."""
        embedding = make_embedding(spec, embed_dim)
        linear = FeaturesLinear(spec.embed_output_dim(embed_dim), name="linear")
        return embedding, linear


# Shared default rules: embedding table + linear head (layer.py:31-33).
BASE_REG_RULES: Tuple[Tuple[str, float], ...] = (
    (r"^embedding/table$", 1e-5),
    (r"^linear/kernel$", 1e-5),
)


def regularization_loss(params, rules: Sequence[Tuple[str, float]]):
    """Sum_l2 over parameters whose path matches a rule.

    Reproduces BaseModel.get_regularization_loss (layer.py:96-112): the
    penalty is added to the data loss (so its gradient flows through the
    same optimizer update), biases and BN parameters are excluded by rule
    construction.
    """
    flat = traverse_util.flatten_dict(params, sep="/")
    compiled = [(re.compile(pat), l2) for pat, l2 in rules]
    total = jnp.zeros(())
    for path, leaf in flat.items():
        for pat, l2 in compiled:
            if pat.search(path):
                # f32 accumulation (a bf16-stored table leaf would
                # otherwise sum its 48M squares in bf16); no-op for f32
                total = total + l2 * jnp.sum(
                    jnp.square(leaf.astype(jnp.float32)))
                break
    return total


def gather_group(preds: jnp.ndarray, group: jnp.ndarray) -> jnp.ndarray:
    """pred.gather(1, group) for multi-tower outputs (reference run.py:500)."""
    return jnp.take_along_axis(preds, group[:, None], axis=1)[:, 0]
