"""DCNv2 (reference model/dcnv2.py): CrossNetMix (low-rank MoE cross) or
CrossNetV2 with stacked/parallel/crossnet-only structures."""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.cross import CrossNetMix, CrossNetV2
from aread_tpu.ops.mlp import MLP, Linear


class DCNv2(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    n_cross_layers: int = 3
    mlp_dims: Tuple[int, ...] = (256, 128, 64)
    dropout: float = 0.2
    model_structure: str = "parallel"  # 'crossnet_only' | 'stacked' | 'parallel'
    use_low_rank_mixture: bool = True
    low_rank: int = 32
    num_experts: int = 4

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^dnn/.*/kernel$", 1e-5),
        # MLP BN scales are reg'd by the reference filter (see deepfm.py)
        (r"^dnn/bn_\d+/scale$", 1e-5),
        (r"^dnn_linear/kernel$", 1e-5),
        (r"^crossnet/(u|v|c)_\d+$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        assert self.model_structure in ("crossnet_only", "stacked", "parallel")
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        flat = embedding(x, squeeze_dim=True)
        if self.use_low_rank_mixture:
            cross = CrossNetMix(self.n_cross_layers, self.low_rank, self.num_experts, name="crossnet")(flat)
        else:
            cross = CrossNetV2(self.n_cross_layers, name="crossnet")(flat)
        if self.model_structure == "crossnet_only":
            final = cross
        elif self.model_structure == "stacked":
            final = MLP(self.mlp_dims, self.dropout, output_layer=False, name="dnn")(cross, train=train, mask=mask)
        else:
            dnn_out = MLP(self.mlp_dims, self.dropout, output_layer=False, name="dnn")(flat, train=train, mask=mask)
            final = jnp.concatenate([cross, dnn_out], axis=1)
        logit = (Linear(1, use_bias=False, name="dnn_linear")(final) + linear(flat))[:, 0]
        return {"logit": logit, "prob": nn.sigmoid(logit)}
