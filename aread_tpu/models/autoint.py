"""AutoInt (reference model/autoint.py): stacked multi-head self-attention
over field embeddings + value residual, concatenated with a deep MLP."""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.attention import MultiHeadSelfAttention
from aread_tpu.ops.mlp import MLP, Linear


class AutoInt(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    atten_embed_dim: int = 64
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True
    mlp_dims: Tuple[int, ...] = (256, 128, 64)
    dropout: float = 0.2

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^dnn/.*/kernel$", 1e-5),
        # MLP BN scales are reg'd by the reference filter (see deepfm.py)
        (r"^dnn/bn_\d+/scale$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        embed_x = embedding(x)  # [B, F, E]
        atten_x = Linear(self.atten_embed_dim, name="atten_embedding")(embed_x)
        cross = atten_x
        for i in range(self.att_layer_num):
            cross = MultiHeadSelfAttention(
                self.atten_embed_dim, self.att_head_num, self.dropout, name=f"attn_{i}"
            )(cross, train=train)
        if self.att_res:
            cross = cross + Linear(self.atten_embed_dim, name="v_res")(embed_x)
        cross = nn.relu(cross).reshape(x.shape[0], -1)

        flat = embed_x.reshape(x.shape[0], -1)
        dnn_out = MLP(self.mlp_dims, self.dropout, output_layer=False, name="dnn")(flat, train=train, mask=mask)
        final = jnp.concatenate([cross, dnn_out], axis=1)
        logit = (Linear(1, use_bias=False, name="dnn_linear")(final) + linear(flat))[:, 0]
        return {"logit": logit, "prob": nn.sigmoid(logit)}
