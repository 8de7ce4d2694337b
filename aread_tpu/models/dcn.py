"""DCN (reference model/dcn.py): CrossNetwork ∥ MLP -> concat -> linear."""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.cross import CrossNetwork
from aread_tpu.ops.mlp import MLP, Linear


class DCN(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    n_cross_layers: int = 3
    mlp_dims: Tuple[int, ...] = (256, 128, 64)
    dropout: float = 0.2

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^mlp/.*/kernel$", 1e-5),
        # MLP BN scales are reg'd by the reference filter (see deepfm.py)
        (r"^mlp/bn_\d+/scale$", 1e-5),
        (r"^cn/w_\d+$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        flat = embedding(x, squeeze_dim=True)
        cn_out = CrossNetwork(self.n_cross_layers, name="cn")(flat)
        mlp_out = MLP(self.mlp_dims, self.dropout, output_layer=False, name="mlp")(flat, train=train, mask=mask)
        stack = jnp.concatenate([cn_out, mlp_out], axis=1)
        logit = (linear(flat) + Linear(1, use_bias=False, name="mlp_linear")(stack))[:, 0]
        return {"logit": logit, "prob": nn.sigmoid(logit)}
