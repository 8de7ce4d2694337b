"""DeepFM (reference model/dfm.py): linear + 2nd-order FM + MLP, sigmoid."""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.fm import FactorizationMachine
from aread_tpu.ops.mlp import MLP


class DeepFM(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    mlp_dims: Tuple[int, ...] = (256, 128)
    dropout: float = 0.2

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^mlp/.*/kernel$", 1e-5),
        # BN scales inside MultiLayerPerceptron ARE regularized by the
        # reference: its 'bn' not-in-name filter never matches the
        # ModuleList paths layers.N.weight (dfm.py:27, layer.py:203-218)
        (r"^mlp/bn_\d+/scale$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        embed_x = embedding(x)  # [B, F, E]
        flat = embed_x.reshape(embed_x.shape[0], -1)
        logit = (
            linear(flat)
            + FactorizationMachine(name="fm")(embed_x)
            + MLP(self.mlp_dims, self.dropout, output_layer=True, name="mlp")(flat, train=train, mask=mask)
        )[:, 0]
        return {"logit": logit, "prob": nn.sigmoid(logit)}
