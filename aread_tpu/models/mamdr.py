"""MAMDR base network (reference model/mamdr.py): plain embedding + MLP +
linear head. The Reptile meta-learning logic (get/set/update meta weights,
mamdr.py:39-57) is pure pytree arithmetic in aread_tpu.train.mamdr."""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.mlp import MLP


class MAMDR(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    mlp_dims: Tuple[int, ...] = (256, 128)
    dropout: float = 0.2

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^mlp/.*/kernel$", 1e-5),
        # MLP BN scales are reg'd by the reference filter (see deepfm.py)
        (r"^mlp/bn_\d+/scale$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        flat = embedding(x, squeeze_dim=True)
        logit = (linear(flat)
                 + MLP(self.mlp_dims, self.dropout, output_layer=True,
                       name="mlp")(flat, train=train, mask=mask))[:, 0]
        return {"logit": logit, "prob": nn.sigmoid(logit)}
