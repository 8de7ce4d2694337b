"""AdaSparse (reference model/adasparse.py): a deep tower whose layers are
pruned by domain-conditioned pruner nets: pi = beta * sigmoid(alpha *
pruner([h, stop_grad(domain_embed)])), hard-zeroed below epsilon."""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.attention import AttentionTower
from aread_tpu.ops.cross import CrossNetwork
from aread_tpu.ops.initializers import normal_init
from aread_tpu.ops.mlp import BatchNorm, Dropout, Linear


class AdaSparse(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    hidden_dims: Tuple[int, ...] = (256, 128, 64)
    dropout: float = 0.2
    alpha: float = 1.0
    beta: float = 2.0
    epsilon: float = 0.25
    use_dcn: bool = True
    use_atten: bool = True
    n_cross_layers: int = 3
    atten_embed_dim: int = 64
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^dnn_linear_\d+/kernel$", 1e-5),
        (r"^pruner_\d+/kernel$", 1e-5),
        (r"^cn/w_\d+$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        embed_x = embedding(x)
        domain_embed = jax.lax.stop_gradient(embed_x[:, self.spec.domain_idx, :])
        flat = embed_x.reshape(embed_x.shape[0], -1)

        # DNN_w_Pruner (adasparse.py:22-72); linears use N(0, 1e-4) init.
        h = flat
        for i, dim in enumerate(self.hidden_dims):
            fc = nn.Dense(dim, kernel_init=normal_init(1e-4), name=f"dnn_linear_{i}")(h)
            pi_in = jnp.concatenate([h, domain_embed], axis=-1)
            pi = self.beta * nn.sigmoid(self.alpha * Linear(dim, name=f"pruner_{i}")(pi_in))
            pi = jnp.where(jnp.abs(pi) - self.epsilon <= 0, 0.0, pi)
            fc = fc * pi
            fc = BatchNorm(name=f"bn_{i}")(fc, train=train, mask=mask)
            fc = nn.relu(fc)
            h = Dropout(self.dropout, name=f"drop_{i}")(fc, train=train)

        logit = Linear(1, name="dnn_linear_out")(h) + linear(flat)
        if self.use_dcn:
            cn_out = CrossNetwork(self.n_cross_layers, name="cn")(flat)
            logit = logit + Linear(1, use_bias=False, name="cn_linear")(cn_out)
        if self.use_atten:
            logit = logit + AttentionTower(
                self.spec.field_num, self.embed_dim, self.atten_embed_dim,
                self.att_layer_num, self.att_head_num, self.att_res, self.dropout,
                name="atten")(flat, train=train)
        logit = logit[:, 0]
        return {"logit": logit, "prob": nn.sigmoid(logit)}
