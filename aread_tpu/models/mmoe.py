"""MMoE (reference model/mmoe.py): n shared experts, per-group softmax
gates, per-group towers; optional DCN / self-attention side logits added to
every tower output.

TPU-first: the reference's Python loops over expert/gate/tower ModuleLists
(mmoe.py:55-59) become three stacked einsums; all towers are computed for
every sample and the trainer gathers the sample's group column, exactly as
the reference does (run.py:497-500).

Deviation (bug fix, not a port): the reference adds the raw CrossNetwork
output (shape [B, embed_output_dim]) directly to the [B, 1] tower logits
(layer.py:48-56 via mmoe.py:64-71), silently broadcasting the tower output
to [B, embed_output_dim]. Here cn_out is projected to a scalar logit with a
bias-free Linear first (the same pattern DCN itself uses, dcn.py:29,43).
"""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.attention import AttentionTower
from aread_tpu.ops.cross import CrossNetwork
from aread_tpu.ops.mlp import Linear, StackedLinear, StackedMLP


class MMoE(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    n_tower: int
    n_expert: int = 4
    expert_dims: Tuple[int, ...] = (256, 128, 64)
    tower_dims: Tuple[int, ...] = (64, 32)
    dropout: float = 0.2
    use_dcn: bool = True
    use_atten: bool = True
    n_cross_layers: int = 3
    atten_embed_dim: int = 64
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^experts/.*/kernel$", 1e-5),
        (r"^towers/.*/kernel$", 1e-5),
        # MLP BN scales are reg'd by the reference filter (see deepfm.py)
        (r"^(experts|towers)/bn_\d+/scale$", 1e-5),
        (r"^cn/w_\d+$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        flat = embedding(x, squeeze_dim=True)

        expert_outs = StackedMLP(self.n_expert, self.expert_dims, self.dropout, name="experts")(
            flat, train=train, mask=mask
        )  # [B, n_expert, D]
        gate_logits = StackedLinear(self.n_tower, self.n_expert, name="gates")(flat)  # [B, T, n_expert]
        gates = nn.softmax(gate_logits, axis=-1)
        tower_inputs = jnp.einsum("bte,bed->btd", gates, expert_outs)  # [B, T, D]

        tower_logits = StackedMLP(
            self.n_tower, self.tower_dims, self.dropout, output_layer=True, name="towers"
        )(tower_inputs, train=train, mask=mask)[..., 0]  # [B, T]

        side = linear(flat)
        if self.use_dcn:
            cn_out = CrossNetwork(self.n_cross_layers, name="cn")(flat)
            side = side + Linear(1, use_bias=False, name="cn_linear")(cn_out)
        if self.use_atten:
            side = side + AttentionTower(
                self.spec.field_num, self.embed_dim, self.atten_embed_dim,
                self.att_layer_num, self.att_head_num, self.att_res, self.dropout, name="atten",
            )(flat, train=train)
        logit = tower_logits + side  # broadcast [B,1] or [B,D?]
        return {"logit": logit, "prob": nn.sigmoid(logit)}
