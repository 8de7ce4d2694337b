"""HiNet (reference model/hinet.py): per-scenario SEI (sub-expert
integration) blocks + a shared SEI + SAN attention over scenario features
gated by the domain embedding; the sample's own scenario features selected
by group id.

TPU-first: all T scenario SEIs (each 4 experts) run as a single
[T*4]-stacked einsum; the reference's boolean-scatter group select
(hinet.py:81-84) becomes a take_along_axis.

Deviation (bug fix): the reference routes hinet through
``model(X, group, targets=y)`` and returns (pred, targets); here the model
returns logits like every other model and the trainer passes ``group``.
"""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.attention import AttentionTower
from aread_tpu.ops.cross import CrossNetwork
from aread_tpu.ops.mlp import MLP, Linear, StackedLinear, StackedMLP


class SEIStack(nn.Module):
    """T parallel SEI blocks (reference hinet.py:14-27), each with
    ``n_expert`` MLP experts and a softmax gate."""

    n_stack: int
    hidden_dims: Tuple[int, ...]
    n_expert: int = 4
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        B = x.shape[0]
        T, E = self.n_stack, self.n_expert
        expert_outs = StackedMLP(T * E, self.hidden_dims, self.dropout,
                                 name="experts")(x, train=train, mask=mask)
        expert_outs = expert_outs.reshape(B, T, E, -1)
        gates = nn.softmax(StackedLinear(T, E, name="gate")(x), axis=-1)  # [B, T, E]
        return jnp.einsum("bte,bted->btd", gates, expert_outs)  # [B, T, D]


class HiNet(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    n_tower: int
    sei_dims: Tuple[int, ...] = (64, 32)
    tower_dims: Tuple[int, ...] = (256, 128, 64, 32)
    dropout: float = 0.2
    use_dcn: bool = True
    use_atten: bool = True
    n_cross_layers: int = 3
    atten_embed_dim: int = 64
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^specific_seis/.*kernel$", 1e-5),
        (r"^shared_sei/.*kernel$", 1e-5),
        (r"^san_gate/kernel$", 1e-5),
        (r"^tower/.*/kernel$", 1e-5),
        # SEI-expert / tower MLP BN scales are reg'd by the reference
        # filter (see deepfm.py)
        (r"^(specific_seis|shared_sei)/experts/bn_\d+/scale$", 1e-5),
        (r"^tower/bn_\d+/scale$", 1e-5),
        (r"^cn/w_\d+$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        assert group is not None, "HiNet requires the group (scenario) id"
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        embed_x = embedding(x)
        domain_embed = embed_x[:, self.spec.domain_idx, :]
        flat = embed_x.reshape(embed_x.shape[0], -1)

        specific = SEIStack(self.n_tower, self.sei_dims, dropout=self.dropout,
                            name="specific_seis")(flat, train=train, mask=mask)  # [B,T,D]
        shared = SEIStack(1, self.sei_dims, dropout=self.dropout,
                          name="shared_sei")(flat, train=train, mask=mask)[:, 0]  # [B,D]
        san_gate = nn.softmax(Linear(self.n_tower, name="san_gate")(domain_embed), axis=-1)
        san_feas = jnp.einsum("bt,btd->bd", san_gate, specific)
        con_feas = jnp.take_along_axis(specific, group[:, None, None].astype(jnp.int32), axis=1)[:, 0]

        feature = jnp.concatenate([shared, con_feas, san_feas], axis=1)
        tower_out = MLP(self.tower_dims, self.dropout, output_layer=False,
                        name="tower")(feature, train=train, mask=mask)
        logit = Linear(1, use_bias=False, name="tower_linear")(tower_out)

        logit = logit + linear(flat)
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
