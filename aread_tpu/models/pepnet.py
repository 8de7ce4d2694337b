"""PEPNet / EPNet / EPNet-single (reference model/pepnet.py).

  * EPNet: a GateNN conditioned on [stop_grad(embed), domain_embed] scales
    the full embedding (pepnet.py:81-82);
  * PPNet: per-layer GateNN gates (chunked per tower) applied to tower-MLP
    inputs; the dense layers are SHARED across towers in the reference
    (``nn.ModuleList([one_tower_layer] * n_tower)``, pepnet.py:163) — here
    one kernel applied via einsum to all towers;
  * three variants by (use_ppnet, n_tower): pepnet / epnet / epnet-single
    (reference run.py:405-417).

Deviation noted: per-tower BatchNorm running statistics are kept per tower
(stats shape [T, D]) instead of the reference's single stats buffer being
sequentially overwritten by each tower's forward — the train-time math is
identical; only the eval-time running averages differ slightly.
"""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.attention import AttentionTower
from aread_tpu.ops.cross import CrossNetwork
from aread_tpu.ops.mlp import BatchNorm, Dropout, GateNN, Linear, StackedLinear, StackedMLP
from aread_tpu.ops.initializers import linear_kernel_init, linear_bias_init_for


class PPNetBlock(nn.Module):
    """Reference pepnet.py:139-181: per layer, a GateNN produces a
    [B, dims[idx]*T] gate; each tower's input is gated then passed through
    the (tower-shared) dense layer."""

    tower_dims: Tuple[int, ...]
    gate_hidden_dim: int
    n_tower: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, feature_emb, gate_emb, train: bool = False, mask=None):
        B = feature_emb.shape[0]
        gate_input = jnp.concatenate([jax.lax.stop_gradient(feature_emb), gate_emb], axis=-1)
        x = jnp.broadcast_to(feature_emb[:, None, :],
                             (B, self.n_tower, feature_emb.shape[-1]))
        dims = (feature_emb.shape[-1],) + tuple(self.tower_dims)
        for idx in range(len(self.tower_dims)):
            gw = GateNN(self.gate_hidden_dim, dims[idx] * self.n_tower,
                        name=f"gate_{idx}")(gate_input, train=train)
            gw = gw.reshape(B, self.n_tower, dims[idx])
            gated = x * gw
            # tower-shared dense layer (reference shares the module object)
            kernel = self.param(f"kernel_{idx}", linear_kernel_init, (dims[idx], dims[idx + 1]))
            bias = self.param(f"bias_{idx}", linear_bias_init_for(dims[idx]), (dims[idx + 1],))
            h = jnp.einsum("btd,df->btf", gated, kernel) + bias
            # tied_affine: the reference shares the BN module (and thus
            # gamma/beta) across towers too (pepnet.py:163); batch stats
            # stay per-tower (documented deviation: the reference's single
            # running-stats buffer is sequentially overwritten per tower)
            h = BatchNorm(name=f"bn_{idx}", tied_affine=True)(h, train=train,
                                                              mask=mask)
            h = nn.relu(h)
            x = Dropout(self.dropout, name=f"drop_{idx}")(h, train=train)
        return x  # [B, T, tower_dims[-1]]


class PEPNet(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    n_tower: int
    tower_dims: Tuple[int, ...] = (256, 128, 64, 32)
    gate_hidden_dim: int = 64
    use_ppnet: bool = True
    dropout: float = 0.2
    use_dcn: bool = True
    use_atten: bool = True
    n_cross_layers: int = 3
    atten_embed_dim: int = 64
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^epnet/.*kernel$", 1e-5),
        (r"^ppnet/.*kernel", 1e-5),
        (r"^towers/.*kernel$", 1e-5),
        # PPNet dense-block / tower-MLP BN scales are reg'd by the
        # reference filter (see deepfm.py; pepnet.py:158 BatchNorm1d)
        (r"^(ppnet|towers)/bn_\d+/scale$", 1e-5),
        (r"^cn/w_\d+$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        embed_x = embedding(x)  # [B, F, E]
        domain_embed = embed_x[:, self.spec.domain_idx, :]
        flat = embed_x.reshape(embed_x.shape[0], -1)

        epnet_weight = GateNN(self.gate_hidden_dim, flat.shape[-1], self.dropout,
                              name="epnet")(jnp.concatenate(
                                  [jax.lax.stop_gradient(flat), domain_embed], axis=-1),
                                  train=train)
        epnet_out = flat * epnet_weight

        side = linear(flat)
        if self.use_dcn:
            cn_out = CrossNetwork(self.n_cross_layers, name="cn")(flat)
            side = side + Linear(1, use_bias=False, name="cn_linear")(cn_out)
        if self.use_atten:
            side = side + AttentionTower(
                self.spec.field_num, self.embed_dim, self.atten_embed_dim,
                self.att_layer_num, self.att_head_num, self.att_res, self.dropout,
                name="atten")(flat, train=train)

        if self.use_ppnet:
            ppouts = PPNetBlock(self.tower_dims, self.gate_hidden_dim,
                                self.n_tower, self.dropout, name="ppnet")(
                flat, epnet_out, train=train, mask=mask)
            tower_logits = StackedLinear(self.n_tower, 1, use_bias=False,
                                         name="ppnet_linears")(ppouts)[..., 0]
            logit = tower_logits + side
        elif self.n_tower > 1:
            touts = StackedMLP(self.n_tower, self.tower_dims, self.dropout,
                               name="towers")(epnet_out, train=train, mask=mask)
            tower_logits = StackedLinear(self.n_tower, 1, use_bias=False,
                                         name="ppnet_linears")(touts)[..., 0]
            logit = tower_logits + side
        else:
            tout = StackedMLP(1, self.tower_dims, self.dropout, name="towers")(
                epnet_out, train=train, mask=mask)
            logit = (StackedLinear(1, 1, use_bias=False, name="ppnet_linears")(tout)[..., 0]
                     + side)[:, 0]
        return {"logit": logit, "prob": nn.sigmoid(logit)}
