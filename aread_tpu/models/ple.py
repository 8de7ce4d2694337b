"""PLE (reference model/ple.py): multi-level CGC — task-specific + shared
experts, per-task gates, plus a shared gate on non-final levels.

TPU-first: each CGC level's ModuleList loops (ple.py:99-128) become three
stacked einsums (specific experts, shared experts, gates). The level's task
inputs are carried as one [B, n_task+1, D] array.
"""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.attention import AttentionTower
from aread_tpu.ops.cross import CrossNetwork
from aread_tpu.ops.mlp import Linear, StackedLinear, StackedMLP


class CGC(nn.Module):
    """One Customized-Gate-Control level (reference ple.py:76-128).

    Input/output: [B, n_task(+1), D] — the trailing slot is the shared
    experts' input, present on non-final levels.
    """

    cur_level: int
    n_level: int
    n_task: int
    n_expert_specific: int
    n_expert_shared: int
    expert_dims: Tuple[int, ...]
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x_list, train: bool = False, mask=None):
        # x_list: [B, n_task+1, din]
        n_task, n_spec, n_shared = self.n_task, self.n_expert_specific, self.n_expert_shared
        spec_in = jnp.repeat(x_list[:, :n_task, :], n_spec, axis=1)  # [B, n_task*n_spec, din]
        spec_out = StackedMLP(n_task * n_spec, self.expert_dims, self.dropout,
                              use_bn=False, name="experts_specific")(spec_in, train=train, mask=mask)
        shared_in = jnp.broadcast_to(x_list[:, -1:, :],
                                     (x_list.shape[0], n_shared, x_list.shape[2]))
        shared_out = StackedMLP(n_shared, self.expert_dims, self.dropout,
                                use_bn=False, name="experts_shared")(shared_in, train=train, mask=mask)

        # per-task gates over (own specific + shared) experts
        gate_logits = StackedLinear(n_task, n_spec + n_shared, name="gates_specific")(
            x_list[:, :n_task, :])  # [B, n_task, n_spec+n_shared]
        gates = nn.softmax(gate_logits, axis=-1)
        spec_by_task = spec_out.reshape(x_list.shape[0], n_task, n_spec, -1)
        shared_rep = jnp.broadcast_to(shared_out[:, None],
                                      (x_list.shape[0], n_task, n_shared, shared_out.shape[-1]))
        per_task_experts = jnp.concatenate([spec_by_task, shared_rep], axis=2)
        task_outs = jnp.einsum("bte,bted->btd", gates, per_task_experts)

        if self.cur_level < self.n_level:
            all_experts = jnp.concatenate([spec_out, shared_out], axis=1)  # [B, n_all, D]
            shared_gate = nn.softmax(
                Linear(n_task * n_spec + n_shared, name="gate_shared")(x_list[:, -1, :]), axis=-1)
            shared_next = jnp.einsum("be,bed->bd", shared_gate, all_experts)
            return jnp.concatenate([task_outs, shared_next[:, None]], axis=1)
        return task_outs


class PLE(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    n_tower: int
    n_expert_specific: int = 2
    n_expert_shared: int = 2
    expert_dims: Tuple[Tuple[int, ...], ...] = ((256, 128), (64,))
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
        (r"^cgc_\d+/.*kernel$", 1e-5),
        (r"^towers/.*/kernel$", 1e-5),
        # tower MLP BN scales are reg'd by the reference filter (see
        # deepfm.py); CGC experts use bn=False (ple.py:87-90)
        (r"^towers/bn_\d+/scale$", 1e-5),
        (r"^cn/w_\d+$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        flat = embedding(x, squeeze_dim=True)

        n_level = len(self.expert_dims)
        ple_in = jnp.broadcast_to(flat[:, None, :],
                                  (flat.shape[0], self.n_tower + 1, flat.shape[1]))
        outs = ple_in
        for i in range(n_level):
            outs = CGC(i + 1, n_level, self.n_tower, self.n_expert_specific,
                       self.n_expert_shared, self.expert_dims[i], self.dropout,
                       name=f"cgc_{i}")(outs, train=train, mask=mask)

        tower_logits = StackedMLP(self.n_tower, self.tower_dims, self.dropout,
                                  output_layer=True, name="towers")(
            outs[:, :self.n_tower, :], train=train, mask=mask)[..., 0]

        side = linear(flat)
        if self.use_dcn:
            cn_out = CrossNetwork(self.n_cross_layers, name="cn")(flat)
            side = side + Linear(1, use_bias=False, name="cn_linear")(cn_out)
        if self.use_atten:
            side = side + AttentionTower(
                self.spec.field_num, self.embed_dim, self.atten_embed_dim,
                self.att_layer_num, self.att_head_num, self.att_res, self.dropout,
                name="atten")(flat, train=train)
        logit = tower_logits + side
        return {"logit": logit, "prob": nn.sigmoid(logit)}
