"""AREAD — Adaptive REcommendation for All Domains (reference
model/aread.py, the AAAI'25 centerpiece).

Architecture (reference aread.py:46-127):
  * base feature extractor: MMoE (4 experts, one gate per level-0 tower)
    or a PLE CGC stack;
  * HEI: levels of towers n_tower = (g, 2g, 4g) with per-tower gates at
    levels >= 1 taking [domain_embed || group_embed] and softmaxing over the
    previous level's towers;
  * leaves: per-leaf linear over [cn_out || tower_out] plus the shared
    first-order logit, sigmoid.

TPU-first HEI: the reference's Python loop over levels/towers with boolean
branching (hier_tower_mask_forward, aread.py:263-322) becomes, per level,
ONE stacked einsum for all tower MLPs and ONE masked-renormalized gate
einsum. Per-domain HEMP masks arrive as runtime boolean arrays with static
shapes — mask evolution never recompiles. Inactive towers are computed
densely and zeroed; with g=3 levels (3,6,12) the dense compute is a few
hundred kFLOPs/row and lives entirely on the MXU, which beats the
reference's branchy skipping by orders of magnitude on TPU.

Forward modes (reference aread.py:129-261):
  * 'wo_mask'            — warm-up; all edges active, mean over all leaves;
  * 'domain_with_mask'   — single-domain batch through a mask, mean over
                           active leaves;
  * 'domain_mask_bagging'— same but returns the full leaf stack so the
                           trainer averages per-leaf losses (bagging);
  * 'domain_mask_final'  — frozen body + trainable softmax final gate over
                           leaves (reference's optional final-gate flow);
  * 'batch_with_mask'    — serving-only: PER-EXAMPLE masks (each array in
                           domain_mask carries a leading batch dim), so a
                           mixed-domain request runs as ONE dispatch
                           instead of one per domain (the reference's eval
                           loop, run.py:718-727, is per-domain because
                           torch branches on mask booleans; the dense
                           masked einsum here is batch-shape agnostic).

Every mode also returns per-level mean gate values (the accumulator the
reference mutates on the module, aread.py:383-430) as a pure output; the
HEMP host loop aggregates them in numpy.

Note: the reference builds an attention side tower for AREAD when
config.use_atten (aread.py:77-78, 140-141) but never uses its output in any
prediction path — we skip computing it.
"""

from __future__ import annotations

from typing import ClassVar, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.models.ple import CGC
from aread_tpu.ops.cross import CrossNetwork
from aread_tpu.ops.embedding import FeaturesEmbedding
from aread_tpu.ops.initializers import embedding_init
from aread_tpu.ops.mlp import StackedLinear, StackedMLP
from aread_tpu.ops.initializers import linear_kernel_init


def full_mask(n_tower: Sequence[int]) -> Tuple[np.ndarray, ...]:
    """All-edges-active HEMP mask: [1,T0], [T0,T1], ..., [T_last,1]."""
    masks = [np.ones((1, n_tower[0]), bool)]
    for l in range(1, len(n_tower)):
        masks.append(np.ones((n_tower[l - 1], n_tower[l]), bool))
    masks.append(np.ones((n_tower[-1], 1), bool))
    return tuple(masks)


class AREAD(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    n_tower: Tuple[int, ...]  # towers per level, e.g. (3, 6, 12)
    n_domain: int
    base_model: str = "mmoe"  # 'mmoe' | 'ple'
    expert_dims: Tuple[int, ...] = (256, 128, 64)
    tower_dims: Tuple[Tuple[int, ...], ...] = ((64, 32), (32, 16), (16, 8))
    dropout: float = 0.2
    use_dcn: bool = True
    n_cross_layers: int = 3
    mmoe_n_expert: int = 4
    ple_n_expert_specific: int = 2
    ple_n_expert_shared: int = 2
    ple_expert_dims: Tuple[Tuple[int, ...], ...] = ((256, 128), (64,))

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^mmoe_experts/.*kernel$", 1e-5),
        (r"^cgc_\d+/.*kernel$", 1e-5),
        (r"^towers_\d+/.*kernel$", 1e-5),
        # MLP BN scales are reg'd by the reference filter (see deepfm.py)
        (r"^(mmoe_experts|towers_\d+)/bn_\d+/scale$", 1e-5),
        (r"^cn/w_\d+$", 1e-5),
    )

    @property
    def n_level(self) -> int:
        return len(self.n_tower)

    @property
    def edge_num(self) -> int:
        """aread.py:54: input edges + inter-level edges + output edges."""
        inner = sum(self.n_tower[l - 1] * self.n_tower[l] for l in range(1, self.n_level))
        return self.n_tower[0] + inner + self.n_tower[-1]

    @nn.compact
    def __call__(self, x, domain_mask=None, mode: str = "wo_mask",
                 group=None, train: bool = False, mask=None,
                 record_gates: bool = False):
        """domain_mask: tuple of n_level+1 boolean arrays (shapes as
        ``full_mask``); required for masked modes. Returns a dict:
          prob [B] (wo_mask / domain_with_mask / domain_mask_final),
          leaf_prob/leaf_logit [B, T_last] + leaf_active [T_last] (always),
          gate_means: tuple of [T_{l-1}, T_l] mean gate values per level.
        """
        assert mode in ("wo_mask", "domain_with_mask", "domain_mask_bagging",
                        "domain_mask_final", "batch_with_mask")
        # per-example masks: every dm array gains a leading [B] dim
        per_ex = mode == "batch_with_mask"
        # serving-only: with train=True the per-tower BN stat gating
        # (tower_gate) is undefined per-example — ungated updates would
        # fold mask-zeroed rows into running stats
        assert not (per_ex and train), "batch_with_mask is eval-only"
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        embed_x = embedding(x)
        domain_embed = embed_x[:, self.spec.domain_idx, :]
        flat = embed_x.reshape(embed_x.shape[0], -1)
        B = flat.shape[0]

        linear_out = linear(flat)  # [B, 1]
        cn_out = CrossNetwork(self.n_cross_layers, name="cn")(flat) if self.use_dcn else None

        # ----- base extractor -> level-0 tower inputs [B, T0, D]
        if self.base_model == "mmoe":
            expert_outs = StackedMLP(self.mmoe_n_expert, self.expert_dims,
                                     self.dropout, name="mmoe_experts")(
                flat, train=train, mask=mask)  # [B, E, D]
            gate_logits = StackedLinear(self.n_tower[0], self.mmoe_n_expert,
                                        name="mmoe_gates")(flat)
            gates0 = nn.softmax(gate_logits, axis=-1)
            tower_inputs = jnp.einsum("bte,bed->btd", gates0, expert_outs)
        elif self.base_model == "ple":
            n_level_ple = len(self.ple_expert_dims)
            outs = jnp.broadcast_to(flat[:, None, :],
                                    (B, self.n_tower[0] + 1, flat.shape[1]))
            for i in range(n_level_ple):
                outs = CGC(i + 1, n_level_ple, self.n_tower[0],
                           self.ple_n_expert_specific, self.ple_n_expert_shared,
                           self.ple_expert_dims[i], self.dropout,
                           name=f"cgc_{i}")(outs, train=train, mask=mask)
            tower_inputs = outs[:, :self.n_tower[0], :]
        else:
            raise ValueError(f"unknown base_model {self.base_model}")

        # ----- group embedding + gate inputs
        group_table = self.param("group_embedding", embedding_init,
                                 (self.n_tower[0], self.embed_dim))
        if mode == "wo_mask":
            group_embed = jnp.zeros_like(domain_embed)  # aread.py:157-158
            dm = tuple(jnp.asarray(m) for m in full_mask(self.n_tower))
        else:
            assert domain_mask is not None, "masked modes need a domain_mask"
            dm = tuple(jnp.asarray(m) for m in domain_mask)
            if per_ex:
                m0 = dm[0][:, 0, :].astype(flat.dtype)  # [B, T0]
                group_embed = (m0 / jnp.maximum(
                    m0.sum(axis=1, keepdims=True), 1e-8)) @ group_table
            else:
                m0 = dm[0][0].astype(flat.dtype)  # [T0]
                ge = (m0 / jnp.maximum(m0.sum(), 1e-8)) @ group_table  # [E]
                group_embed = jnp.broadcast_to(ge[None, :], domain_embed.shape)
        gate_inputs = jnp.concatenate([domain_embed, group_embed], axis=1)
        if mode == "domain_mask_final":
            # body frozen when training the final gate (aread.py:246-256)
            gate_inputs_body = jax.lax.stop_gradient(gate_inputs)
        else:
            gate_inputs_body = gate_inputs

        # ----- HEI levels
        gate_means = []
        # active towers per level: level l tower t active iff any input edge
        if per_ex:
            active = [dm[0][:, 0, :]]  # [B, T0] bool
            for l in range(1, self.n_level):
                active.append(jnp.any(dm[l], axis=1))  # [B, T_l]
            leaf_active = dm[self.n_level][:, :, 0]  # [B, T_last]
        else:
            active = [dm[0][0]]  # [T0] bool
            for l in range(1, self.n_level):
                active.append(jnp.any(dm[l], axis=0))
            leaf_active = dm[self.n_level][:, 0]  # [T_last]

        outs = None
        for l in range(self.n_level):
            with jax.named_scope(f"hei_level_{l}"):
                T_l = self.n_tower[l]
                # [T_l] shared mask, or [B, T_l] per-example
                act = active[l].astype(flat.dtype)
                actb = act[:, :, None] if per_ex else act[None, :, None]
                if l == 0:
                    level_in = tower_inputs * actb
                else:
                    gl = StackedLinear(T_l, self.n_tower[l - 1],
                                       name=f"tower_gates_{l}")(gate_inputs_body)
                    gate_out = nn.softmax(gl, axis=-1)  # [B, T_l, T_{l-1}]
                    if per_ex:
                        edge_mask = jnp.swapaxes(dm[l], 1, 2).astype(flat.dtype)
                        masked = gate_out * edge_mask  # [B, T_l, T_{l-1}]
                    else:
                        edge_mask = dm[l].T.astype(flat.dtype)  # [T_l, T_{l-1}]
                        masked = gate_out * edge_mask[None]
                    renorm = masked / (jnp.sum(masked, axis=-1, keepdims=True) + 1e-8)
                    level_in = jnp.einsum("btp,bpd->btd", renorm, outs)
                    # recorded value = mean_B(gate_out * edge_mask) (aread.py:291-295)
                    gm = jnp.mean(masked, axis=0)  # [T_l, T_{l-1}]
                    gate_means.append(jax.lax.stop_gradient(gm.T))  # [T_{l-1}, T_l]
                body = StackedMLP(T_l, self.tower_dims[l], self.dropout,
                                  name=f"towers_{l}")(
                    level_in, train=train, mask=mask,
                    # per-example BN stat gating is undefined; batch_with_mask
                    # is a serving (train=False) mode where the gate is unused
                    tower_gate=None if per_ex else active[l])
                if mode == "domain_mask_final":
                    body = jax.lax.stop_gradient(body)
                outs = body * actb  # zero inactive towers

        # ----- leaves: per-leaf linear over [cn_out || leaf_out] + shared
        # first-order logit (aread.py:119-121, 184-185, 303-310)
        if cn_out is not None:
            leaf_in = jnp.concatenate(
                [jnp.broadcast_to(cn_out[:, None, :], (B, self.n_tower[-1], cn_out.shape[1])),
                 outs], axis=-1)
        else:
            leaf_in = outs
        if mode == "domain_mask_final":
            leaf_in = jax.lax.stop_gradient(leaf_in)
            lin = jax.lax.stop_gradient(linear_out)
        else:
            lin = linear_out
        leaf_logit = StackedLinear(self.n_tower[-1], 1, use_bias=False,
                                   name="towers_linear")(leaf_in)[..., 0] + lin  # [B, T_last]
        leaf_prob = nn.sigmoid(leaf_logit)

        out = {"leaf_logit": leaf_logit, "leaf_prob": leaf_prob,
               "leaf_active": leaf_active, "gate_means": tuple(gate_means)}
        la = leaf_active.astype(flat.dtype)
        if mode == "wo_mask":
            out["prob"] = jnp.mean(leaf_prob, axis=1)  # aread.py:186
        elif mode == "domain_with_mask":
            out["prob"] = jnp.sum(leaf_prob * la[None], axis=1) / jnp.maximum(la.sum(), 1e-8)
        elif mode == "batch_with_mask":  # la: [B, T_last]
            out["prob"] = jnp.sum(leaf_prob * la, axis=1) / jnp.maximum(
                la.sum(axis=1), 1e-8)
        elif mode == "domain_mask_final":
            fg = nn.softmax(
                nn.Dense(self.n_tower[-1], use_bias=False,
                         kernel_init=linear_kernel_init, name="final_gate")(
                    jax.lax.stop_gradient(gate_inputs)), axis=1)
            fg = fg * la[None]
            fg = fg / (jnp.sum(fg, axis=1, keepdims=True) + 1e-8)
            # the whole leaf stack is computed under no_grad in the
            # reference (aread.py:246-256) — towers_linear included; only
            # the final gate trains
            out["prob"] = jnp.sum(jax.lax.stop_gradient(leaf_prob) * fg, axis=1)
        else:  # domain_mask_bagging — trainer consumes the leaf stack
            out["prob"] = jnp.sum(leaf_prob * la[None], axis=1) / jnp.maximum(la.sum(), 1e-8)
        out["logit"] = jnp.log(jnp.clip(out["prob"], 1e-7, 1 - 1e-7)) - \
            jnp.log1p(-jnp.clip(out["prob"], 1e-7, 1 - 1e-7))
        return out
