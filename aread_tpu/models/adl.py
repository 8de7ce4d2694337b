"""ADL (reference model/adl.py): Distribution-Learning-Module routing — a
no-grad K-means-style soft assignment of samples to towers with EMA-updated
L2-normalized cluster centers; samples routed by argmax, per-cluster MLPs
with a STAR-style shared output-weight product.

TPU-first: instead of boolean row-scatter per tower (adl.py:99-115), all
towers compute densely and the routed tower's logit is selected with
take_along_axis — identical math, no dynamic shapes.

State: cluster centers live in the ``model_state`` collection and are
EMA-updated only during training steps (the reference also mutates them
during eval batches, adl.py:61-77 under no_grad; keeping eval pure is an
intentional deviation). ``eval_dlm_update=True`` (config
adl_eval_dlm_update, CLI --adl_eval_dlm_update) opts back into the
reference's eval-time mutation so the deviation's AUC effect can be
measured (VERDICT r3 item 3); the trainer then threads the mutated
centers through its eval loop (train/trainer.py evaluate).
"""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.attention import AttentionTower
from aread_tpu.ops.cross import CrossNetwork
from aread_tpu.ops.initializers import linear_bias_init_for, linear_kernel_init
from aread_tpu.ops.mlp import StackedMLP


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(x), axis=axis, keepdims=True), eps))


class ADL(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    n_tower: int
    tower_dims: Tuple[int, ...] = (256, 128, 64, 32)
    dlm_iters: int = 3
    dlm_update_rate: float = 0.9
    eval_dlm_update: bool = False  # replicate reference adl.py:61-77
    dropout: float = 0.2
    use_dcn: bool = True
    use_atten: bool = True
    n_cross_layers: int = 3
    atten_embed_dim: int = 64
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^domain_mlps/.*kernel$", 1e-5),
        (r"^shared_mlps/.*kernel$", 1e-5),
        # MLP BN scales are reg'd by the reference filter (see deepfm.py)
        (r"^(domain_mlps|shared_mlps)/bn_\d+/scale$", 1e-5),
        (r"^cn/w_\d+$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        flat = embedding(x, squeeze_dim=True)
        B, D = flat.shape

        centers_var = self.variable(
            "model_state", "cluster_centers",
            lambda: jax.random.normal(self.make_rng("params") if self.has_rng("params")
                                      else jax.random.PRNGKey(0), (self.n_tower, D)))
        centers = jax.lax.stop_gradient(centers_var.value)
        flat_ng = jax.lax.stop_gradient(flat)
        coeff = None
        for _ in range(self.dlm_iters):
            sim = flat_ng @ centers.T  # note: reference iterates from the
            coeff = nn.softmax(sim, axis=1)  # ORIGINAL centers each iter (adl.py:69)
            tmp_centers = _l2_normalize(coeff.T @ flat_ng, axis=1)
        if (train or self.eval_dlm_update) and not self.is_initializing():
            centers_var.value = _l2_normalize(
                self.dlm_update_rate * centers + (1 - self.dlm_update_rate) * tmp_centers, axis=1)
        route = jnp.argmax(coeff, axis=1)  # [B]

        side = linear(flat)
        if self.use_dcn:
            cn_out = CrossNetwork(self.n_cross_layers, name="cn")(flat)
            side = side + nn.Dense(1, use_bias=False, kernel_init=linear_kernel_init,
                                   name="cn_linear")(cn_out)
        if self.use_atten:
            side = side + AttentionTower(
                self.spec.field_num, self.embed_dim, self.atten_embed_dim,
                self.att_layer_num, self.att_head_num, self.att_res, self.dropout,
                name="atten")(flat, train=train)

        touts = StackedMLP(self.n_tower, self.tower_dims, self.dropout,
                           name="domain_mlps")(flat, train=train, mask=mask)  # [B,T,D']
        shared_out = StackedMLP(1, self.tower_dims, self.dropout,
                                name="shared_mlps")(flat, train=train, mask=mask)
        # STAR-style output weight product (adl.py:107-110)
        dk = self.param("domain_mlps_linears_kernel", linear_kernel_init,
                        (self.n_tower, self.tower_dims[-1], 1))
        db = self.param("domain_mlps_linears_bias",
                        linear_bias_init_for(self.tower_dims[-1]), (self.n_tower, 1))
        sk = self.param("shared_mlps_linear_kernel", linear_kernel_init,
                        (self.tower_dims[-1], 1))
        sb = self.param("shared_mlps_linear_bias",
                        linear_bias_init_for(self.tower_dims[-1]), (1,))
        tower_logits = jnp.einsum("btd,tdf->btf", touts, dk * sk[None])[..., 0] \
            + (db + sb[None])[None, :, 0]
        tower_logits = tower_logits + side  # [B, T]
        logit = jnp.take_along_axis(tower_logits, route[:, None], axis=1)[:, 0]
        return {"logit": logit, "prob": nn.sigmoid(logit), "route": route}
