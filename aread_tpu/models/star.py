"""STAR (reference model/star.py): star-topology — per-group element-wise
PRODUCT of domain and shared FC weights (+ summed biases), partitioned
normalization (per-group BN with gamma*shared_gamma, beta+shared_beta), all
towers computed for every sample.

TPU-first: all groups run as one stacked einsum with the effective kernel
``domain_kernel[T] * shared_kernel`` formed on the fly (XLA fuses the
product into the matmul's operand); per-group BN statistics live in a
[T, D]-shaped stats buffer.
"""

from __future__ import annotations

from typing import ClassVar, Tuple

import flax.linen as nn
import jax.numpy as jnp

from aread_tpu.models.base import BASE_REG_RULES, CTRModel, FeatureSpec
from aread_tpu.ops.attention import AttentionTower
from aread_tpu.ops.initializers import linear_bias_init_for, linear_kernel_init
from aread_tpu.ops.mlp import BatchNorm, Dropout

class STAR(CTRModel):
    spec: FeatureSpec
    embed_dim: int
    n_tower: int
    tower_dims: Tuple[int, ...] = (256, 128, 64, 32)
    dropout: float = 0.2
    use_dcn: bool = False  # reference hard-forces use_dcn=False (star.py:28)
    use_atten: bool = True
    atten_embed_dim: int = 64
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True

    REG_RULES: ClassVar = BASE_REG_RULES + (
        (r"^domain_dnns_kernel_\d+$", 1e-5),
        (r"^shared_dnn_kernel_\d+$", 1e-5),
    )

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, mask=None):
        embedding, linear = self._backbone(self.spec, self.embed_dim)
        flat = embedding(x, squeeze_dim=True)
        B, D = flat.shape
        T = self.n_tower

        side = linear(flat)
        if self.use_atten:
            side = side + AttentionTower(
                self.spec.field_num, self.embed_dim, self.atten_embed_dim,
                self.att_layer_num, self.att_head_num, self.att_res, self.dropout,
                name="atten")(flat, train=train)

        # Partitioned normalization (star.py:36-39, 103-167): per-group BN
        # with effective scale gamma_g * shared_gamma, bias beta_g + shared_beta.
        shared_bn_w = self.param("shared_bn_weight", nn.initializers.ones, (D,))
        shared_bn_b = self.param("shared_bn_bias", nn.initializers.zeros, (D,))
        h = jnp.broadcast_to(flat[:, None, :], (B, T, D))
        h = BatchNorm(name="domain_norm")(h, train=train, mask=mask,
                                          scale_mod=shared_bn_w[None, :],
                                          bias_mod=shared_bn_b[None, :])

        # Domain towers with weight product + bias sum (star.py:82-94).
        dims = (D,) + tuple(self.tower_dims)
        for i in range(len(self.tower_dims)):
            dk = self.param(f"domain_dnns_kernel_{i}", linear_kernel_init,
                            (T, dims[i], dims[i + 1]))
            db = self.param(f"domain_dnns_bias_{i}",
                            linear_bias_init_for(dims[i]), (T, dims[i + 1]))
            sk = self.param(f"shared_dnn_kernel_{i}", linear_kernel_init,
                            (dims[i], dims[i + 1]))
            sb = self.param(f"shared_dnn_bias_{i}",
                            linear_bias_init_for(dims[i]), (dims[i + 1],))
            eff_k = dk * sk[None]
            h = jnp.einsum("btd,tdf->btf", h, eff_k) + (db + sb[None])[None]
            h = BatchNorm(name=f"domain_dnns_bn_{i}")(h, train=train, mask=mask)
            h = nn.relu(h)
            h = Dropout(self.dropout, name=f"drop_{i}")(h, train=train)

        dk = self.param("domain_dnn_linears_kernel", linear_kernel_init,
                        (T, dims[-1], 1))
        db = self.param("domain_dnn_linears_bias",
                        linear_bias_init_for(dims[-1]), (T, 1))
        sk = self.param("shared_dnn_linear_kernel", linear_kernel_init, (dims[-1], 1))
        sb = self.param("shared_dnn_linear_bias", linear_bias_init_for(dims[-1]), (1,))
        logit = jnp.einsum("btd,tdf->btf", h, dk * sk[None])[..., 0] + (db + sb[None])[None, :, 0]
        logit = logit + side
        return {"logit": logit, "prob": nn.sigmoid(logit)}
