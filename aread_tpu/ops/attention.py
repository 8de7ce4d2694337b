"""Self-attention over field embeddings (AutoInt-style).

Reproduces torch.nn.MultiheadAttention semantics used by the reference
(autoint.py:36-38, layer.py:63-66): fused in-projection, per-head scaled
dot-product with dropout on the attention weights, out-projection. The
field axis is short (~20 fields) so attention here is a few small batched
matmuls — XLA tiles them onto the MXU without a custom kernel.

Also provides AttentionTower, the reference BaseModel.build_atten /
atten_forward side tower (layer.py:58-84) usable by any model.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aread_tpu.ops.initializers import linear_bias_init_for
from aread_tpu.ops.mlp import Dropout, Linear


def _mha_in_proj_init(key, shape, dtype=jnp.float32):
    # torch MHA uses xavier_uniform_ on the packed (3E, E) in-proj weight.
    fan_in, fan_out = shape[-2], shape[-1]
    bound = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MultiHeadSelfAttention(nn.Module):
    """torch.nn.MultiheadAttention(embed_dim, num_heads, dropout) equivalent
    for self-attention over [B, L, E] (the reference feeds [L, B, E]; we use
    batch-first layout, the math is identical)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        e, h = self.embed_dim, self.num_heads
        head_dim = e // h
        in_w = self.param("in_proj_kernel", _mha_in_proj_init, (e, 3 * e))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        qkv = x @ in_w + in_b  # [B, L, 3E]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], h, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(head_dim)
        weights = nn.softmax(scores, axis=-1)
        weights = Dropout(self.dropout, name="attn_drop")(weights, train=train)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], e)
        out = Linear(e, name="out_proj")(out)
        return out


class AttentionTower(nn.Module):
    """The reference's optional AutoInt-style side tower
    (BaseModel.build_atten/atten_forward, layer.py:58-84):
    project fields to atten_embed_dim, stack self-attention layers,
    optional value-residual, ReLU, flatten, Linear(1, no bias)."""

    field_num: int
    embed_dim: int
    atten_embed_dim: int = 64
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True
    dropout: float = 0.2

    @nn.compact
    def __call__(self, embed_x_flat, train: bool = False):
        x = embed_x_flat.reshape(-1, self.field_num, self.embed_dim)
        atten_x = Linear(self.atten_embed_dim, name="atten_embedding")(x)
        cross = atten_x
        for i in range(self.att_layer_num):
            cross = MultiHeadSelfAttention(
                self.atten_embed_dim, self.att_head_num, self.dropout, name=f"attn_{i}"
            )(cross, train=train)
        if self.att_res:
            cross = cross + Linear(self.atten_embed_dim, name="v_res")(x)
        cross = nn.relu(cross).reshape(-1, self.field_num * self.atten_embed_dim)
        return Linear(1, use_bias=False, name="atten_linear")(cross)
