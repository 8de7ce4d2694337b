"""Cross-interaction networks (DCN family).

Math reproduced from the reference:
  * CrossNetwork (DCN v1): x_{l+1} = x0 * (w_l . x_l) + b_l + x_l
    (layer.py:325-351);
  * CrossNetV2: x_{l+1} = x0 * (W_l x_l) + b_l + x_l (layer.py:354-365);
  * CrossNetMix: mixture of low-rank experts with tanh bottlenecks and a
    softmax over per-expert scalar gates (layer.py:368-429).

TPU-first: CrossNetMix runs all experts as stacked einsums over the expert
axis — one [E, d, r] contraction per layer instead of a Python loop.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from aread_tpu.ops.initializers import linear_kernel_init, xavier_normal_init


class CrossNetwork(nn.Module):
    """DCN v1 cross layers (reference layer.py:325-351)."""

    num_layers: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x0 = x
        for i in range(self.num_layers):
            w = self.param(f"w_{i}", linear_kernel_init, (d, 1))
            b = self.param(f"b_{i}", nn.initializers.zeros, (d,))
            xw = x @ w  # [B, 1]
            x = x0 * xw + b + x
        return x


class CrossNetV2(nn.Module):
    """DCN v2 full-matrix cross (reference layer.py:354-365)."""

    num_layers: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x0 = x
        for i in range(self.num_layers):
            w = self.param(f"w_{i}", linear_kernel_init, (d, d))
            b = self.param(f"b_{i}", nn.initializers.zeros, (d,))
            x = x0 * (x @ w) + b + x
        return x


class CrossNetMix(nn.Module):
    """DCN v2 mixture-of-low-rank-experts cross (reference layer.py:368-429).

    Per layer l and expert e:
        v = tanh(V_le^T x);  v = tanh(C_le v);  u = U_le v + b_l
        out_e = x0 * u;  gate_e = w_e . x
        x <- x + sum_e softmax(gate)_e * out_e
    All experts computed via one stacked einsum per projection.
    """

    num_layers: int = 2
    low_rank: int = 32
    num_experts: int = 4

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x0 = x
        gate_w = self.param("gate", linear_kernel_init, (self.num_experts, d, 1))
        for i in range(self.num_layers):
            u = self.param(f"u_{i}", xavier_normal_init, (self.num_experts, d, self.low_rank))
            v = self.param(f"v_{i}", xavier_normal_init, (self.num_experts, d, self.low_rank))
            c = self.param(f"c_{i}", xavier_normal_init, (self.num_experts, self.low_rank, self.low_rank))
            bias = self.param(f"bias_{i}", nn.initializers.zeros, (d,))

            gates = jnp.einsum("bd,edo->beo", x, gate_w)[..., 0]  # [B, E]
            gates = nn.softmax(gates, axis=1)

            vx = jnp.tanh(jnp.einsum("bd,edr->ber", x, v))
            vx = jnp.tanh(jnp.einsum("ber,ers->bes", vx, c))
            uvx = jnp.einsum("bes,eds->bed", vx, u) + bias[None, None, :]
            expert_out = x0[:, None, :] * uvx  # [B, E, d]
            x = x + jnp.einsum("be,bed->bd", gates, expert_out)
        return x
