"""Factorization-machine-family interaction ops.

Reproduces the reference math:
  * FactorizationMachine: 0.5 * (square-of-sum - sum-of-square)
    (layer.py:186-200);
  * InnerProductNetwork / OuterProductNetwork / AttentionalFactorization-
    Machine / CompressedInteractionNetwork / AnovaKernel — present in the
    reference layer library (layer.py:468-627) though unreachable from its
    trainer; kept here for API completeness.

All pairwise (i<j) enumerations use precomputed static index arrays so the
compiled program is a fixed gather + elementwise reduce.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from aread_tpu.ops.initializers import linear_kernel_init
from aread_tpu.ops.mlp import Dropout, Linear


class FactorizationMachine(nn.Module):
    reduce_sum: bool = True

    @nn.compact
    def __call__(self, x):
        # x: [B, F, E]
        square_of_sum = jnp.square(jnp.sum(x, axis=1))
        sum_of_square = jnp.sum(jnp.square(x), axis=1)
        ix = square_of_sum - sum_of_square
        if self.reduce_sum:
            ix = jnp.sum(ix, axis=1, keepdims=True)
        return 0.5 * ix


def _pair_indices(num_fields: int) -> Tuple[np.ndarray, np.ndarray]:
    row, col = np.triu_indices(num_fields, k=1)
    return row, col


class InnerProductNetwork(nn.Module):
    @nn.compact
    def __call__(self, x):
        row, col = _pair_indices(x.shape[1])
        return jnp.sum(x[:, row] * x[:, col], axis=2)


class OuterProductNetwork(nn.Module):
    num_fields: int
    embed_dim: int
    kernel_type: str = "mat"

    @nn.compact
    def __call__(self, x):
        row, col = _pair_indices(self.num_fields)
        num_ix = len(row)
        if self.kernel_type == "mat":
            kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                                (self.embed_dim, num_ix, self.embed_dim))
        elif self.kernel_type == "vec":
            kernel = self.param("kernel", nn.initializers.xavier_uniform(), (num_ix, self.embed_dim))
        elif self.kernel_type == "num":
            kernel = self.param("kernel", nn.initializers.xavier_uniform(), (num_ix, 1))
        else:
            raise ValueError(f"unknown kernel type: {self.kernel_type}")
        p, q = x[:, row], x[:, col]  # [B, num_ix, E]
        if self.kernel_type == "mat":
            kp = jnp.einsum("bne,enf->bnf", p, jnp.transpose(kernel, (1, 0, 2)))
            return jnp.sum(kp * q, axis=-1)
        return jnp.sum(p * q * kernel[None], axis=-1)


class AttentionalFactorizationMachine(nn.Module):
    attn_size: int
    dropouts: Tuple[float, float] = (0.2, 0.2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        row, col = _pair_indices(x.shape[1])
        inner = x[:, row] * x[:, col]  # [B, num_ix, E]
        attn = nn.relu(Linear(self.attn_size, name="attention")(inner))
        scores = nn.softmax(Linear(1, name="projection")(attn), axis=1)
        scores = Dropout(self.dropouts[0], name="drop_scores")(scores, train=train)
        out = jnp.sum(scores * inner, axis=1)
        out = Dropout(self.dropouts[1], name="drop_out")(out, train=train)
        return Linear(1, name="fc")(out)


class CompressedInteractionNetwork(nn.Module):
    """xDeepFM CIN (reference layer.py:568-604)."""

    input_dim: int  # number of fields
    cross_layer_sizes: Tuple[int, ...]
    split_half: bool = True

    @nn.compact
    def __call__(self, x):
        # x: [B, F, E]
        xs = []
        x0, h = x, x
        prev_dim = self.input_dim
        for i, size in enumerate(self.cross_layer_sizes):
            z = jnp.einsum("bfe,bge->bfge", x0, h).reshape(x.shape[0], -1, x.shape[2])
            w = self.param(f"conv_{i}", linear_kernel_init, (self.input_dim * prev_dim, size))
            b = self.param(f"conv_b_{i}", nn.initializers.zeros, (size,))
            out = nn.relu(jnp.einsum("bne,nc->bce", z, w) + b[None, :, None])
            if self.split_half and i != len(self.cross_layer_sizes) - 1:
                out, h = jnp.split(out, 2, axis=1)
            else:
                h = out
            prev_dim = h.shape[1]
            xs.append(out)
        return jnp.sum(jnp.concatenate(xs, axis=1), axis=2)


class AnovaKernel(nn.Module):
    order: int
    reduce_sum: bool = True

    @nn.compact
    def __call__(self, x):
        batch, num_fields, embed_dim = x.shape
        a_prev = jnp.ones((batch, num_fields + 1, embed_dim), x.dtype)
        for t in range(self.order):
            a = jnp.zeros((batch, num_fields + 1, embed_dim), x.dtype)
            a = a.at[:, t + 1:, :].add(x[:, t:, :] * a_prev[:, t:-1, :])
            a = jnp.cumsum(a, axis=1)
            a_prev = a
        if self.reduce_sum:
            return jnp.sum(a_prev[:, -1, :], axis=-1, keepdims=True)
        return a_prev[:, -1, :]
