"""Parameter initializers matching the distributions the reference relies on.

The reference uses PyTorch defaults: ``nn.Linear`` draws weight and bias
from U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform with a=sqrt(5)
collapses to that bound), and ``nn.Embedding`` draws N(0, 1)
(reference model/layer.py:150 — the xavier line is commented out).
Matching the init distributions keeps early-training loss curves, and
therefore the HEMP gate statistics, comparable to the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for a (fan_in, fan_out) kernel.

    Also covers stacked kernels of shape (..., fan_in, fan_out): the bound
    is computed from the second-to-last axis, matching per-tower torch init.
    """
    fan_in = shape[-2]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_bias_init_for(fan_in: int):
    """Torch Linear bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def embedding_init(key, shape, dtype=jnp.float32):
    """N(0, 1), the torch nn.Embedding default (reference layer.py:150)."""
    return jax.random.normal(key, shape, dtype)


def xavier_normal_init(key, shape, dtype=jnp.float32):
    """Xavier/Glorot normal over the last two axes (CrossNetMix U/V/C,
    reference layer.py:381-388 uses nn.init.xavier_normal_)."""
    fan_in, fan_out = shape[-2], shape[-1]
    std = np.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init
