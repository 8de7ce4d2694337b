"""Dense stacks: Linear, BatchNorm (masked, torch-semantics), MLP/DNN, and
stacked-parameter variants that turn the reference's Python loops over
ModuleLists into single batched einsums (MXU-friendly).

Semantics reproduced from the reference:
  * MultiLayerPerceptron = [Linear -> BN -> ReLU -> Dropout]* (+ Linear(1))
    with BN skipped when the batch has a single row (layer.py:203-229);
  * DNN = the DeepCTR variant without the final projection, BN before
    activation (layer.py:261-322);
  * GateNN = Linear -> ReLU -> Dropout -> Linear -> 2*sigmoid
    (pepnet.py:119-136).

TPU-first additions:
  * every module takes an optional per-row ``mask`` so padded rows (XLA
    needs static batch shapes; ragged final domain batches are padded)
    never contaminate BatchNorm statistics;
  * ``StackedLinear``/``StackedMLP`` hold parameters with a leading tower
    axis [T, din, dout]; a level of T towers is one einsum instead of T
    small matmuls.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aread_tpu.ops.initializers import linear_kernel_init, linear_bias_init_for


class Linear(nn.Module):
    """Dense layer with torch-default init (see ops.initializers)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        din = x.shape[-1]
        kernel = self.param("kernel", linear_kernel_init, (din, self.features))
        y = x @ kernel
        if self.use_bias:
            y = y + self.param("bias", linear_bias_init_for(din), (self.features,))
        return y


def _masked_moments(x, mask, reduce_axes):
    """Mean/biased-var over ``reduce_axes`` counting only mask==1 rows."""
    if mask is None:
        mean = jnp.mean(x, axis=reduce_axes)
        var = jnp.mean(jnp.square(x - jnp.expand_dims(mean, reduce_axes)), axis=reduce_axes)
        count = jnp.asarray(float(np.prod([x.shape[a] for a in reduce_axes])), x.dtype)
        return mean, var, count
    m = mask.astype(x.dtype)
    count = jnp.maximum(jnp.sum(m), 1.0)  # scalar: number of valid rows
    while m.ndim < x.ndim:
        m = m[..., None]
    mean = jnp.sum(x * m, axis=reduce_axes) / count
    var = jnp.sum(jnp.square(x - jnp.expand_dims(mean, reduce_axes)) * m, axis=reduce_axes) / count
    return mean, var, count


class BatchNorm(nn.Module):
    """BatchNorm1d with torch semantics and optional row masking.

    * normalizes with biased batch variance; running stats updated with the
      unbiased variance and momentum 0.1 (torch defaults);
    * if the (valid) batch has <= 1 row the input passes through unchanged
      and running stats are untouched — the reference's batch==1 skip
      (layer.py:226-227, star.py:120-121) generalized to masked batches;
    * supports [B, D] and [B, T, D] inputs; stats are kept per trailing
      channel(s), i.e. shape [D] or [T, D] (per-tower stats for stacks);
    * ``scale_mod``/``bias_mod`` implement STAR's partitioned normalization
      gamma*shared_gamma / beta+shared_beta (reference star.py:155-167).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    tied_affine: bool = False

    @nn.compact
    def __call__(self, x, train: bool, mask=None, scale_mod=None, bias_mod=None,
                 update_gate=None):
        """``update_gate``: optional boolean/float array broadcastable to the
        stats shape; where 0, running statistics are NOT updated this step
        (used by masked-HEI so pruned towers' BN stats stay frozen, matching
        the reference which never executes inactive towers,
        aread.py:267-321).

        ``tied_affine``: on [B, T, D] inputs keep ONE [D] scale/bias shared
        across the T towers (batch statistics stay per-tower). Matches the
        reference PPNet's tower-tied BatchNorm module
        (pepnet.py:163 ``[one_tower_layer] * n_tower`` shares gamma/beta —
        per-tower copies would both triple the reg-loss value and give the
        affine params per-tower instead of summed gradients)."""
        stat_shape = x.shape[1:]
        aff_shape = (x.shape[-1:] if self.tied_affine and x.ndim == 3
                     else stat_shape)
        scale = self.param("scale", nn.initializers.ones, aff_shape)
        bias = self.param("bias", nn.initializers.zeros, aff_shape)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(stat_shape))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(stat_shape))

        eff_scale = scale if scale_mod is None else scale * scale_mod
        eff_bias = bias if bias_mod is None else bias + bias_mod

        if train:
            mean, var, count = _masked_moments(x, mask, (0,))
            normed = (x - mean[None]) * jax.lax.rsqrt(var[None] + self.eps)
            out = normed * eff_scale + eff_bias
            big_enough = count > 1.0
            out = jnp.where(big_enough, out, x)
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                new_mean = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                new_var = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                do_update = big_enough
                if update_gate is not None:
                    gate = jnp.broadcast_to(update_gate.astype(bool), ra_mean.value.shape)
                    do_update = jnp.logical_and(big_enough, gate)
                ra_mean.value = jnp.where(do_update, new_mean, ra_mean.value)
                ra_var.value = jnp.where(do_update, new_var, ra_var.value)
            return out
        normed = (x - ra_mean.value[None]) * jax.lax.rsqrt(ra_var.value[None] + self.eps)
        return normed * eff_scale + eff_bias


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.rate <= 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        keep_mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(keep_mask, x / keep, 0.0)


class MLP(nn.Module):
    """The reference MultiLayerPerceptron (layer.py:203-229):
    [Linear -> BN -> ReLU -> Dropout] per hidden dim, optional Linear(1)."""

    layer_dims: Tuple[int, ...]
    dropout: float = 0.2
    output_layer: bool = True
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        for i, dim in enumerate(self.layer_dims):
            x = Linear(dim, name=f"linear_{i}")(x)
            if self.use_bn:
                x = BatchNorm(name=f"bn_{i}")(x, train=train, mask=mask)
            x = nn.relu(x)
            x = Dropout(self.dropout, name=f"drop_{i}")(x, train=train)
        if self.output_layer:
            x = Linear(1, name="out")(x)
        return x


class DNN(nn.Module):
    """DeepCTR-style MLP (reference layer.py:261-322): Linear -> BN ->
    activation -> Dropout, no output projection. Kept distinct from MLP so
    STAR can do its element-wise weight-product trick layer by layer."""

    hidden_units: Tuple[int, ...]
    dropout: float = 0.0
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        for i, dim in enumerate(self.hidden_units):
            x = Linear(dim, name=f"linear_{i}")(x)
            if self.use_bn:
                x = BatchNorm(name=f"bn_{i}")(x, train=train, mask=mask)
            x = nn.relu(x)
            x = Dropout(self.dropout, name=f"drop_{i}")(x, train=train)
        return x


class GateNN(nn.Module):
    """PEPNet gate (reference pepnet.py:119-136): 2*sigmoid(MLP(x))."""

    hidden_dim: int
    output_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Linear(self.hidden_dim, name="fc1")(x)
        x = nn.relu(x)
        x = Dropout(self.dropout, name="drop")(x, train=train)
        x = Linear(self.output_dim, name="fc2")(x)
        return 2.0 * nn.sigmoid(x)


class StackedLinear(nn.Module):
    """T parallel Linear layers as one einsum.

    Input  [B, T, din] (or [B, din] broadcast to all T) -> [B, T, dout].
    Parameters: kernel [T, din, dout], bias [T, dout], each tower drawn from
    the same torch-default distribution as an individual nn.Linear.
    """

    n_stack: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        broadcast = x.ndim == 2
        din = x.shape[-1]
        kernel = self.param("kernel", linear_kernel_init, (self.n_stack, din, self.features))
        if broadcast:
            y = jnp.einsum("bd,tdf->btf", x, kernel)
        else:
            y = jnp.einsum("btd,tdf->btf", x, kernel)
        if self.use_bias:
            bias = self.param("bias", linear_bias_init_for(din), (self.n_stack, self.features))
            y = y + bias[None]
        return y


class StackedMLP(nn.Module):
    """T parallel MLP towers (reference's ModuleList-of-MultiLayerPerceptron
    pattern, e.g. mmoe.py:34, aread.py:108-110) as stacked einsums with
    per-tower BatchNorm statistics."""

    n_stack: int
    layer_dims: Tuple[int, ...]
    dropout: float = 0.2
    output_layer: bool = False
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None, tower_gate=None):
        # x: [B, din] (broadcast) or [B, T, din]; tower_gate: optional [T]
        # array gating BN running-stat updates per tower (masked HEI).
        ug = tower_gate[:, None] if tower_gate is not None else None
        for i, dim in enumerate(self.layer_dims):
            x = StackedLinear(self.n_stack, dim, name=f"linear_{i}")(x)
            if self.use_bn:
                x = BatchNorm(name=f"bn_{i}")(x, train=train, mask=mask, update_gate=ug)
            x = nn.relu(x)
            x = Dropout(self.dropout, name=f"drop_{i}")(x, train=train)
        if self.output_layer:
            x = StackedLinear(self.n_stack, 1, name="out")(x)
        return x
