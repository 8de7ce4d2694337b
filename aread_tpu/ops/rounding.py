"""Stochastic rounding to bfloat16 with a counter-based hash PRNG.

Used by the bf16 table-storage optimizer variant (config.table_dtype =
'bfloat16'): the fused embedding table is stored bf16 (halving the
dominant sparse-Adam sweep's table read+write bytes, ops/sparse_adam.py)
while ALL optimizer compute stays f32 in-register. Deterministic
round-to-nearest would be catastrophic here — torch-Adam's per-step
weight deltas (~lr = 1e-3) sit BELOW the bf16 quantum of N(0,1)-scale
embedding weights (2^-8 * |w| ~ 4e-3), so RTN silently freezes most
updates; stochastic rounding keeps every update's EXPECTED value exact
(E[sr(x)] = x), the industry-standard recipe for low-precision
embedding tables. (Replaces the monolithic f32 torch table the
reference keeps, model/layer.py:150-157.)

Why a hash instead of jax PRNG / pltpu.prng_random_bits:
  * pltpu.prng_seed has no CPU-interpret lowering, so kernel tests could
    never run off-TPU;
  * a position-keyed hash makes the Pallas kernel and the XLA fallback
    produce BITWISE-IDENTICAL rounding decisions (same (seed, element
    index) -> same bits), which keeps the kernel-vs-XLA equality tests
    exact and makes the overflow-fallback path indistinguishable from
    the kernel path;
  * it is stateless: the seed is the Adam step counter, so checkpoint
    resume replays the identical stream with no extra state.

The mix is the murmur3 32-bit finalizer over (element_index, seed) —
pure uint32 vector ops (mul/xor/shift), lowerable by both Mosaic and
XLA on every backend, ~free against an HBM-bound sweep.

SR construction (the classic add-then-truncate): with x's f32 bits b and
16 uniform random low bits r, (b + r) & 0xFFFF0000 reinterpreted as f32
lies on the bf16 grid and equals x rounded up with probability
(b & 0xFFFF) / 2^16 — exactly unbiased. Works for both signs (IEEE
sign-magnitude: the add walks magnitude up, the mask truncates magnitude
down) and saturates to +-inf at the f32 boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_GOLD = np.uint32(0x9E3779B9)


def hash_bits(idx: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """murmur3 fmix32 of (element index, seed): uint32 in, uint32 out.
    ``idx`` any-shape uint32 (unique per element); ``seed`` scalar."""
    h = idx.astype(jnp.uint32) * _GOLD + seed.astype(jnp.uint32) * _M1
    h = h ^ (h >> 16)
    h = h * _M1
    h = h ^ (h >> 13)
    h = h * _M2
    h = h ^ (h >> 16)
    return h


def stochastic_round_bf16(x: jnp.ndarray, rbits: jnp.ndarray) -> jnp.ndarray:
    """f32 -> bf16 stochastic rounding driven by uint32 ``rbits``
    (only the low 16 bits are consumed). E[result] == x."""
    xb = jax.lax.bitcast_convert_type(x, jnp.uint32)
    ob = xb + (rbits & jnp.uint32(0xFFFF))
    ob = ob & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(ob, jnp.float32).astype(jnp.bfloat16)


def sround(x: jnp.ndarray, dtype, idx: jnp.ndarray,
           seed: jnp.ndarray) -> jnp.ndarray:
    """Round f32 ``x`` to ``dtype``: identity/astype for f32, stochastic
    (position-keyed by uint32 ``idx``, stream-keyed by scalar ``seed``)
    for bf16."""
    if jnp.dtype(dtype) != jnp.dtype(jnp.bfloat16):
        return x.astype(dtype)
    return stochastic_round_bf16(x, hash_bits(idx, seed))


def flat_index_grid(n_rows: int, d: int) -> jnp.ndarray:
    """[n_rows, d] uint32 element indices matching the TPU lane-packed
    flat [n_rows*d/128, 128] storage order (FeatureSpec.with_flat_table):
    logical (r, c) lives at flat element (r // rpf)*128 + (r % rpf)*d + c.
    Falls back to row-major when d does not divide 128, where the flat
    layout (and the Pallas kernel) is unused anyway. Keeping the index
    map storage-layout-equal makes the XLA fallback's rounding decisions
    bitwise identical to the kernel's."""
    r = jnp.arange(n_rows, dtype=jnp.uint32)[:, None]
    c = jnp.arange(d, dtype=jnp.uint32)[None, :]
    if 128 % d == 0:
        rpf = np.uint32(128 // d)
        return (r // rpf) * np.uint32(128) + (r % rpf) * np.uint32(d) + c
    return r * np.uint32(d) + c
