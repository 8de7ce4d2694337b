"""Pallas TPU kernel: dense-semantics Adam from a SPARSE data gradient.

Motivation (scan-amortized, host-fetch-synchronized timings on this
image's v5e — table 1.52M x 32, bs=1024, K = 17408 gathered ids; naive
per-dispatch timing loops are dishonest here, see BASELINE.md):
  * XLA dense path: zeros+scatter-add to build the [n_rows, E] cotangent
    plus a 7-operand fused update = ~5.5 ms/step;
  * XLA two-phase sparse (`.at[ids].set` on table-sized operands): each
    scatter costs a full table copy (TPU scatter is never in-place, even
    with sorted/unique hints) = ~11 ms/step;
  * an earlier variant of THIS kernel that pre-packed a per-block
    [grid*W, 128] gradient slab on the XLA side spent ~2 ms in the pack
    gathers alone — so this kernel is self-contained instead: the only
    XLA-side prep is the (already required) dedup plus two tiny ops.

Layout: the kernel runs on the flat [n_rows*D/128, 128] view (requires
n_rows*D % 128 == 0 — the loader pads the last field's vocab,
models/base.py pad_vocab), where every DMA'd byte is real ((R, 32) blocks
would be lane-padded 4x). Per flat block of BLOCK_F rows:

  * `bounds` (scalar-prefetch, SMEM) gives the block's contiguous slice
    [lo, hi) of the SORTED unique ids — sortedness turns per-block
    membership into two searchsorted bounds;
  * `gfull` [K+W, 128] — each unique id's D gradient values pre-spread to
    its lane group ((id % rows_per_flat) * D) — stays VMEM-resident across
    the whole grid (constant index_map => fetched once, ~9 MB);
  * the block's W candidate rows become a one-hot [BLOCK_F, W] matrix from
    `fr_pad` (the only XLA-side gather, int32, ~0.4 MB) and the block's
    dense data gradient is ONE MXU matmul
        gfix = onehot @ gfull[lo:lo+W]     [BLOCK_F, W] @ [W, 128]
  * followed by a fully-vectorized Adam update with g = gfix + decay * w.

Six full-rate HBM passes, no scatter, no scalar loops. Duplicate flat rows
(adjacent table rows sharing one flat row) sum correctly through the
matmul because their lane ranges are disjoint.

W bounds the number of distinct FLAT rows one block can receive from a
batch. Large-vocab fields contribute ~Poisson(K/G) per block (mean ~175,
measured max ~243 at bs=1024 / BLOCK_F=4096), but the SMALL-vocab fields'
rows are contiguous in the fused table and all land in one block together
(~83 always-hit rows for the Amazon layout) on top of that block's share
of the adjacent large field — worst observed ~326 at BLOCK_F=4096, hence
W=384. (BLOCK_F, W) swept on the v5e: (2048,256)=2.75, (4096,384)=2.57,
(8192,640)=2.56 ms incl. metadata — larger blocks pipeline DMAs better,
but 8192 doubles VMEM (~100 MB) for ~nothing, and 16384 exceeds VMEM.
Overflow is detected on-device and the caller falls back to the exact XLA
path via lax.cond (ops/sparse_adam.py).

Semantics are torch.optim.Adam exactly (same expression as
ops/pallas/fused_adam.py; cross-checked bit-for-bit against the dense
reference in tests/test_sparse_adam.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aread_tpu.ops.pallas.fused_adam import default_interpret

LANES = 128
BLOCK_F = 4096  # flat rows per grid step (= 16384 table rows at D=32)
PAD_W = 384     # max distinct touched flat rows per block (see module doc)
FR_WIN = 8      # grid steps per fr_pad DMA window


def supports(n_rows: int, d: int) -> bool:
    return LANES % d == 0 and (n_rows * d) % LANES == 0


def _kernel(bounds_ref, scal_ref, seed_ref, w_ref, m_ref, v_ref, fr_ref,
            gfull_ref, ow_ref, om_ref, ov_ref, ol2_ref=None, *, n_flat=None,
            native_prng=False):
    i = pl.program_id(0)
    lr, b1, b2, eps, decay, b1c, b2c = (scal_ref[0], scal_ref[1], scal_ref[2],
                                        scal_ref[3], scal_ref[4], scal_ref[5],
                                        scal_ref[6])
    # one-hot flat-row matrix: onehot[r, k] = (fr[k] == base + r); padded /
    # out-of-block slots carry -1 and never match. fr_ref is an (FR_WIN, W)
    # window — FR_WIN grid steps per DMA.
    local = fr_ref[pl.ds(i % FR_WIN, 1), :] - i * BLOCK_F  # [1, W] int32
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_F, PAD_W), 0)
    onehot = (rows == local).astype(jnp.bfloat16)
    # the block's gradient slab: rows lo..lo+W of the resident spread table
    # (aligned with fr columns: fr_pad[i, k] describes sorted entry
    # bounds[i] + k; gfull is zero-padded by W rows so lo+W <= K+W always)
    gwin = gfull_ref[pl.ds(bounds_ref[i], PAD_W), :]  # [W, 128] f32
    # Densify with THREE bf16 MXU matmuls instead of one fp32 matmul
    # (Mosaic fp32 dots cost ~25x a bf16 dot on v5e — measured 1.7 ms vs
    # ~0.02 ms at W=512). hi/mid/lo carry 8 mantissa bits each, and
    # gwin == hi + mid + lo EXACTLY (24-bit fp32 mantissa in 3 bf16
    # chunks; each residual is exactly representable). Because uids are
    # unique, every output (row, lane) selects AT MOST ONE gwin entry —
    # no accumulation ever mixes distinct values — so
    # dot(hi) + dot(mid) + dot(lo) reassembles each selected fp32 value
    # bit-exactly, keeping torch-Adam parity.
    hi = gwin.astype(jnp.bfloat16)
    r1 = gwin - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    f32 = jnp.float32
    gfix = (jnp.dot(onehot, hi, preferred_element_type=f32)
            + jnp.dot(onehot, mid, preferred_element_type=f32)
            + jnp.dot(onehot, lo, preferred_element_type=f32))

    # omb1/omb2 arrive precomputed in double then rounded (scal_ref[7:9]):
    # recomputing 1.0 - b1 from the f32 b1 lands 2 ULP away from the
    # trace-time constant float(1 - 0.9) the jnp reference folds — a
    # visible parity break under bitwise tests
    omb1, omb2 = scal_ref[7], scal_ref[8]
    # table may be stored bf16 (config.table_dtype): compute stays f32
    # in-register; a no-op astype for f32 storage keeps that path bit-exact
    w = w_ref[:].astype(jnp.float32)
    if ol2_ref is not None:
        # free ||w||^2 of the PRE-update table (the value the loss reports,
        # trainer.table_reg_value): w is already streaming through VMEM, so
        # the sum costs zero extra HBM traffic. The last block's tail rows
        # (beyond n_flat) are buffer padding — mask them out.
        row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_F, LANES), 0)
        live = (i * BLOCK_F + row) < n_flat
        blk = jnp.sum(jnp.where(live, w * w, 0.0))

        @pl.when(i == 0)
        def _():
            ol2_ref[0, 0] = 0.0

        ol2_ref[0, 0] += blk
    g = gfix + decay * w
    # moments may be stored bf16 (config.table_moments_dtype); compute in
    # f32 either way — for f32 storage the astypes are no-ops and the
    # update stays bit-exact torch Adam
    m2 = b1 * m_ref[:].astype(jnp.float32) + omb1 * g
    v2 = b2 * v_ref[:].astype(jnp.float32) + omb2 * g * g
    w2 = w - lr * (m2 / b1c) / (jnp.sqrt(v2 / b2c) + eps)
    if ow_ref.dtype == jnp.bfloat16:
        # bf16 table storage: STOCHASTIC rounding on the write — the
        # per-step Adam delta (~lr) sits below the bf16 quantum of
        # N(0,1)-scale weights, so round-to-nearest would freeze most
        # updates; SR keeps E[w] exact.
        if native_prng:
            # real-TPU path: the hardware PRNG. The vectorized murmur
            # hash below costs ~0.4 ms/step over the full 48.6M-element
            # table at Amazon scale (VPU-bound — measured vs the bf16
            # bare-copy floor, benchmarks/prof_sparse_adam.py);
            # prng_random_bits + the native stochastic_round op are ~free
            # against the HBM sweep. Stream is deterministic in
            # (seed, block): checkpoint resume replays identically.
            pltpu.prng_seed(seed_ref[0] * 1000003 + i)
            rbits = pltpu.bitcast(
                pltpu.prng_random_bits((BLOCK_F, LANES)), jnp.uint32)
            ow_ref[:] = pltpu.stochastic_round(
                w2, rbits, target_dtype=jnp.bfloat16)
        else:
            # interpret-mode path (pltpu.prng_seed has no CPU lowering):
            # the position+step-keyed hash, bitwise-reproducible by the
            # XLA fallback (ops/rounding.py) — what the cross-path
            # equality tests pin.
            from aread_tpu.ops.rounding import (hash_bits,
                                                stochastic_round_bf16)
            rowi = jax.lax.broadcasted_iota(jnp.uint32, (BLOCK_F, LANES), 0)
            lanei = jax.lax.broadcasted_iota(jnp.uint32, (BLOCK_F, LANES), 1)
            gidx = ((i.astype(jnp.uint32) * jnp.uint32(BLOCK_F) + rowi)
                    * jnp.uint32(LANES) + lanei)
            ow_ref[:] = stochastic_round_bf16(
                w2, hash_bits(gidx, seed_ref[0]))
    else:
        ow_ref[:] = w2
    om_ref[:] = m2.astype(om_ref.dtype)
    ov_ref[:] = v2.astype(ov_ref.dtype)


def pack_meta(uids: jnp.ndarray, gsum: jnp.ndarray, n_rows: int, d: int):
    """Kernel-side metadata from sorted-unique (uids, gsum):
    (bounds [grid+1] i32, fr_pad [grid8, W] i32, gfull [K+W, 128], overflow).

    All gather-form (uids arrive sorted from ops/sparse_adam.dedup_rows):
    TPU scatters serialize row-at-a-time and cost milliseconds at these
    shapes; everything here is searchsorted + one small int gather + one
    elementwise spread."""
    K = uids.shape[0]
    rpf = LANES // d
    n_flat = (n_rows * d) // LANES
    grid = -(-n_flat // BLOCK_F)

    fr = jnp.where(uids < n_rows, uids // rpf, n_flat).astype(jnp.int32)

    # block boundaries in the sorted run; clamp to n_live so the sentinel
    # tail (fr == n_flat) never lands in the last block
    starts = jnp.arange(grid + 1, dtype=jnp.int32) * BLOCK_F
    bounds = jnp.searchsorted(fr, starts, side="left").astype(jnp.int32)
    n_live = jnp.searchsorted(fr, jnp.int32(n_flat), side="left").astype(
        jnp.int32)
    bounds = jnp.minimum(bounds, n_live)
    overflow = jnp.any((bounds[1:] - bounds[:-1]) > PAD_W)

    # fr window per block: slot (b, s) pulls sorted entry bounds[b] + s
    src = bounds[:-1, None] + jnp.arange(PAD_W, dtype=jnp.int32)[None, :]
    valid = src < bounds[1:, None]  # [grid, W]
    srcc = jnp.minimum(src, K - 1).reshape(-1)
    fr_pad = jnp.where(valid, fr[srcc].reshape(grid, PAD_W), -1)
    grid8 = -(-grid // FR_WIN) * FR_WIN
    if grid8 != grid:
        fr_pad = jnp.concatenate(
            [fr_pad, jnp.full((grid8 - grid, PAD_W), -1, jnp.int32)])

    # place each unique id's D gradient values at lane group grp*D, plus W
    # zero rows so the kernel's [lo, lo+W) window never leaves the array.
    # Built pad-free: tile the [K, D] rows across the 128 lanes and mask
    # the id's lane group — the earlier one-hot outer product materialized
    # a [K, rpf, D] intermediate that TPU lane-pads 4x and then paid a
    # real relayout on the reshape (~0.4 ms of the pack at Amazon shapes).
    # Identical values (selection, no arithmetic).
    grp = jnp.where(uids < n_rows, uids % rpf, rpf).astype(jnp.int32)
    lanes = jnp.arange(LANES, dtype=jnp.int32) // d  # lane -> group
    sel = grp[:, None] == lanes[None, :]             # [K, 128] bool
    gfull = jnp.where(sel, jnp.tile(gsum, (1, rpf)), 0).astype(gsum.dtype)
    gfull = jnp.concatenate(
        [gfull, jnp.zeros((PAD_W, LANES), gsum.dtype)])
    return bounds, fr_pad, gfull, overflow


def sparse_adam_kernel_update(w: jnp.ndarray, m: jnp.ndarray, v: jnp.ndarray,
                              uids: jnp.ndarray, gsum: jnp.ndarray,
                              t: jnp.ndarray, lr: float, b1: float = 0.9,
                              b2: float = 0.99, eps: float = 1e-8,
                              weight_decay: float = 1e-8, l2: float = 0.0,
                              table_shape: Tuple[int, int] = None,
                              interpret: bool = None, want_l2: bool = False,
                              sr_seed: jnp.ndarray = None
                              ) -> Tuple[jnp.ndarray, ...]:
    """One dense-semantics Adam step; data gradient as sorted-unique
    (uids [K] with sentinel n_rows padding, gsum [K, D]). w/m/v may be
    [n_rows, D] or already the flat [n_rows*D/128, 128] view (pass
    ``table_shape`` then — strongly preferred: reshaping [N, D<128] on TPU
    is a physical relayout costing several ms at Amazon scale). Caller
    handles the PAD_W overflow fallback (ops/sparse_adam.sparse_table_adam).
    ``want_l2``: also return sum(w**2) of the pre-update table (free — w
    already streams through the kernel), as a 4th output.
    """
    n_rows, d = table_shape if table_shape is not None else w.shape
    bounds, fr_pad, gfull, _ = pack_meta(uids, gsum, n_rows, d)
    return sparse_adam_kernel_premeta(
        w, m, v, bounds, fr_pad, gfull, t, lr=lr, b1=b1, b2=b2, eps=eps,
        weight_decay=weight_decay, l2=l2, table_shape=(n_rows, d),
        interpret=interpret, want_l2=want_l2, sr_seed=sr_seed)


def sparse_adam_kernel_premeta(w: jnp.ndarray, m: jnp.ndarray,
                               v: jnp.ndarray, bounds: jnp.ndarray,
                               fr_pad: jnp.ndarray, gfull: jnp.ndarray,
                               t: jnp.ndarray, lr: float, b1: float = 0.9,
                               b2: float = 0.99, eps: float = 1e-8,
                               weight_decay: float = 1e-8, l2: float = 0.0,
                               table_shape: Tuple[int, int] = None,
                               interpret: bool = None, want_l2: bool = False,
                               sr_seed: jnp.ndarray = None
                               ) -> Tuple[jnp.ndarray, ...]:
    """Kernel entry with pack_meta's outputs precomputed — lets the caller
    compute them once and reuse the overflow flag for the fallback cond
    (ops/sparse_adam.sparse_adam_dispatch). ``want_l2``: 4th output
    sum(w_pre**2), accumulated in-kernel at zero bandwidth cost.
    ``sr_seed``: int32 scalar keying the stochastic-rounding stream when
    the table is stored bf16 (defaults to the step counter ``t`` — a
    deterministic, checkpoint-replayable stream)."""
    if interpret is None:
        interpret = default_interpret()
    n_rows, d = table_shape if table_shape is not None else w.shape
    assert supports(n_rows, d), (n_rows, d)
    K = gfull.shape[0] - PAD_W
    n_flat = (n_rows * d) // LANES
    grid = -(-n_flat // BLOCK_F)

    if sr_seed is None:
        sr_seed = t
    seed_arr = jnp.asarray(sr_seed, jnp.int32).reshape((1,))
    tf = t.astype(jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32), jnp.asarray(b1, jnp.float32),
        jnp.asarray(b2, jnp.float32), jnp.asarray(eps, jnp.float32),
        jnp.asarray(weight_decay + 2.0 * l2, jnp.float32),
        1.0 - jnp.asarray(b1, jnp.float32) ** tf,
        1.0 - jnp.asarray(b2, jnp.float32) ** tf,
        # (1 - b) in DOUBLE then rounded — the constant the jnp reference
        # folds at trace time; see the ULP note in _kernel
        jnp.asarray(1.0 - b1, jnp.float32),
        jnp.asarray(1.0 - b2, jnp.float32),
    ])

    block = pl.BlockSpec((BLOCK_F, LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    fr_spec = pl.BlockSpec((FR_WIN, PAD_W), lambda i, *_: (i // FR_WIN, 0),
                           memory_space=pltpu.VMEM)
    # whole spread-gradient table resident in VMEM for the full grid
    # (constant index_map => one DMA)
    gfull_spec = pl.BlockSpec((K + PAD_W, LANES), lambda i, *_: (0, 0),
                              memory_space=pltpu.VMEM)
    in_shape = w.shape
    flat = lambda x: x if x.shape == (n_flat, LANES) else x.reshape(n_flat, LANES)
    out_shape = (jax.ShapeDtypeStruct((n_flat, LANES), w.dtype),
                 jax.ShapeDtypeStruct((n_flat, LANES), m.dtype),
                 jax.ShapeDtypeStruct((n_flat, LANES), v.dtype))
    out_specs = (block, block, block)
    from functools import partial as _partial
    # the hardware PRNG SR path only lowers on real TPU (interpret mode
    # falls back to the portable hash — see _kernel)
    kernel = _partial(_kernel, native_prng=not interpret)
    if want_l2:
        out_shape = out_shape + (jax.ShapeDtypeStruct((1, 1), jnp.float32),)
        out_specs = out_specs + (pl.BlockSpec(
            (1, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),)
        kernel = _partial(kernel, n_flat=n_flat)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # bounds, scalars, sr seed
        grid=(grid,),
        in_specs=[block, block, block, fr_spec, gfull_spec],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={3: 0, 4: 1, 5: 2},  # w,m,v in place
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(bounds, scalars, seed_arr, flat(w), flat(m), flat(v), fr_pad, gfull)
    unflat = lambda x: x.reshape(in_shape)
    ow, om, ov = (unflat(o) for o in outs[:3])
    if want_l2:
        return ow, om, ov, outs[3][0, 0]
    return ow, om, ov
