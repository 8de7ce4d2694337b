"""Pallas TPU kernel: fused Adam update for large embedding tables.

The dominant per-step cost of this workload is the dense optimizer pass
over the fused embedding table (~195MB params + moments; the reference's
L2 term layer.py:96-112 and torch-Adam weight decay make every row's
gradient nonzero, so the dense update is semantically required). XLA's
fused elementwise chain reaches ~390GB/s on v5e; this kernel does ONE
tiled pass — read w,m,v,g; write w,m,v in place (input_output_aliases) —
with explicit (block, 128)-lane tiling.

Semantics (torch.optim.Adam exactly, matching train/trainer.make_optimizer):
    g      <- g + wd*w + 2*l2*w      (weight decay + L2-reg gradient: the
                                      reg term's gradient is folded in here
                                      so the loss no longer needs to carry
                                      a dense 2*l2*w pass for this leaf)
    m      <- b1*m + (1-b1)*g
    v      <- b2*v + (1-b2)*g^2
    w      <- w - lr * (m/(1-b1^t)) / (sqrt(v/(1-b2^t)) + eps)
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 1024  # (1024, 128) f32 block = 512KB per operand; 4 operands in VMEM


def _adam_kernel(scal_ref, w_ref, m_ref, v_ref, g_ref, ow_ref, om_ref, ov_ref):
    lr = scal_ref[0]
    b1 = scal_ref[1]
    b2 = scal_ref[2]
    eps = scal_ref[3]
    decay = scal_ref[4]      # wd + 2*l2 combined coefficient
    b1corr = scal_ref[5]     # 1 - b1^t
    b2corr = scal_ref[6]     # 1 - b2^t
    w = w_ref[:]
    g = g_ref[:] + decay * w
    # moments may be stored bf16 (config.table_moments_dtype); f32 compute,
    # no-op astypes for f32 storage
    m = b1 * m_ref[:].astype(jnp.float32) + (1.0 - b1) * g
    v = b2 * v_ref[:].astype(jnp.float32) + (1.0 - b2) * g * g
    mhat = m / b1corr
    vhat = v / b2corr
    ow_ref[:] = w - lr * mhat / (jnp.sqrt(vhat) + eps)
    om_ref[:] = m.astype(om_ref.dtype)
    ov_ref[:] = v.astype(ov_ref.dtype)


def default_interpret() -> bool:
    """Pallas TPU kernels need interpret mode on the CPU backend (tests /
    the virtual multi-chip mesh run on forced-CPU platforms)."""
    return jax.default_backend() != "tpu"


def fused_adam_update(w: jnp.ndarray, m: jnp.ndarray, v: jnp.ndarray,
                      g: jnp.ndarray, t: jnp.ndarray,
                      lr: float, b1: float = 0.9, b2: float = 0.99,
                      eps: float = 1e-8, weight_decay: float = 1e-8,
                      l2: float = 0.0, interpret: bool = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused Adam step on an arbitrary-shape array (tiled as a flat
    [N/128, 128] view; tail padded). ``t`` is the 1-based step count
    (scalar int array). Returns (w, m, v); safe to donate inputs."""
    if w.dtype == jnp.bfloat16:
        # bf16 table storage needs the stochastic-rounded write; this
        # opt-in kernel (AREAD_TPU_PALLAS_ADAM, measured no faster than
        # the XLA fusion) delegates instead of duplicating the SR path
        return reference_adam_update(w, m, v, g, t, lr=lr, b1=b1, b2=b2,
                                     eps=eps, weight_decay=weight_decay,
                                     l2=l2)
    if interpret is None:
        interpret = default_interpret()
    shape, dtype = w.shape, w.dtype
    n = int(np.prod(shape))
    cols = LANES
    rows = -(-n // cols)
    pad = rows * cols - n

    def flat(x):
        x = x.reshape(-1)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(rows, cols)

    wf, mf, vf, gf = flat(w), flat(m), flat(v), flat(g)
    tf = t.astype(jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32), jnp.asarray(b1, jnp.float32),
        jnp.asarray(b2, jnp.float32), jnp.asarray(eps, jnp.float32),
        jnp.asarray(weight_decay + 2.0 * l2, jnp.float32),
        1.0 - jnp.asarray(b1, jnp.float32) ** tf,
        1.0 - jnp.asarray(b2, jnp.float32) ** tf,
    ])

    block = min(BLOCK_ROWS, rows)
    grid = (-(-rows // block),)
    spec = pl.BlockSpec((block, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_w, out_m, out_v = pl.pallas_call(
        _adam_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct((rows, cols), dtype),
                   jax.ShapeDtypeStruct((rows, cols), m.dtype),
                   jax.ShapeDtypeStruct((rows, cols), v.dtype)),
        input_output_aliases={1: 0, 2: 1, 3: 2},  # w,m,v updated in place
        interpret=interpret,
    )(scalars, wf, mf, vf, gf)

    def unflat(x):
        x = x.reshape(-1)
        if pad:
            x = x[:n]
        return x.reshape(shape)

    return unflat(out_w), unflat(out_m), unflat(out_v)


def reference_adam_update(w, m, v, g, t, lr, b1=0.9, b2=0.99, eps=1e-8,
                          weight_decay=1e-8, l2=0.0, sr_seed=None):
    """Pure-jnp ground truth for tests. Moments may be stored bf16
    (config.table_moments_dtype): compute is f32, storage dtype preserved
    (no-op astypes for f32 keep the f32 path bitwise unchanged). A bf16
    WEIGHT leaf (config.table_dtype) computes in f32 and writes back with
    stochastic rounding keyed by (element index, step) — ops/rounding.py."""
    in_w, in_m, in_v = w.dtype, m.dtype, v.dtype
    tf = t.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    g = g.astype(jnp.float32) + (weight_decay + 2.0 * l2) * wf
    m = b1 * m.astype(jnp.float32) + (1 - b1) * g
    v = b2 * v.astype(jnp.float32) + (1 - b2) * g * g
    mhat = m / (1 - b1 ** tf)
    vhat = v / (1 - b2 ** tf)
    new_w = wf - lr * mhat / (jnp.sqrt(vhat) + eps)
    if in_w == jnp.bfloat16:
        from aread_tpu.ops.rounding import sround
        idx = jnp.arange(int(np.prod(w.shape)),
                         dtype=jnp.uint32).reshape(w.shape)
        seed = (t if sr_seed is None else sr_seed).astype(jnp.int32)
        new_w = sround(new_w, in_w, idx, seed)
    return new_w.astype(in_w), m.astype(in_m), v.astype(in_v)
