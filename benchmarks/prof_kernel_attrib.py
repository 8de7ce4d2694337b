"""Attribute the bf16t sparse-Adam kernel's gap over the bare-copy floor
(1.77 ms kernel vs 1.46 ms 6-pass bf16 copy, BASELINE.md r5).

Runs modified copies of the production kernel (ops/pallas/
sparse_adam_kernel._kernel) with parts removed, at Amazon shapes:

  full        — the production kernel (SR via hardware PRNG)
  rtn         — stochastic rounding replaced by round-to-nearest astype
                (isolates the PRNG + stochastic_round cost)
  dot1        — densify with ONE bf16 dot instead of the exact 3-dot
                f32 reassembly (isolates 2/3 of the MXU densify cost)
  nodots      — gradient forced to zero, no one-hot/no dots at all
                (isolates the whole densify: iota+compare+3 dots+gwin)
  noadam      — copy w/m/v through with only the densify running
                (isolates the Adam VPU math incl. sqrt/div)

Run: python benchmarks/prof_kernel_attrib.py   (~3 min)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPS = 200


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aread_tpu.utils.device_cleanup import install
    install()
    from aread_tpu.utils.jit_cache import enable
    enable()
    import aread_tpu.ops.pallas.sparse_adam_kernel as sak
    from aread_tpu.ops.sparse_adam import dedup_rows

    D, bs, F = 32, 1024, 17
    n_rows = 1_521_664
    n_flat = n_rows * D // 128
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(n_flat, 128)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    m = jnp.zeros_like(w)
    v = jnp.zeros_like(w)
    ids = jnp.asarray(rng.integers(0, n_rows, size=bs * F).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(bs * F, D)).astype(np.float32))
    uids, gsum = dedup_rows(ids, g, n_rows)
    bounds, fr_pad, gfull, _ = sak.pack_meta(uids, gsum, n_rows, D)

    def variant_kernel(mode):
        base = sak._kernel

        def kernel(bounds_ref, scal_ref, seed_ref, w_ref, m_ref, v_ref,
                   fr_ref, gfull_ref, ow_ref, om_ref, ov_ref):
            i = pl.program_id(0)
            lr, b1, b2, eps, decay = (scal_ref[0], scal_ref[1], scal_ref[2],
                                      scal_ref[3], scal_ref[4])
            b1c, b2c = scal_ref[5], scal_ref[6]
            omb1, omb2 = scal_ref[7], scal_ref[8]
            if mode == "nodots":
                gfix = jnp.zeros((sak.BLOCK_F, sak.LANES), jnp.float32)
            else:
                local = fr_ref[pl.ds(i % sak.FR_WIN, 1), :] - i * sak.BLOCK_F
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (sak.BLOCK_F, sak.PAD_W), 0)
                onehot = (rows == local).astype(jnp.bfloat16)
                gwin = gfull_ref[pl.ds(bounds_ref[i], sak.PAD_W), :]
                hi = gwin.astype(jnp.bfloat16)
                if mode == "dot1":
                    gfix = jnp.dot(onehot, hi,
                                   preferred_element_type=jnp.float32)
                else:
                    r1 = gwin - hi.astype(jnp.float32)
                    mid = r1.astype(jnp.bfloat16)
                    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                    f32 = jnp.float32
                    gfix = (jnp.dot(onehot, hi, preferred_element_type=f32)
                            + jnp.dot(onehot, mid, preferred_element_type=f32)
                            + jnp.dot(onehot, lo, preferred_element_type=f32))
            if mode == "noadam":
                ow_ref[:] = w_ref[:] + gfix.astype(w_ref.dtype) * 0
                om_ref[:] = m_ref[:]
                ov_ref[:] = v_ref[:]
                return
            wf = w_ref[:].astype(jnp.float32)
            gg = gfix + decay * wf
            m2 = b1 * m_ref[:].astype(jnp.float32) + omb1 * gg
            v2 = b2 * v_ref[:].astype(jnp.float32) + omb2 * gg * gg
            w2 = wf - lr * (m2 / b1c) / (jnp.sqrt(v2 / b2c) + eps)
            if mode == "rtn":
                ow_ref[:] = w2.astype(jnp.bfloat16)
            else:
                pltpu.prng_seed(seed_ref[0] * 1000003 + i)
                rbits = pltpu.bitcast(
                    pltpu.prng_random_bits((sak.BLOCK_F, sak.LANES)),
                    jnp.uint32)
                ow_ref[:] = pltpu.stochastic_round(
                    w2, rbits, target_dtype=jnp.bfloat16)
            om_ref[:] = m2.astype(om_ref.dtype)
            ov_ref[:] = v2.astype(ov_ref.dtype)
        return kernel

    def run_variant(mode):
        K = gfull.shape[0] - sak.PAD_W
        grid = -(-n_flat // sak.BLOCK_F)
        t = jnp.asarray(1, jnp.int32)
        tf = t.astype(jnp.float32)
        scalars = jnp.stack([
            jnp.asarray(1e-3, jnp.float32), jnp.asarray(0.9, jnp.float32),
            jnp.asarray(0.99, jnp.float32), jnp.asarray(1e-8, jnp.float32),
            jnp.asarray(1e-8 + 2e-5, jnp.float32),
            1.0 - jnp.asarray(0.9, jnp.float32) ** tf,
            1.0 - jnp.asarray(0.99, jnp.float32) ** tf,
            jnp.asarray(0.1, jnp.float32), jnp.asarray(0.01, jnp.float32)])
        seed_arr = jnp.asarray([1], jnp.int32)
        block = pl.BlockSpec((sak.BLOCK_F, sak.LANES), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
        fr_spec = pl.BlockSpec((sak.FR_WIN, sak.PAD_W),
                               lambda i, *_: (i // sak.FR_WIN, 0),
                               memory_space=pltpu.VMEM)
        gfull_spec = pl.BlockSpec((K + sak.PAD_W, sak.LANES),
                                  lambda i, *_: (0, 0),
                                  memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=(grid,),
            in_specs=[block, block, block, fr_spec, gfull_spec],
            out_specs=(block, block, block))
        call = pl.pallas_call(
            variant_kernel(mode), grid_spec=grid_spec,
            out_shape=tuple(jax.ShapeDtypeStruct((n_flat, 128), jnp.bfloat16)
                            for _ in range(3)),
            input_output_aliases={3: 0, 4: 1, 5: 2},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
            interpret=False)

        def body(c, _):
            w_, m_, v_ = c
            return call(bounds, scalars, seed_arr, w_, m_, v_, fr_pad,
                        gfull), jnp.float32(0)

        @jax.jit
        def scanrun(c):
            c, _ = jax.lax.scan(body, c, None, length=REPS)
            return c

        c = (w, m, v)
        out = scanrun(c)
        _ = float(out[0].ravel()[0].astype(jnp.float32))  # compile+sync
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = scanrun(c)
            _ = float(out[0].ravel()[0].astype(jnp.float32))
            best = min(best or 9e9, (time.perf_counter() - t0) * 1e3)
        print(f"{mode:8s} {best / REPS:7.3f} ms/step", flush=True)
        return best / REPS

    for mode in ("full", "rtn", "dot1", "nodots", "noadam"):
        run_variant(mode)


if __name__ == "__main__":
    main()
