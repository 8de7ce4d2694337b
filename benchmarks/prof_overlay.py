"""Per-op profile of the overlay fast-adapt primitives at Amazon scale
(ops/overlay_adam.py) — finds which op made the first production overlay
regroup dispatch exceed the ~60 s tunnel-dispatch ceiling (the 17.9M
epoch bench's TPU-worker crash, r5).

Shapes: flat table [380k, 128] bf16 (1.52M x 32), one candidate chain =
S=5 batches of bs=1024 x F=17 -> C = 87,040 working-set slots, K = 17,408
gathered ids/step.

Timing: scan-amortized (REPS iterations inside one jit) + host fetch of a
scalar, best of 2 — the tunnel returns from block_until_ready early
(CLAUDE.md).

Run: python benchmarks/prof_overlay.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPS = 50


def timed(name, fn, *args):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(fn)
    out = jfn(*args)  # compile
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = jfn(*args)
        s = float(jnp.sum(
            jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) * 1e3
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best / REPS:8.3f} ms/op   ({best:7.1f} ms "
          f"for {REPS} reps)", flush=True)
    return best / REPS


def main():
    import jax
    import jax.numpy as jnp

    from aread_tpu.utils.device_cleanup import install
    install()
    from aread_tpu.utils.jit_cache import enable
    enable()
    from aread_tpu.ops import overlay_adam as oa
    from aread_tpu.ops.sparse_adam import dedup_rows

    S, BS, F, D, rpf = 5, 1024, 17, 32, 4
    n_rows = 1_521_664           # 1.52M-ish, divisible by rpf
    n_flat = n_rows // rpf
    C = S * BS * F
    K = BS * F
    rng = np.random.default_rng(0)

    table = jnp.asarray(rng.normal(size=(n_flat, 128)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    raw_ids = jnp.asarray(
        rng.integers(0, n_rows, size=(S, BS * F)).astype(np.int32))
    flat_ids = (raw_ids // rpf).reshape(-1)

    # ---- 1. working-set sort ([C] int32)
    timed("sort C ids (build_working_set)",
          lambda x: jax.lax.scan(
              lambda c, _: (c, jnp.sort(c)), flat_ids,
              None, length=REPS)[1][-1], flat_ids)
    ws = jnp.sort(flat_ids)

    # ---- 2. overlay_init gather [C, 128]
    timed("overlay_init gather",
          lambda t, w: jax.lax.scan(
              lambda c, _: (c, oa.overlay_init(t, w)[0]), 0,
              None, length=REPS)[1][-1], table, ws)

    # ---- 3. dedup (shared with the full path)
    g = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
    timed("dedup_rows (shared)",
          lambda i, gg: jax.lax.scan(
              lambda c, _: (c, dedup_rows(i, gg, n_rows)[1]), 0,
              None, length=REPS)[1][-1], raw_ids[0], g)
    uids, gsum = dedup_rows(raw_ids[0], g, n_rows)

    # ---- 4. compact_grad (searchsorted [C, rpf] + gather)
    timed("compact_grad",
          lambda w, u, gg: jax.lax.scan(
              lambda c, _: (c, oa.compact_grad(w, u, gg, rpf)), 0,
              None, length=REPS)[1][-1], ws, uids, gsum)
    cg = oa.compact_grad(ws, uids, gsum, rpf)

    # ---- 5. compact Adam step [C, 128] f32 x4 arrays
    wv, wm, wvv = oa.overlay_init(table, ws)

    def adam_rep(wv, wm, wvv, cg):
        def body(c, _):
            a, b, d = c
            a, b, d = oa.overlay_adam_step(a, b, d, cg,
                                           jnp.asarray(1, jnp.int32),
                                           lr=1e-2, wd=1e-8, l2=1e-5)
            return (a, b, d), 0.0
        (a, _, _), _ = jax.lax.scan(body, (wv, wm, wvv), None, length=REPS)
        return a
    timed("overlay_adam_step", adam_rep, wv, wm, wvv, cg)

    # ---- 6. overlay_gather for one batch's lookups ([BS, F] queries)
    q = (raw_ids[1] // rpf).reshape(BS, F)
    timed("overlay_gather (adapt, drift 0)",
          lambda t, w, v, qq: jax.lax.scan(
              lambda c, _: (c, oa.overlay_gather(
                  t, qq, ws=w, wvals=v, drift_steps=0,
                  lr=1e-2, wd=1e-8, l2=1e-5)), 0,
              None, length=REPS)[1][-1], table, ws, wv, q)
    timed("overlay_gather (probe, drift 5)",
          lambda t, w, v, qq: jax.lax.scan(
              lambda c, _: (c, oa.overlay_gather(
                  t, qq, ws=w, wvals=v, drift_steps=5,
                  lr=1e-2, wd=1e-8, l2=1e-5)), 0,
              None, length=REPS)[1][-1], table, ws, wv, q)

    # ---- 7. drift_table_l2 (once per regroup)
    t0 = time.perf_counter()
    v = float(oa.drift_table_l2(table, 5, 1e-2, 1e-8, 1e-5))
    print(f"{'drift_table_l2 compile+run':34s} {(time.perf_counter()-t0)*1e3:8.1f} ms (={v:.3e})")
    t0 = time.perf_counter()
    v = float(oa.drift_table_l2(table, 5, 1e-2, 1e-8, 1e-5))
    print(f"{'drift_table_l2 warm':34s} {(time.perf_counter()-t0)*1e3:8.1f} ms")

    # ---- 8. overlay_l2_correction (per candidate)
    timed("overlay_l2_correction",
          lambda t, w, v: jax.lax.scan(
              lambda c, _: (c, oa.overlay_l2_correction(
                  t, w, v, 5, lr=1e-2, wd=1e-8, l2=1e-5)), 0,
              None, length=REPS)[1][-1], table, ws, wv)


if __name__ == "__main__":
    main()
