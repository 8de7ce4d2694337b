"""Isolate sparse-Adam optimizer cost components on the real chip."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

from aread_tpu.ops.sparse_adam import dedup_rows, sparse_adam_dispatch
from aread_tpu.ops.pallas import sparse_adam_kernel as sak

n_rows_raw = 1368287 + 7 + 25 + 40 + 11 + 150000 + 12
D = 32
# pad like models/base.pad_vocab so n_rows*D % 128 == 0
n_rows = -(-n_rows_raw * D // 128) * 128 // D
K = 1024 * 17
n_flat = n_rows * D // 128
print(f"n_rows={n_rows} n_flat={n_flat} grid={-(-n_flat // sak.BLOCK_F)}")

rng = np.random.default_rng(0)
w = jnp.asarray(rng.normal(size=(n_flat, 128)), jnp.float32)
m = jnp.zeros_like(w); v = jnp.zeros_like(w)

def make_ids(key):
    # mimic batch: 7 onehot fields + 10 seq ids per example
    ks = jax.random.split(key, 2)
    a = jax.random.randint(ks[0], (1024 * 7,), 0, 1368287)
    b = jax.random.randint(ks[1], (1024 * 10,), 0, 1368287)
    return jnp.concatenate([a, b]).astype(jnp.int32)

N = 50
kw = dict(lr=1e-3, b1=0.9, b2=0.99, eps=1e-8, weight_decay=1e-8, l2=1e-5)

def bench(name, body, carry):
    carry = jax.tree.map(jnp.copy, carry)
    @partial(jax.jit, donate_argnums=0)
    def run(carry, keys):
        return jax.lax.scan(body, carry, keys)
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    carry, out = run(carry, keys)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    keys = jax.random.split(jax.random.PRNGKey(2), N)
    t0 = time.perf_counter()
    carry, out = run(carry, keys)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:28s} {dt:7.3f} ms/step")
    return carry

# 1. dedup only
def body_dedup(c, key):
    ids = make_ids(key)
    g = jnp.ones((K, D), jnp.float32)
    uids, gsum = dedup_rows(ids, g, n_rows)
    return c, (uids.astype(jnp.float32).sum() + gsum.sum()).reshape(1)
bench("dedup(argsort+segsum)", body_dedup, jnp.zeros(1))

# 2. pack_meta only (on pre-dedup'd ids)
uids0, gsum0 = jax.jit(lambda k: dedup_rows(make_ids(k), jnp.ones((K, D), jnp.float32), n_rows))(jax.random.PRNGKey(0))
def body_pack(c, key):
    bounds, fr_pad, gfull, ovf = sak.pack_meta(uids0 + 0 * key[0].astype(jnp.int32), gsum0, n_rows, D)
    return c, (bounds.sum() + fr_pad.sum()).astype(jnp.float32).reshape(1)
bench("pack_meta", body_pack, jnp.zeros(1))


# 4. kernel only (pre-dedup'd, no cond/overflow check)
def body_kern(c, key):
    w_, m_, v_ = c
    t = jnp.asarray(1, jnp.int32)
    ow, om, ov = sak.sparse_adam_kernel_update(
        w_, m_, v_, uids0, gsum0, t, table_shape=(n_rows, D), interpret=False, **kw)
    return (ow, om, ov), ow.ravel()[:1]
w2 = bench("pallas kernel only", body_kern, (w, m, v))

# 5. full dispatch (dedup + cond + kernel)
def body_full(c, key):
    w_, m_, v_ = c
    ids = make_ids(key)
    g = jnp.ones((K, D), jnp.float32)
    uids, gsum = dedup_rows(ids, g, n_rows)
    t = jnp.asarray(1, jnp.int32)
    ow, om, ov = sparse_adam_dispatch(w_, m_, v_, uids, gsum, t,
                                      table_shape=(n_rows, D), **kw)
    return (ow, om, ov), ow.ravel()[:1]
bench("full dispatch", body_full, w2)

# 6. pure elementwise 6-pass roofline (read+write w,m,v)
def body_roof(c, key):
    w_, m_, v_ = c
    s = key[0].astype(jnp.float32) * 0 + 0.9
    return (w_ * s, m_ * s, v_ * s), w_.ravel()[:1]
bench("roofline 6-pass eltwise", body_roof, w2)

# 7. split dedup cost: argsort alone vs segment ops alone
ids_fixed = jax.jit(make_ids)(jax.random.PRNGKey(5))
order_fixed = jax.jit(jnp.argsort)(ids_fixed)

def body_sortonly(c, key):
    ids = make_ids(key)
    order = jnp.argsort(ids)
    return c, order[:1].astype(jnp.float32)
bench("argsort only", body_sortonly, jnp.zeros(1))

def body_segonly(c, key):
    g = jnp.ones((K, D), jnp.float32) * key[0].astype(jnp.float32)
    sid = ids_fixed[order_fixed]
    sg = g[order_fixed]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(new_seg) - 1
    gsum = jax.ops.segment_sum(sg, seg, num_segments=K)
    counts = jax.ops.segment_sum(jnp.ones_like(sid, jnp.int32), seg, num_segments=K)
    uids = jax.ops.segment_max(sid, seg, num_segments=K)
    return c, gsum.ravel()[:1] + counts[:1].astype(jnp.float32) + uids[:1].astype(jnp.float32)
bench("seg ops only (fixed order)", body_segonly, jnp.zeros(1))

def body_gsum_only(c, key):
    g = jnp.ones((K, D), jnp.float32) * key[0].astype(jnp.float32)
    sg = g[order_fixed]
    sid = ids_fixed[order_fixed]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(new_seg) - 1
    gsum = jax.ops.segment_sum(sg, seg, num_segments=K)
    return c, gsum.ravel()[:1]
bench("gather+gsum only", body_gsum_only, jnp.zeros(1))

# 8. sorted-flag segment ops
def body_segsorted(c, key):
    g = jnp.ones((K, D), jnp.float32) * key[0].astype(jnp.float32)
    sid = ids_fixed[order_fixed]
    sg = g[order_fixed]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(new_seg) - 1
    gsum = jax.ops.segment_sum(sg, seg, num_segments=K, indices_are_sorted=True)
    counts = jax.ops.segment_sum(jnp.ones_like(sid, jnp.int32), seg, num_segments=K, indices_are_sorted=True)
    uids = jax.ops.segment_max(sid, seg, num_segments=K, indices_are_sorted=True)
    return c, gsum.ravel()[:1] + counts[:1].astype(jnp.float32) + uids[:1].astype(jnp.float32)
bench("seg ops sorted-flag", body_segsorted, jnp.zeros(1))

# 9. sort ids once as [K] then derive everything w/o segment_max/counts:
# uids at compacted front via scatter of first-slot values
def body_dedup2(c, key):
    ids = make_ids(key)
    g = jnp.ones((K, D), jnp.float32)
    order = jnp.argsort(ids)
    sid = ids[order]
    sg = g[order]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(new_seg) - 1
    gsum = jax.ops.segment_sum(sg, seg, num_segments=K, indices_are_sorted=True)
    # uids via scatter-set sid at seg (sorted): last writer per segment wins = max
    uids = jnp.full((K,), n_rows, jnp.int32).at[seg].set(
        sid, indices_are_sorted=True)
    return c, gsum.ravel()[:1] + uids[:1].astype(jnp.float32)
bench("dedup2 (sorted flags)", body_dedup2, jnp.zeros(1))

# 10. bf16t (r5 default): kernel with bf16 table+moments storage, and the
# SAME-PATTERN 6-pass bf16 elementwise roofline — the measured floor that
# makes BASELINE.md's "at the wall" claim checkable for the bf16t variant
# specifically (VERDICT r4 weakness 7 asked for this for mixed sweeps).
wb = w.astype(jnp.bfloat16)
mb = jnp.zeros_like(wb); vb = jnp.zeros_like(wb)

def body_kern_bf16(c, key):
    w_, m_, v_ = c
    t = jnp.asarray(1, jnp.int32)
    ow, om, ov = sak.sparse_adam_kernel_update(
        w_, m_, v_, uids0, gsum0, t, table_shape=(n_rows, D),
        interpret=False, **kw)
    return (ow, om, ov), ow.ravel()[:1].astype(jnp.float32)
wb2 = bench("pallas kernel bf16t", body_kern_bf16, (wb, mb, vb))

def body_roof_bf16(c, key):
    w_, m_, v_ = c
    s = (key[0].astype(jnp.float32) * 0 + 0.9).astype(jnp.bfloat16)
    return (w_ * s, m_ * s, v_ * s), w_.ravel()[:1].astype(jnp.float32)
bench("roofline 6-pass bf16 eltwise", body_roof_bf16, wb2)
