import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
import aread_tpu.ops.pallas.sparse_adam_kernel as sak
from aread_tpu.ops.sparse_adam import dedup_rows

n_rows = 1518384; D = 32; K = 1024*17
n_flat = n_rows * D // 128
rng = np.random.default_rng(0)

def make_ids(key):
    ks = jax.random.split(key, 2)
    a = jax.random.randint(ks[0], (1024*7,), 0, 1368287)
    b = jax.random.randint(ks[1], (1024*10,), 0, 1368287)
    return jnp.concatenate([a, b]).astype(jnp.int32)

N = 50
def bench(name, body):
    @partial(jax.jit, donate_argnums=0)
    def run(c, keys):
        return jax.lax.scan(body, c, keys)
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    c, out = run(jnp.zeros(1), keys); _ = float(out.ravel()[0])
    keys = jax.random.split(jax.random.PRNGKey(2), N)
    t0 = time.perf_counter(); c, out = run(c, keys); _ = float(out.ravel()[0])
    print(f"{name:34s} {(time.perf_counter()-t0)/N*1e3:7.3f} ms/step")

# A: current full meta path (dedup + pack_meta)
def body_cur(c, key):
    ids = make_ids(key)
    g = jnp.ones((K, D), jnp.float32)
    uids, gsum = dedup_rows(ids, g, n_rows)
    bounds, fr_pad, gfull, ovf = sak.pack_meta(uids, gsum, n_rows, D)
    return c, (gfull.ravel()[:1] + bounds[-1].astype(jnp.float32) + fr_pad.ravel()[:1].astype(jnp.float32))
bench("A: dedup + pack_meta (current)", body_cur)

# B: pos-scatter densify: sort ids only; gsum via one unsorted scatter-add
def body_b(c, key):
    ids = make_ids(key)
    g = jnp.ones((K, D), jnp.float32)
    order = jnp.argsort(ids)
    sid = ids[order]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(new_seg) - 1
    uids = jnp.full((K,), n_rows, jnp.int32).at[seg].set(sid, indices_are_sorted=True)
    pos = jnp.zeros((K,), jnp.int32).at[order].set(seg)   # raw slot -> unique slot
    gsum = jnp.zeros((K, D), jnp.float32).at[pos].add(g)  # one scatter-add, raw order
    bounds, fr_pad, gfull, ovf = sak.pack_meta(uids, gsum, n_rows, D)
    return c, (gfull.ravel()[:1] + bounds[-1].astype(jnp.float32) + fr_pad.ravel()[:1].astype(jnp.float32))
bench("B: pos-scatter densify", body_b)

# C: dedup (current) + pack with tile-spread gfull (no [K,4,32] reshape)
rpf = 4
def pack_c(uids, gsum):
    fr = jnp.where(uids < n_rows, uids // rpf, n_flat).astype(jnp.int32)
    starts = jnp.arange((-(-n_flat // sak.BLOCK_F)) + 1, dtype=jnp.int32) * sak.BLOCK_F
    bounds = jnp.searchsorted(fr, starts, side="left").astype(jnp.int32)
    n_live = jnp.searchsorted(fr, jnp.int32(n_flat), side="left").astype(jnp.int32)
    bounds = jnp.minimum(bounds, n_live)
    grid = bounds.shape[0] - 1
    src = bounds[:-1, None] + jnp.arange(sak.PAD_W, dtype=jnp.int32)[None, :]
    valid = src < bounds[1:, None]
    srcc = jnp.minimum(src, K - 1).reshape(-1)
    fr_pad = jnp.where(valid, fr[srcc].reshape(grid, sak.PAD_W), -1)
    grp = jnp.where(uids < n_rows, uids % rpf, rpf).astype(jnp.int32)
    lane_grp = (jnp.arange(128, dtype=jnp.int32) // D)[None, :]
    gfull = jnp.where(lane_grp == grp[:, None], jnp.tile(gsum, (1, 128 // D)), 0.0)
    gfull = jnp.concatenate([gfull, jnp.zeros((sak.PAD_W, 128), gsum.dtype)])
    return bounds, fr_pad, gfull

def body_c2(c, key):
    ids = make_ids(key)
    g = jnp.ones((K, D), jnp.float32)
    uids, gsum = dedup_rows(ids, g, n_rows)
    bounds, fr_pad, gfull = pack_c(uids, gsum)
    return c, (gfull.ravel()[:1] + bounds[-1].astype(jnp.float32) + fr_pad.ravel()[:1].astype(jnp.float32))
bench("C: dedup + tile-spread pack", body_c2)

# D: B + C combined
def body_d(c, key):
    ids = make_ids(key)
    g = jnp.ones((K, D), jnp.float32)
    order = jnp.argsort(ids)
    sid = ids[order]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(new_seg) - 1
    uids = jnp.full((K,), n_rows, jnp.int32).at[seg].set(sid, indices_are_sorted=True)
    pos = jnp.zeros((K,), jnp.int32).at[order].set(seg)
    gsum = jnp.zeros((K, D), jnp.float32).at[pos].add(g)
    bounds, fr_pad, gfull = pack_c(uids, gsum)
    return c, (gfull.ravel()[:1] + bounds[-1].astype(jnp.float32) + fr_pad.ravel()[:1].astype(jnp.float32))
bench("D: B + C combined", body_d)
