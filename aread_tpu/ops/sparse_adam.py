"""Sparse-gradient Adam for the fused embedding table.

The reference's torch.optim.Adam is DENSE over the table: weight decay and
the embedding L2 term (layer.py:96-112) give every row a nonzero gradient,
and the moments decay every step. The straightforward JAX port pays for
that twice per step at Amazon scale (1.52M x 32 rows):

  * the backward of the embedding gather materializes a DENSE [n_rows, E]
    cotangent (a 195MB zeros buffer + scatter-add + a full re-read by the
    optimizer), although only ~bs*17 rows carry data gradients;
  * the optimizer pass then streams 7 table-sized operands (r/w of w, m, v
    plus the dense g read).

This module keeps torch-Adam's EXACT dense semantics while touching the
minimum bytes:

  phase A (dense, 6 passes): every row takes the decay-only update
      g0 = (wd + 2*l2) * w — one fused XLA elementwise pass over (w, m, v);
  phase B (sparse): the rows actually gathered this step are recomputed
      from their ORIGINAL (w, m, v) with the full gradient
      g = g_data + (wd + 2*l2) * w and scattered over the phase-A result.

Since each touched row's final value is derived from its pre-step state,
A-then-B equals the one-shot dense update bit-for-bit (same expression,
same operation order). The data gradient arrives as (ids, row_grads) from
a flax ``perturb`` tap on the gathered rows (ops/embedding.py) — the dense
cotangent never exists.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def dedup_rows(flat_ids: jnp.ndarray, flat_grads: jnp.ndarray,
               n_rows: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum duplicate ids' gradients. Returns (uids [K], gsum [K, D]) where
    K = len(flat_ids); entries beyond the number of unique ids carry the
    sentinel ``n_rows`` (out of bounds -> dropped by the scatter)."""
    K = flat_ids.shape[0]
    order = jnp.argsort(flat_ids)
    sid = flat_ids[order]
    sg = flat_grads[order]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(new_seg) - 1  # [K] segment index, 0..U-1
    gsum = jax.ops.segment_sum(sg, seg, num_segments=K,
                               indices_are_sorted=True)
    # compacted unique ids: scatter-set sid at its segment slot (seg is
    # sorted; every segment gets at least one writer, all with the same
    # sid) — one int32 scatter instead of segment_max + a counts pass
    uids = jnp.full((K,), n_rows, jnp.int32).at[seg].set(
        sid.astype(jnp.int32), indices_are_sorted=True)
    return uids, gsum


def sparse_table_adam(w: jnp.ndarray, m: jnp.ndarray, v: jnp.ndarray,
                      flat_ids: jnp.ndarray, flat_grads: jnp.ndarray,
                      t: jnp.ndarray, lr: float, b1: float = 0.9,
                      b2: float = 0.99, eps: float = 1e-8,
                      weight_decay: float = 1e-8, l2: float = 0.0,
                      table_shape: Tuple[int, int] = None,
                      lazy: bool = False,
                      assume_no_overflow: bool = False,
                      want_l2: bool = False
                      ) -> Tuple[jnp.ndarray, ...]:
    """Dense-semantics Adam step from a sparse data gradient.

    w/m/v: the table and moments, either [n_rows, D] or — preferred on
    TPU — the lane-packed flat view [n_rows*D/128, 128] (see
    ops/embedding.FeaturesEmbedding.flat_storage; pass ``table_shape`` =
    (n_rows, D) then). flat_ids [K] int (logical table rows);
    flat_grads [K, D]; t: 1-based step (scalar int array).
    Returns (w, m, v) in the layout given; with ``want_l2`` also
    sum(w_pre**2) as a 4th output (free on the kernel path — the table is
    already streaming through it; an explicit pass elsewhere, exactly what
    a separate trainer-side table_reg_value would have paid)."""
    n_rows, d = table_shape if table_shape is not None else w.shape
    uids, gsum = dedup_rows(flat_ids, flat_grads, n_rows)
    return sparse_adam_dispatch(w, m, v, uids, gsum, t, lr=lr, b1=b1, b2=b2,
                                eps=eps, weight_decay=weight_decay, l2=l2,
                                table_shape=(n_rows, d), lazy=lazy,
                                assume_no_overflow=assume_no_overflow,
                                want_l2=want_l2)


def sparse_adam_dispatch(w: jnp.ndarray, m: jnp.ndarray, v: jnp.ndarray,
                         uids: jnp.ndarray, gsum: jnp.ndarray,
                         t: jnp.ndarray, lr: float, b1: float = 0.9,
                         b2: float = 0.99, eps: float = 1e-8,
                         weight_decay: float = 1e-8, l2: float = 0.0,
                         table_shape: Tuple[int, int] = None,
                         lazy: bool = False,
                         assume_no_overflow: bool = False,
                         want_l2: bool = False,
                         sr_seed: jnp.ndarray = None
                         ) -> Tuple[jnp.ndarray, ...]:
    """sparse_table_adam after dedup: (uids, gsum) are SORTED-unique with
    sentinel >= n_rows padding. Kernel on TPU when supported, exact XLA
    two-phase otherwise / on overflow. Also the per-shard body of
    parallel.sharded_adam (each shard passes its local slice).

    ``assume_no_overflow=True`` drops the lax.cond overflow fallback and
    calls the kernel unconditionally. The cond is EXPENSIVE: XLA cannot
    alias the three table-sized buffers uniformly across its branches
    (the fallback branch relayouts them), inserting full-table copies —
    measured 1.26 ms/step, 25% of the whole train step. The caller MUST
    have verified the batch with ``rows_fit_kernel`` first (host numpy,
    microseconds); trainers do this per scan chunk and fall back to the
    safe variant for the (never observed in practice) overflowing chunk.

    ``lazy=True`` switches to torch.optim.SparseAdam semantics: ONLY the
    rows gathered this step are updated (moments of untouched rows do not
    decay, untouched weights are bit-unchanged). That removes the dense
    decay sweep — the only part of the exact-dense update whose cost is
    O(table) instead of O(batch rows) — at the price of a documented,
    deliberate semantic deviation from the reference's dense Adam."""
    n_rows, d = table_shape if table_shape is not None else w.shape
    is_flat = w.shape != (n_rows, d)
    kw = dict(lr=lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay, l2=l2)
    # pre-update ||w||^2 for paths that don't get it free from the kernel
    # (same explicit full pass a trainer-side table_reg_value would pay);
    # f32 accumulation for bf16-stored tables
    w_l2 = ((lambda: jnp.sum(jnp.square(w.astype(jnp.float32))))
            if want_l2 else None)

    if lazy:
        out = _lazy_sparse_adam(w, m, v, uids, gsum, t,
                                table_shape=(n_rows, d), sr_seed=sr_seed,
                                **kw)
        return out + (w_l2(),) if want_l2 else out

    from aread_tpu.ops.pallas import sparse_adam_kernel as sak

    def xla_path(w_, m_, v_):
        # ground truth / overflow fallback; operates on the [n_rows, D]
        # view (on TPU the reshape from flat storage is a relayout — only
        # paid on the rare PAD_W overflow)
        l2v = ((jnp.sum(jnp.square(w_.astype(jnp.float32))),)
               if want_l2 else ())
        if is_flat:
            w_, m_, v_ = (a.reshape(n_rows, d) for a in (w_, m_, v_))
        out = _xla_sparse_adam(w_, m_, v_, uids, gsum, t, sr_seed=sr_seed,
                               **kw)
        if is_flat:
            out = tuple(a.reshape(w.shape) for a in out)
        return tuple(out) + l2v

    if jax.default_backend() == "tpu" and sak.supports(n_rows, d):
        # one-pass Pallas kernel on the flat [*, 128] view: per-block
        # one-hot-matmul gradient densification + fused Adam — no XLA
        # scatter (which costs a full table copy per operand). Falls back
        # to the exact XLA path when a block receives more than PAD_W
        # distinct rows (pathological id clustering). pack_meta runs ONCE
        # and its overflow flag drives the cond (an earlier version
        # recomputed the bounds math in a separate check — ~0.6 ms/step).
        bounds, fr_pad, gfull, overflow = sak.pack_meta(uids, gsum,
                                                        n_rows, d)
        if assume_no_overflow:
            return sak.sparse_adam_kernel_premeta(
                w, m, v, bounds, fr_pad, gfull, t,
                table_shape=(n_rows, d), want_l2=want_l2, sr_seed=sr_seed,
                **kw)
        return jax.lax.cond(
            overflow,
            xla_path,
            lambda w_, m_, v_: sak.sparse_adam_kernel_premeta(
                w_, m_, v_, bounds, fr_pad, gfull, t,
                table_shape=(n_rows, d), want_l2=want_l2, sr_seed=sr_seed,
                **kw),
            w, m, v)

    return xla_path(w, m, v)


def rows_fit_kernel(row_ids, n_rows: int, d: int) -> bool:
    """Host-side (numpy) check that a batch's table row ids fit the
    kernel's per-block PAD_W window — the exact predicate pack_meta's
    overflow flag computes on device. True means sparse_adam_dispatch may
    run with ``assume_no_overflow=True`` (no lax.cond, no table copies).
    ``row_ids``: already-offset table row ids, any shape."""
    import numpy as np

    from aread_tpu.ops.pallas import sparse_adam_kernel as sak

    if not sak.supports(n_rows, d):
        return False  # kernel unused; the flag would be meaningless
    rpf = sak.LANES // d
    n_flat = (n_rows * d) // sak.LANES
    grid = -(-n_flat // sak.BLOCK_F)
    # the kernel's PAD_W window holds one sorted entry per unique TABLE
    # row (pack_meta bounds are over the deduped uids, which repeat per
    # flat row) — so count distinct table rows per block, NOT distinct
    # flat rows. Presence bitmap: O(K + n_rows), ~1 ms at chunk scale.
    rows_per_block = sak.BLOCK_F * rpf
    present = np.zeros(grid * rows_per_block, bool)
    present[np.asarray(row_ids).reshape(-1)] = True
    counts = present.reshape(grid, rows_per_block).sum(axis=1)
    return int(counts.max(initial=0)) <= sak.PAD_W


def steps_fit_kernel(row_ids_2d, n_rows: int, d: int) -> bool:
    """rows_fit_kernel evaluated PER STEP: ``row_ids_2d`` is
    [n_steps, K] (one optimizer step per row). The overflow predicate is
    per-step — pooling a whole scan chunk's ids would count the union's
    distinct rows per block and report 'unfit' for any realistically
    sized chunk. Vectorized: row-wise sort, distinct-run flags, one
    bincount over (step, block) keys."""
    import numpy as np

    from aread_tpu.ops.pallas import sparse_adam_kernel as sak

    if not sak.supports(n_rows, d):
        return False
    ids = np.asarray(row_ids_2d)
    ids = ids.reshape(ids.shape[0], -1) if ids.ndim > 2 else ids
    rpf = sak.LANES // d
    n_flat = (n_rows * d) // sak.LANES
    grid = -(-n_flat // sak.BLOCK_F)
    # distinct TABLE rows per (step, block) — matching pack_meta's bounds
    # over the deduped uids (NOT distinct flat rows: uids sharing a flat
    # row occupy separate window entries)
    sid = np.sort(ids, axis=1)                           # [S, K]
    new = np.ones(sid.shape, bool)
    new[:, 1:] = sid[:, 1:] != sid[:, :-1]
    blk = (sid // rpf) // sak.BLOCK_F
    S = sid.shape[0]
    key = (np.arange(S)[:, None] * grid + blk)[new]
    counts = np.bincount(key, minlength=S * grid)
    return int(counts.max(initial=0)) <= sak.PAD_W


def steps_fit_kernel_jax(ids_2d: jnp.ndarray, n_rows: int, d: int,
                         per_step: bool = False):
    """steps_fit_kernel as a jittable device computation: ``ids_2d``
    [S, K] already-offset table rows, one optimizer step per row; returns
    a scalar bool (max distinct table rows per flat block over all steps
    <= PAD_W), or the per-step [S] bool vector with ``per_step`` (lets a
    scheduler fetch a whole interval's verdicts in one round trip). One
    batched row-sort — several times faster than a scan of per-step
    sorts, and orders of magnitude faster than host numpy on this
    image's 2 CPU cores."""
    from aread_tpu.ops.pallas import sparse_adam_kernel as sak

    assert sak.supports(n_rows, d), (n_rows, d)
    rpf = sak.LANES // d
    n_flat = (n_rows * d) // sak.LANES
    grid = -(-n_flat // sak.BLOCK_F)
    S = ids_2d.shape[0]
    sid = jnp.sort(ids_2d, axis=-1)
    new = jnp.concatenate(
        [jnp.ones((S, 1), bool), sid[:, 1:] != sid[:, :-1]], axis=1)
    blk = (sid // rpf) // sak.BLOCK_F
    key = (jnp.arange(S, dtype=jnp.int32)[:, None] * grid + blk).reshape(-1)
    counts = jax.ops.segment_sum(new.reshape(-1).astype(jnp.int32), key,
                                 num_segments=S * grid)
    ok_s = counts.reshape(S, grid).max(axis=1) <= sak.PAD_W
    return ok_s if per_step else ok_s.all()


def _lazy_sparse_adam(w, m, v, uids, gsum, t, lr, b1=0.9, b2=0.99, eps=1e-8,
                      weight_decay=1e-8, l2=0.0, table_shape=None,
                      sr_seed=None):
    """torch.optim.SparseAdam-semantics update: only the gathered rows'
    weights and moments change; bias correction uses the global step.
    Unlike torch's SparseAdam (which rejects weight_decay), the decay/L2
    term is applied to the TOUCHED rows' gradients — 'lazy regularization'
    as in TF's lazy Adam embeddings.

    Operates natively on the lane-packed flat [n_rows*D/128, 128] storage
    when 128 % D == 0: row r owns lanes [(r%R)*D, (r%R+1)*D) of flat row
    r//R (R = 128//D). Touched rows are positioned into 128-lane segments
    with a one-hot matmul, second-level deduped by flat row, and a lane
    mask confines the Adam update to owned lanes — untouched rows sharing
    a flat row are bit-unchanged. Total traffic is O(touched rows), not
    O(table): the whole point of lazy mode."""
    from aread_tpu.ops.rounding import sround

    n_rows, d = table_shape if table_shape is not None else w.shape
    is_flat = w.shape != (n_rows, d)
    decay = weight_decay + 2.0 * l2
    tf_ = t.astype(jnp.float32)
    b1c = 1.0 - jnp.asarray(b1, jnp.float32) ** tf_
    b2c = 1.0 - jnp.asarray(b2, jnp.float32) ** tf_
    seed = (t if sr_seed is None else sr_seed).astype(jnp.int32)

    def adam(w_, m_, v_, g_, mask, idx):
        # bf16-stored tables compute f32 + stochastic-round the write
        # (ops/rounding.py); all astypes/srounds are no-ops for f32
        wf = w_.astype(jnp.float32)
        g_ = g_ + decay * wf * mask
        mf = m_.astype(jnp.float32)
        vf = v_.astype(jnp.float32)
        m2 = jnp.where(mask > 0, b1 * mf + (1.0 - b1) * g_, mf)
        v2 = jnp.where(mask > 0, b2 * vf + (1.0 - b2) * g_ * g_, vf)
        w2 = wf - lr * (m2 / b1c) / (jnp.sqrt(v2 / b2c) + eps)
        w2 = jnp.where(mask > 0, sround(w2, w.dtype, idx, seed), w_)
        return w2, m2.astype(m.dtype), v2.astype(v.dtype)

    if not is_flat:
        mask = (uids < n_rows).astype(jnp.float32)[:, None]
        gid = jnp.minimum(uids, n_rows - 1)
        nw, nm, nv = adam(w[gid], m[gid], v[gid], gsum, mask,
                          _row_flat_index(gid, d))
        return (w.at[uids].set(nw, mode="drop"),
                m.at[uids].set(nm, mode="drop"),
                v.at[uids].set(nv, mode="drop"))

    if 128 % d != 0:
        # unsupported packing ratio: pay the relayout, keep correctness
        w2, m2, v2 = _lazy_sparse_adam(
            w.reshape(n_rows, d), m.reshape(n_rows, d), v.reshape(n_rows, d),
            uids, gsum, t, lr, b1, b2, eps, weight_decay, l2,
            sr_seed=sr_seed)
        return tuple(a.reshape(w.shape) for a in (w2, m2, v2))

    R = 128 // d
    n_flat = w.shape[0]
    K = uids.shape[0]
    # lane placement: P[r] scatters a D-vector into lanes [r*D, (r+1)*D)
    P = jnp.zeros((R, d, 128), jnp.float32)
    P = P.at[jnp.arange(R)[:, None], jnp.arange(d)[None, :],
             (jnp.arange(R)[:, None] * d + jnp.arange(d)[None, :])].set(1.0)
    off = jnp.minimum(uids, n_rows - 1) % R
    g128 = jnp.einsum("kd,kdl->kl", gsum, P[off])          # [K, 128]
    lane = jnp.where((uids < n_rows)[:, None],
                     P[off].sum(axis=1), 0.0)              # [K, 128] owned
    # second-level dedup: distinct table rows can share a flat row
    fid = jnp.where(uids < n_rows, uids // R, n_flat).astype(jnp.int32)
    order = jnp.argsort(fid)
    sfid = fid[order]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), sfid[1:] != sfid[:-1]])
    seg = jnp.cumsum(new_seg) - 1
    gseg = jax.ops.segment_sum(g128[order], seg, num_segments=K,
                               indices_are_sorted=True)
    lseg = jax.ops.segment_sum(lane[order], seg, num_segments=K,
                               indices_are_sorted=True)   # 0/1: rows unique
    ufid = jnp.full((K,), n_flat, jnp.int32).at[seg].set(
        sfid, indices_are_sorted=True)
    gid = jnp.minimum(ufid, n_flat - 1)
    # storage element index of each (flat row, lane) — keys the SR stream
    fidx = (gid.astype(jnp.uint32)[:, None] * jnp.uint32(128)
            + jnp.arange(128, dtype=jnp.uint32)[None, :])
    nw, nm, nv = adam(w[gid], m[gid], v[gid], gseg, lseg, fidx)
    return (w.at[ufid].set(nw, mode="drop"),
            m.at[ufid].set(nm, mode="drop"),
            v.at[ufid].set(nv, mode="drop"))


def _row_flat_index(row_ids: jnp.ndarray, d: int) -> jnp.ndarray:
    """[K, d] uint32 storage-element indices of the given table rows,
    matching ops/rounding.flat_index_grid (and therefore the Pallas
    kernel's in-kernel index map) — the key to bitwise-identical
    stochastic rounding across the kernel and XLA paths."""
    import numpy as np

    r = row_ids.astype(jnp.uint32)[:, None]
    c = jnp.arange(d, dtype=jnp.uint32)[None, :]
    if 128 % d == 0:
        rpf = np.uint32(128 // d)
        return (r // rpf) * np.uint32(128) + (r % rpf) * np.uint32(d) + c
    return r * np.uint32(d) + c


def _xla_sparse_adam(w, m, v, uids, gsum, t, lr, b1=0.9, b2=0.99, eps=1e-8,
                     weight_decay=1e-8, l2=0.0, sr_seed=None):
    """Exact pure-XLA two-phase update (scatter-based; ground truth and
    CPU/overflow fallback). A bf16-stored table (config.table_dtype)
    computes in f32 and writes back with stochastic rounding keyed
    exactly like the Pallas kernel (same (element index, seed) hash ->
    bitwise-identical results, ops/rounding.py)."""
    from aread_tpu.ops.rounding import flat_index_grid, sround

    n_rows, d = w.shape
    decay = weight_decay + 2.0 * l2
    tf = t.astype(jnp.float32)
    b1c = 1.0 - jnp.asarray(b1, jnp.float32) ** tf
    b2c = 1.0 - jnp.asarray(b2, jnp.float32) ** tf
    seed = (t if sr_seed is None else sr_seed).astype(jnp.int32)

    def adam(w_, m_, v_, g_):
        wf = w_.astype(jnp.float32)  # no-op for f32 storage
        g_ = g_ + decay * wf
        # f32 compute regardless of moment storage dtype (no-op for f32)
        m2 = b1 * m_.astype(jnp.float32) + (1.0 - b1) * g_
        v2 = b2 * v_.astype(jnp.float32) + (1.0 - b2) * g_ * g_
        w2 = wf - lr * (m2 / b1c) / (jnp.sqrt(v2 / b2c) + eps)
        return w2, m2.astype(m.dtype), v2.astype(v.dtype)

    # phase B inputs from the PRE-step state (gather before the dense pass
    # so XLA cannot alias it away; sentinel rows clip to row n_rows-1 and
    # are dropped at scatter time)
    gid = jnp.minimum(uids, n_rows - 1)
    ow, om, ov = w[gid], m[gid], v[gid]
    nw, nm, nv = adam(ow, om, ov, gsum)
    nw = sround(nw, w.dtype, _row_flat_index(gid, d), seed)

    # phase A: decay-only dense pass (one fused elementwise chain)
    w2, m2, v2 = adam(w, m, v, jnp.zeros_like(w, jnp.float32))
    w2 = sround(w2, w.dtype, flat_index_grid(n_rows, d), seed)

    # phase B: overwrite touched rows with their exact full-gradient update
    w2 = w2.at[uids].set(nw, mode="drop")
    m2 = m2.at[uids].set(nm, mode="drop")
    v2 = v2.at[uids].set(nv, mode="drop")
    return w2, m2, v2
