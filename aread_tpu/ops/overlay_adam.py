"""Overlay fast-adapt: HEMP candidate chains at a cost INDEPENDENT of
table size.

The reference's candidate fast-adaptation (run.py:632-657) builds a fresh
``torch.optim.Adam(model.parameters(), lr=update_lr, weight_decay=wd)``
and runs ``regroup_update_step`` dense steps — so EVERY embedding row
moves every step: rows in the batch get data gradients, and every other
row gets the decay gradient g = (wd + 2*l2)*w, which Adam's sign
normalization turns into a near-full-magnitude ~lr*sign(w) step (fresh
moments make |m|/sqrt(v) ~ 1 even for tiny g). Our exact replication of
that (train/hemp._fast_adapt_impl with the full sparse-Adam sweep) pays a
full-table optimizer sweep per candidate step: at Amazon scale a
production regroup = 250 candidates x 5 steps = 1250 sweeps ~ 60% of the
whole evolution's 8 s (BASELINE.md r5 epoch row).

The overlay formulation splits the table EXACTLY into two populations for
the duration of one candidate chain (chains never commit — the snapshot
is restored after probing):

  * the WORKING SET: every flat table row any of the candidate's S adapt
    batches touches (known before the chain starts — the batches are
    staged up front). These rows live in a compact [C, 128] copy that a
    fused elementwise Adam updates each step with dense semantics: data
    gradient when touched, pure decay (momentum included) when not.
    C = S*bs*F row slots (~87k at production shapes) vs 380k flat rows
    for the full Amazon table — and the cost no longer grows with vocab.
  * everything else: NEVER receives a data gradient in this chain, so its
    trajectory is the closed recurrence w_{t} = adam(w_{t-1}, g=decay*w)
    from fresh moments — deterministic in (w0, t). It is applied lazily
    at PROBE lookup time (``drift_rows``: S fused elementwise iterations
    over just the gathered rows). Adapt-step lookups need no drift at
    all: adapt batches are subsets of the working set by construction.

The probe losses' table-L2 term stays exact too: sum(drift(w)^2) over the
full table is the same for every candidate (drift depends only on (w0,
S)), so the trainer computes it ONCE per regroup (``drift_table_l2``) and
each candidate corrects it with its working set's actual values
(``overlay_l2_correction``).

Numerics: the chain computes in f32 (working-set values, moments, drift).
For --table_dtype float32 this matches the full-sweep path to float
round-off (same update expression, ops/pallas/fused_adam.
reference_adam_update). For bf16 tables the full sweep stochastically
rounds w into storage every step while the overlay carries f32 through
the chain — expectation-identical, strictly lower quantization noise;
the committed main table is untouched either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aread_tpu.ops.pallas.fused_adam import reference_adam_update

LANES = 128


def _table_ids(spec, x) -> jnp.ndarray:
    """Logical table rows a batch gathers — delegates to the ONE
    canonical id mapping (trainer.embedding_flat_ids, same offsets+clip
    as the forward path) so the working set can never drift from what
    the model actually gathers. Lazy import: ops must not depend on
    train at module load."""
    from aread_tpu.train.trainer import embedding_flat_ids
    return embedding_flat_ids(spec, x)


def build_working_set(spec, rpf: int, xs) -> jnp.ndarray:
    """Sorted [C] int32 working set (in gather_rows granularity: flat
    lane-packed rows when the table is flat-stored — ``rpf`` = 128/E —
    else logical rows, rpf=1) from the candidate's stacked adapt batches
    ``xs`` [S, bs, F]. Duplicates are KEPT (C = S*bs*F is static for jit;
    duplicate compact rows receive identical gradients and evolve
    identically, and lookups resolve to the first duplicate via
    searchsorted side='left') — removing them would need a second sort
    for nothing."""
    ids = _table_ids(spec, xs.reshape(-1, xs.shape[-1])) // rpf
    return jnp.sort(ids.reshape(-1).astype(jnp.int32))


def overlay_init(table, ws: jnp.ndarray):
    """Compact (w, m, v) for the working set: rows gathered from the flat
    table (f32 compute copies), fresh zero moments."""
    w = jnp.take(table, ws, axis=0).astype(jnp.float32)
    return w, jnp.zeros_like(w), jnp.zeros_like(w)


def compact_grad(ws: jnp.ndarray, uids: jnp.ndarray, gsum: jnp.ndarray,
                 rpf: int) -> jnp.ndarray:
    """Densify the deduped sparse gradient (sorted-unique TABLE ids
    ``uids`` [K] with sentinel padding, summed rows ``gsum`` [K, D]) into
    the working set's compact [C, 128] layout — all GATHER-form
    (searchsorted + take); TPU scatters at these index counts serialize
    (BASELINE.md DMA-issue row). Working-set rows absent from this batch
    get exact zeros (the decay-only case)."""
    K, D = gsum.shape
    if rpf == 1:
        # non-flat storage: one lookup per compact slot. method='sort' is
        # load-bearing on TPU: the default 'scan' binary search measures
        # 50.5 ms at these query counts vs 0.6 ms for the concat-argsort
        # formulation (benchmarks/prof_overlay.py)
        k = jnp.searchsorted(uids, ws, method="sort")
        k = jnp.minimum(k, K - 1)
        hit = (uids[k] == ws)[:, None]
        return jnp.where(hit, gsum[k], 0.0).astype(jnp.float32)
    # Flat storage: the uids belonging to one flat row are CONTIGUOUS in
    # the sorted uids (tid = f*rpf + j), so one searchsorted of [C]
    # queries finds each slot's run start and rpf pad-free [C, 128]
    # gathers from a lane-spread [K, 128] source assemble the block —
    # the earlier per-(slot, lane-group) formulation gathered a
    # lane-PADDED [C, rpf, D] intermediate (TPU pads minor dims to 128
    # lanes, 4x bloat at D=32) and measured 6.1 ms vs ~2.5 here.
    # Summands occupy disjoint lane groups, so the adds are exact.
    # sentinel uids (= n_rows, a multiple of rpf) land in group 0 with
    # all-zero gsum rows — harmless. Pad-free build (tile + lane mask),
    # same trick as pack_meta's gfull: the one-hot outer-product form
    # materializes a [K, rpf, D] intermediate that TPU lane-pads 4x and
    # then pays a relayout on the reshape.
    grp = uids % rpf
    lanes = jnp.arange(rpf * D, dtype=jnp.int32) // D      # lane -> group
    sel = grp[:, None] == lanes[None, :]                   # [K, 128]
    gspread = jnp.where(sel, jnp.tile(gsum, (1, rpf)), 0).astype(gsum.dtype)
    lo = jnp.searchsorted(uids, ws * rpf, method="sort")   # [C]
    cg = jnp.zeros((ws.shape[0], rpf * D), jnp.float32)
    for j in range(rpf):
        kk = jnp.minimum(lo + j, K - 1)
        valid = (uids[kk] // rpf) == ws
        cg = cg + jnp.where(valid[:, None], gspread[kk], 0.0)
    return cg


def overlay_adam_step(wvals, wm, wv, cgrad, t, lr: float, wd: float,
                      l2: float):
    """One dense-semantics Adam step over the compact working set — the
    exact update expression of the full-table path (reference_adam_update
    == the Pallas sweep kernel's math), on [C, 128] f32."""
    return reference_adam_update(wvals, wm, wv, cgrad, t, lr=lr,
                                 weight_decay=wd, l2=l2)


def drift_rows(w0, n_steps: int, lr: float, wd: float, l2: float):
    """The closed decay-only recurrence: ``n_steps`` fresh-Adam steps with
    zero data gradient (g = (wd + 2*l2) * w each step). Exactly what the
    full sweep does to rows outside every adapt batch. Static unroll —
    n_steps is the (small) regroup_update_step."""
    w = w0.astype(jnp.float32)
    m = jnp.zeros_like(w)
    v = jnp.zeros_like(w)
    for i in range(1, n_steps + 1):
        w, m, v = reference_adam_update(
            w, m, v, jnp.zeros_like(w), jnp.asarray(i, jnp.int32),
            lr=lr, weight_decay=wd, l2=l2)
    return w


def overlay_gather(table, row_ids, *, ws, wvals, drift_steps: int,
                   lr: float, wd: float, l2: float):
    """The FeaturesEmbedding lookup override for overlay chains:
    working-set rows read the compact chain values; all others read the
    base table advanced by ``drift_steps`` decay-only Adam steps
    (0 during adapt steps — their batches are subsets of the working
    set by construction, so the fallback never fires there)."""
    rid = row_ids.astype(jnp.int32)
    # 'sort' method: 4x faster than the default binary search on TPU at
    # these query counts (prof_overlay.py)
    pos = jnp.searchsorted(ws, rid, method="sort")
    pos = jnp.minimum(pos, ws.shape[0] - 1)
    hit = ws[pos] == rid
    over = jnp.take(wvals, pos, axis=0)
    base = jnp.take(table, rid, axis=0).astype(jnp.float32)
    if drift_steps > 0:
        base = drift_rows(base, drift_steps, lr, wd, l2)
    return jnp.where(hit[..., None], over, base)


def drift_table_l2(table, n_steps: int, lr: float, wd: float, l2: float):
    """sum(drift(w)^2) over the WHOLE flat table — candidate-independent
    (drift is a function of (w0, n_steps) only), so the trainer computes
    it once per regroup and shares it across all candidates' probe
    losses. One fused full-table pass — an earlier chunked fori_loop
    variant (meant to bound the f32 upcast's footprint) measured 1.9 s
    at Amazon scale because the loop body defeated XLA's elementwise
    fusion; the straight-line version is bandwidth-bound and the f32
    temporary (195 MB at Amazon scale) is well within HBM."""
    d = drift_rows(table.astype(jnp.float32), n_steps, lr, wd, l2)
    return jnp.sum(jnp.square(d))


def overlay_l2_correction(table, ws, wvals, drift_steps: int, lr: float,
                          wd: float, l2: float):
    """Adjust the shared whole-table drift L2 to this candidate's actual
    post-chain table: subtract the working-set rows' drifted squares, add
    their compact chain values' squares. First-occurrence masked —
    duplicate working-set slots describe the same physical row once."""
    first = jnp.concatenate(
        [jnp.ones((1,), bool), ws[1:] != ws[:-1]]).astype(jnp.float32)
    base = jnp.take(table, ws, axis=0).astype(jnp.float32)
    drifted = drift_rows(base, drift_steps, lr, wd, l2)
    sub = jnp.sum(jnp.sum(jnp.square(drifted), axis=1) * first)
    add = jnp.sum(jnp.sum(jnp.square(wvals), axis=1) * first)
    return add - sub
