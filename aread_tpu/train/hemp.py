"""AREAD training: warm-up, HEMP mask evolution, bagging steps, and the
per-domain masked evaluation (reference Run.train_aread run.py:578-686 and
Run.test's AREAD branch run.py:718-727).

Host/device split (the reference mutates module state mid-step; here):
  * mask GENERATION and SELECTION are numpy on host (aread_tpu.utils.
    masks) — masks are tiny; mask PRUNING during fast adaptation runs on
    device (utils.masks.prune_mask_jax, bit-identical to the host
    worklist) so a whole HEMP regroup (domains x candidates: fresh fast
    Adam from the snapshot + update steps with progressive pruning + eval
    probes) executes as ONE device dispatch (fast_adapt_many);
  * regular training runs as scan-chunked bagging steps. Masks are
    runtime bool arrays with static shapes, so mask evolution never
    recompiles (except when int(candidate_mask_num) decays to a new
    value, which changes the lax.map width);
  * parameter snapshot/restore around candidate fast-adaptation is a
    device-resident pytree copy (reference save_model_state/
    load_model_state, aread.py:534-546). Deviation (bug fix): the
    reference's regex snapshot omits the MMoE experts/gates (aread.py:535
    lists only the PLE 'cgc_layers'), silently leaking each candidate's
    fast-adapt updates into the shared extractor; we snapshot the full
    (params, state).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aread_tpu.config import Config
from aread_tpu.data.loader import DomainBatcher, SplitData
from aread_tpu.models.aread import AREAD
from aread_tpu.models.base import regularization_loss
from aread_tpu.train import metrics as metrics_lib
from aread_tpu.train.trainer import (bce_with_logits, embedding_flat_ids,
                                      hybrid_init, hybrid_update,
                                      hybrid_update_sparse, make_optimizer,
                                      masked_mean, merge_table,
                                      perturbation_zeros, split_table,
                                      split_variables, strip_table_rule,
                                      table_reg_value)
from aread_tpu.utils import profiling
from aread_tpu.utils.masks import HempMaskState, mask_shapes


def _to_device_mask(mask) -> Tuple:
    return tuple(jnp.asarray(m) for m in mask)


def gather_batch(dxc, dyc, idx):
    """Materialize a batch on device from the HBM-resident split by row
    ids (``idx`` [bs] int32, -1 = padding). Identical to the host
    pad_batch semantics (loader.py): pad rows replicate the batch's first
    row (always valid — padding is a suffix), y zeros, valid mask."""
    valid = (idx >= 0).astype(jnp.float32)
    gidx = jnp.where(idx < 0, idx[0], idx)
    return {"x": dxc[gidx],
            "y": dyc[gidx].astype(jnp.float32) * valid,
            "valid": valid}


class AREADTrainer:
    def __init__(self, model: AREAD, config: Config, n_domain: int, mesh=None):
        self.model = model
        self.config = config
        self.n_domain = n_domain
        # Optional Mesh('data','model'): table row-sharded, batches
        # data-sharded; the jitted steps run SPMD via GSPMD propagation.
        self.mesh = mesh
        self.mask_state = HempMaskState(model.n_tower, n_domain, seed=config.seed)
        self.optimizer = make_optimizer(config.lr, config.wd)
        self.fast_optimizer = make_optimizer(config.update_lr, config.wd)
        # HEMP schedule state (reference run.py:82-84)
        self.random_modify_sigma = config.random_modify_sigma
        self.init_active_percent = config.init_active_percent
        self.candidate_mask_num = float(config.candidate_mask_num)
        self.regroup_times = 0
        # early stopping
        self.trial_counter = 0
        self.best_auc, self.best_mean_auc = 0.0, 0.0
        self.best_checkpoint = None
        self._improved = False
        self._fns = None
        self._fits_x = None
        self._fits_idx = None
        self._device_data = None  # (dxc, dyc, aug_offset) HBM split
        self.step_timer = profiling.StepTimer()
        # fail fast on hemp_fast_adapt misconfiguration (unknown value,
        # 'overlay' on a mesh / without sparse grads) — the first use is
        # otherwise the first regroup, a whole warm-up epoch in
        self.overlay_enabled()

    # hemp_fast_adapt='auto' crossover, in TABLE ELEMENTS (n_rows * E).
    # Measured END TO END on the v5e (benchmarks/bench_evolution.py, r5:
    # one warm production-cadence regroup, 225 chains of 5 adapt + 5
    # probe steps): full-sweep evolution scales linearly with the table —
    # 4.1 s at Amazon vocab (48.6M elements), 8.4 s at 4x, 14.3 s at 8x —
    # while the overlay evolution is FLAT at ~9.8 s (its per-batch
    # constant: compact_grad 1.44 ms + compact Adam 0.74 + overlay
    # lookups ~0.6/call, benchmarks/prof_overlay.py). Linear
    # interpolation puts the crossover at ~240M elements (~5x Amazon);
    # overlay also compiles 2-4x faster there (34 s vs 72-145 s).
    OVERLAY_AUTO_MIN_ELEMS = 240_000_000

    def overlay_enabled(self) -> bool:
        """Resolve config.hemp_fast_adapt for this run (see config.py):
        overlay chains need the sparse perturb-tap gradients and run the
        compact sweep on one device; mesh evolutions keep the sharded
        full sweep. 'auto' additionally requires the table to be PAST the
        measured overlay/full crossover (OVERLAY_AUTO_MIN_ELEMS) — below
        it the streamed bf16 sweep is cheaper than the compact path's
        per-batch constant."""
        mode = self.config.hemp_fast_adapt
        if mode == "full":
            return False
        if mode == "overlay":
            if self.mesh is not None:
                raise ValueError(
                    "hemp_fast_adapt='overlay' is single-device only "
                    "(mesh evolutions use the sharded full sweep); use "
                    "'auto' or 'full' on mesh runs")
            if not self.config.sparse_table_grad:
                raise ValueError(
                    "hemp_fast_adapt='overlay' requires sparse_table_grad")
            return True
        if mode != "auto":
            raise ValueError(f"hemp_fast_adapt={mode!r}")
        spec = self.model.spec
        elems = int(np.sum(spec.one_hot_dims)) * self.model.embed_dim
        return (self.mesh is None and self.config.sparse_table_grad
                and elems >= self.OVERLAY_AUTO_MIN_ELEMS)

    # ------------------------------------------------------------- jitted
    def _build_fns(self):
        model = self.model
        # table L2 gradient folds into the fused Adam pass (hybrid_update);
        # its value is reported via table_reg_value (trainer.py)
        reg_rules = strip_table_rule(type(model).REG_RULES)
        main_opt, fast_opt = self.optimizer, self.fast_optimizer
        cfg = self.config

        spec, embed_dim = model.spec, model.embed_dim
        sparse = cfg.sparse_table_grad

        # config.embed_lookup routing (gspmd | a2a) — the SAME context the
        # generic Trainer applies (trainer.embed_lookup_ctx). Every
        # model.apply below goes through apply_model so AREAD's warm-up /
        # bagging / HEMP fast-adapt / eval paths all honor the knob (it was
        # silently ignored for --model aread before).
        from aread_tpu.train.trainer import embed_lookup_ctx
        _lookup_ctx = embed_lookup_ctx(cfg, self.mesh)

        def apply_model(variables, *args, **kwargs):
            with _lookup_ctx():
                return model.apply(variables, *args, **kwargs)

        def bagging_loss(p, pert, state, batch, dm, rng, mode):
            variables = {"params": p, **state}
            if pert is not None:
                variables["perturbations"] = pert
            out, new_state = apply_model(
                variables, batch["x"], domain_mask=dm, mode=mode,
                train=True, mask=batch["valid"], mutable=list(state.keys()),
                rngs={"dropout": rng})
            if mode in ("wo_mask", "domain_mask_final"):
                # warm-up trains on the mean-prob prediction (aread.py:186,
                # run.py:597-599); the final-gate phase on the gate-mixed
                # prob (run.py:701-703). BCE on prob via its logit transform
                prob = jnp.clip(out["prob"], 1e-7, 1 - 1e-7)
                bce = masked_mean(-(batch["y"] * jnp.log(prob)
                                    + (1 - batch["y"]) * jnp.log1p(-prob)),
                                  batch["valid"])
            else:
                # bagging: mean of per-leaf BCE over active leaves
                # (run.py:674-677)
                per_leaf = jax.vmap(
                    lambda lg: masked_mean(bce_with_logits(lg, batch["y"]), batch["valid"]),
                    in_axes=1)(out["leaf_logit"])  # [T_last]
                la = out["leaf_active"].astype(per_leaf.dtype)
                bce = jnp.sum(per_leaf * la) / jnp.maximum(la.sum(), 1e-8)
            loss = bce + regularization_loss(p, reg_rules)
            return loss, (new_state, out["gate_means"])

        def step_core(opt, opt_lr, mode, params, state, opt_state, batch,
                      dm, rng, no_overflow=False):
            from aread_tpu.train.trainer import matmul_precision_ctx
            with matmul_precision_ctx(cfg.compute_dtype):
                return _step_body(opt, opt_lr, mode, params, state, opt_state,
                                  batch, dm, rng, no_overflow)

        def _step_body(opt, opt_lr, mode, params, state, opt_state, batch,
                       dm, rng, no_overflow):
            if sparse:
                # grads w.r.t. gathered rows (perturb tap) + 2-phase sparse
                # Adam — bit-identical to dense, no [n_rows, E] cotangent
                table, rest = split_table(params)

                def lf(rest_p, pert):
                    return bagging_loss(merge_table(rest_p, table), pert,
                                        state, batch, dm, rng, mode)

                pert0 = perturbation_zeros(spec, batch["x"], embed_dim)
                (loss, (new_state, gms)), (g_rest, g_pert) = jax.value_and_grad(
                    lf, argnums=(0, 1), has_aux=True)(rest, pert0)
                ids = embedding_flat_ids(spec, batch["x"])
                out = hybrid_update_sparse(
                    opt, opt_lr, cfg.wd, params, g_rest, ids,
                    g_pert["embedding"]["rows"], opt_state,
                    table_shape=(int(np.sum(spec.one_hot_dims)), embed_dim),
                    mesh=self.mesh,
                    lazy=cfg.table_optimizer == "lazy_adam",
                    assume_no_overflow=no_overflow,
                    want_table_l2=cfg.loss_report_table_l2,
                    clip_norm=cfg.grad_clip_norm)
                if cfg.loss_report_table_l2:
                    # reported loss includes the table L2 value (reference
                    # run.py:505), accumulated free inside the kernel sweep
                    new_params, new_opt_state, l2val = out
                    loss = loss + l2val
                else:
                    new_params, new_opt_state = out
                return new_params, dict(new_state), new_opt_state, loss, gms
            (loss, (new_state, gms)), grads = jax.value_and_grad(
                bagging_loss, has_aux=True)(params, None, state, batch, dm, rng, mode)
            if cfg.loss_report_table_l2:
                loss = loss + table_reg_value(params["embedding"]["table"])
            new_params, new_opt_state = hybrid_update(
                opt, opt_lr, cfg.wd, params, grads, opt_state,
                clip_norm=cfg.grad_clip_norm)
            return new_params, dict(new_state), new_opt_state, loss, gms

        def make_step(opt, opt_lr, mode):
            def step(params, state, opt_state, batch, dm, rng,
                     no_overflow=False):
                return step_core(opt, opt_lr, mode, params, state, opt_state,
                                 batch, dm, rng, no_overflow)
            return jax.jit(step, donate_argnums=(0, 1, 2),
                           static_argnums=(6,))

        def make_scan(opt, opt_lr, mode):
            """SCAN_CHUNK steps in one device dispatch — a python step
            loop pays ~8-30 ms host dispatch per step on this image's
            tunneled TPU. ``batches``/``dms`` carry a leading [S] axis;
            per-step gate means come back stacked for host recording."""
            def scan_fn(params, state, opt_state, batches, dms, rng,
                        no_overflow=False):
                def body(carry, inp):
                    params, state, opt_state, rng = carry
                    batch, dm = inp
                    rng, srng = jax.random.split(rng)
                    params, state, opt_state, loss, gms = step_core(
                        opt, opt_lr, mode, params, state, opt_state, batch,
                        dm, srng, no_overflow)
                    return (params, state, opt_state, rng), (loss, gms)

                (params, state, opt_state, rng), (losses, gms) = jax.lax.scan(
                    body, (params, state, opt_state, rng), (batches, dms))
                return params, state, opt_state, rng, losses, gms
            return jax.jit(scan_fn, donate_argnums=(0, 1, 2),
                           static_argnums=(6,))

        def make_scan_idx(opt, opt_lr, mode):
            """make_scan over the HBM-resident split (config.device_data):
            each step gathers its batch from ``dxc``/``dyc`` by row ids —
            only the [S, bs] int32 indices cross the tunnel per chunk."""
            def scan_fn(params, state, opt_state, dxc, dyc, idxs, dms, rng,
                        no_overflow=False):
                def body(carry, inp):
                    params, state, opt_state, rng = carry
                    idx, dm = inp
                    rng, srng = jax.random.split(rng)
                    params, state, opt_state, loss, gms = step_core(
                        opt, opt_lr, mode, params, state, opt_state,
                        gather_batch(dxc, dyc, idx), dm, srng, no_overflow)
                    return (params, state, opt_state, rng), (loss, gms)

                (params, state, opt_state, rng), (losses, gms) = jax.lax.scan(
                    body, (params, state, opt_state, rng), (idxs, dms))
                return params, state, opt_state, rng, losses, gms
            return jax.jit(scan_fn, donate_argnums=(0, 1, 2),
                           static_argnums=(8,))

        def make_step_idx(opt, opt_lr, mode):
            def step(params, state, opt_state, dxc, dyc, idx, dm, rng,
                     no_overflow=False):
                return step_core(opt, opt_lr, mode, params, state, opt_state,
                                 gather_batch(dxc, dyc, idx), dm, rng,
                                 no_overflow)
            return jax.jit(step, donate_argnums=(0, 1, 2),
                           static_argnums=(8,))

        def _fast_adapt_impl(materialize, params0, state0, mask0, fa_items,
                             probe_items, rng, extra, no_overflow):
            """ONE dispatch for a whole HEMP candidate (run.py:632-657):
            fresh fast-Adam init, regroup_update_step bagging steps with
            ON-DEVICE progressive pruning after each (utils.masks.
            prune_mask_jax — bit-identical to the host prun_single_mask),
            then all regroup_eval_step no-grad probes. The previous
            host-driven loop paid, per candidate, a parameter-tree restore,
            two table-sized zeros inits, a dispatch per fast step and a
            30-70 ms tunnel fetch per gate record; this replaces ~8 host
            round trips with one. ``params0/state0`` are the snapshot and
            are NOT donated — every candidate restarts from them.
            ``materialize(extra, item) -> batch`` abstracts the feed: host
            batch stacks pass through; the device-resident path gathers
            rows from the HBM split by index (gather_batch)."""
            opt_state = hybrid_init(fast_opt, params0,
                                    moments_dtype=cfg.table_moments_dtype)

            def body(carry, item):
                params, state, opt_state, mask, rng = carry
                rng, srng = jax.random.split(rng)
                params, state, opt_state, _, gms = step_core(
                    fast_opt, cfg.update_lr, "domain_mask_bagging", params,
                    state, opt_state, materialize(extra, item), mask, srng,
                    no_overflow)
                from aread_tpu.utils.masks import prune_mask_jax
                mask = prune_mask_jax(mask, gms, prun_ratio=0.05)
                return (params, state, opt_state, mask, rng), 0.0

            (params, state, _, mask, _), _ = jax.lax.scan(
                body, (params0, state0, opt_state, mask0, rng), fa_items)

            def probe(item):
                batch = materialize(extra, item)
                # same compute_dtype context the adapt steps (step_core)
                # and the overlay engine's probes run under — keeps both
                # engines' candidate scoring consistent at bf16 compute
                from aread_tpu.train.trainer import matmul_precision_ctx
                with matmul_precision_ctx(cfg.compute_dtype):
                    out = apply_model({"params": params, **state},
                                      batch["x"], domain_mask=mask,
                                      mode="domain_with_mask", train=False)
                prob = jnp.clip(out["prob"], 1e-7, 1 - 1e-7)
                return masked_mean(-(batch["y"] * jnp.log(prob)
                                     + (1 - batch["y"]) * jnp.log1p(-prob)),
                                   batch["valid"])

            # reg terms are constant across the probes (params fixed after
            # the adapt scan) — hoisted out of the map: the table term is a
            # full-table pass, paid once instead of once per probe
            reg = regularization_loss(params, reg_rules) \
                + table_reg_value(params["embedding"]["table"])
            return mask, jax.lax.map(probe, probe_items) + reg

        _passthrough = lambda extra, batch: batch
        _gather = lambda extra, idx: gather_batch(extra[0], extra[1], idx)

        def fast_adapt_many(params0, state0, masks0, fa_batches,
                            probe_batches, rngs, no_overflow=False):
            """ALL of a regroup's candidates (domains x candidate_mask_num)
            in ONE device dispatch: lax.map of the single-candidate chain
            over stacked masks/batches/keys. Each map iteration restarts
            from the (non-donated) snapshot, so candidates stay
            independent exactly as the reference's per-candidate
            load_model_state (aread.py:534-546, run.py:632-661). Turns
            ~(domains x candidates) tunnel round trips (~50-80 ms each on
            this image) into one."""
            def one(inp):
                mask0, fa, probe, rng = inp
                return _fast_adapt_impl(_passthrough, params0, state0,
                                        mask0, fa, probe, rng, (),
                                        no_overflow)
            return jax.lax.map(one, (masks0, fa_batches, probe_batches,
                                     rngs))

        def fast_adapt_many_idx(params0, state0, masks0, dxc, dyc, fa_idxs,
                                probe_idxs, rngs, no_overflow=False):
            """fast_adapt_many over the HBM-resident split: candidates'
            fast-adapt/probe batches arrive as [N, S, bs] row-id stacks
            and gather on device — only indices cross the tunnel."""
            def one(inp):
                mask0, fa, probe, rng = inp
                return _fast_adapt_impl(_gather, params0, state0, mask0,
                                        fa, probe, rng, (dxc, dyc),
                                        no_overflow)
            return jax.lax.map(one, (masks0, fa_idxs, probe_idxs, rngs))

        def _fast_adapt_overlay(materialize, params0, state0, mask0,
                                fa_items, probe_items, rng, extra,
                                drift_l2):
            """Overlay variant of _fast_adapt_impl (config.hemp_fast_adapt;
            ops/overlay_adam module doc): the candidate chain runs its
            table updates on a compact [C, 128] working-set copy (the
            union of its adapt batches' rows — known up front) instead of
            sweeping the full table each step, and probe lookups replay
            the decay-only drift recurrence for rows outside the set.
            Dense-Adam semantics preserved exactly (the reference's fresh
            torch Adam over all parameters, run.py:632-657); evolution
            cost becomes independent of vocab size. ``drift_l2`` is the
            candidate-independent whole-table sum(drift(w)^2), computed
            once per regroup by ``drift_l2_fn``."""
            from functools import partial as _p

            from aread_tpu.ops import overlay_adam as oa
            from aread_tpu.ops.embedding import lookup_override
            from aread_tpu.ops.sparse_adam import dedup_rows
            from aread_tpu.train.trainer import (TABLE_L2,
                                                 clip_scale_by_global_norm,
                                                 matmul_precision_ctx)
            from aread_tpu.utils.masks import prune_mask_jax

            table0, rest0 = split_table(params0)
            n_rows = int(np.sum(spec.one_hot_dims))
            rpf = (128 // embed_dim) if spec.flat_table else 1
            S = jax.tree_util.tree_leaves(fa_items)[0].shape[0]
            # materialize all S adapt batches ONCE: the working set needs
            # their x up front, and the scan then consumes the same
            # arrays instead of re-gathering from the HBM split
            fa_batches = jax.vmap(lambda it: materialize(extra, it))(
                fa_items)
            ws = oa.build_working_set(spec, rpf, fa_batches["x"])
            wvals0, wm0, wv0 = oa.overlay_init(table0, ws)
            hyper = dict(lr=cfg.update_lr, wd=cfg.wd, l2=TABLE_L2)

            def body(carry, batch):
                rest, wvals, wm, wv, inner, t, state, mask, rng = carry
                rng, srng = jax.random.split(rng)

                def lf(rest_p, pert):
                    with lookup_override(_p(oa.overlay_gather, ws=ws,
                                            wvals=wvals, drift_steps=0,
                                            **hyper)):
                        return bagging_loss(merge_table(rest_p, table0),
                                            pert, state, batch, mask, srng,
                                            "domain_mask_bagging")

                with matmul_precision_ctx(cfg.compute_dtype):
                    pert0 = perturbation_zeros(spec, batch["x"], embed_dim)
                    (_, (new_state, gms)), (g_rest, g_pert) = \
                        jax.value_and_grad(lf, argnums=(0, 1),
                                           has_aux=True)(rest, pert0)
                tids = embedding_flat_ids(spec, batch["x"]).reshape(-1)
                rows = g_pert["embedding"]["rows"].reshape(-1, embed_dim)
                uids, gsum = dedup_rows(tids.astype(jnp.int32), rows, n_rows)
                if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
                    scale = clip_scale_by_global_norm(
                        [g_rest, gsum], cfg.grad_clip_norm)
                    g_rest = jax.tree_util.tree_map(
                        lambda g: g * scale, g_rest)
                    gsum = gsum * scale
                # uids are TABLE rows; compact_grad folds rpf lane groups
                # per flat row (a no-op split at rpf=1)
                cg = oa.compact_grad(ws, uids, gsum, rpf)
                t = t + 1
                wvals, wm, wv = oa.overlay_adam_step(wvals, wm, wv, cg, t,
                                                     **hyper)
                updates, inner = fast_opt.update(g_rest, inner, rest)
                rest = optax.apply_updates(rest, updates)
                mask = prune_mask_jax(mask, gms, prun_ratio=0.05)
                return (rest, wvals, wm, wv, inner, t, dict(new_state),
                        mask, rng), 0.0

            carry0 = (rest0, wvals0, wm0, wv0, fast_opt.init(rest0),
                      jnp.zeros((), jnp.int32), state0, mask0, rng)
            (rest, wvals, _, _, _, _, state, mask, _), _ = jax.lax.scan(
                body, carry0, fa_batches)

            def probe(item):
                batch = materialize(extra, item)
                with matmul_precision_ctx(cfg.compute_dtype):
                    with lookup_override(_p(oa.overlay_gather, ws=ws,
                                            wvals=wvals, drift_steps=S,
                                            **hyper)):
                        out = apply_model(
                            {"params": merge_table(rest, table0), **state},
                            batch["x"], domain_mask=mask,
                            mode="domain_with_mask", train=False)
                prob = jnp.clip(out["prob"], 1e-7, 1 - 1e-7)
                return masked_mean(-(batch["y"] * jnp.log(prob)
                                     + (1 - batch["y"]) * jnp.log1p(-prob)),
                                   batch["valid"])

            # probe reg, exact: rest reg on the adapted params + TABLE_L2 *
            # (whole-table drifted sum, corrected to this candidate's
            # working-set values) — matches _fast_adapt_impl's hoisting
            reg = regularization_loss(merge_table(rest, table0), reg_rules) \
                + TABLE_L2 * (drift_l2 + oa.overlay_l2_correction(
                    table0, ws, wvals, S, **hyper))
            return mask, jax.lax.map(probe, probe_items) + reg

        def fast_adapt_many_ov(params0, state0, masks0, fa_batches,
                               probe_batches, rngs, drift_l2):
            def one(inp):
                mask0, fa, probe, rng = inp
                return _fast_adapt_overlay(_passthrough, params0, state0,
                                           mask0, fa, probe, rng, (),
                                           drift_l2)
            return jax.lax.map(one, (masks0, fa_batches, probe_batches,
                                     rngs))

        def fast_adapt_many_idx_ov(params0, state0, masks0, dxc, dyc,
                                   fa_idxs, probe_idxs, rngs, drift_l2):
            def one(inp):
                mask0, fa, probe, rng = inp
                return _fast_adapt_overlay(_gather, params0, state0, mask0,
                                           fa, probe, rng, (dxc, dyc),
                                           drift_l2)
            return jax.lax.map(one, (masks0, fa_idxs, probe_idxs, rngs))

        def drift_l2_fn(table):
            """Once per regroup: sum(drift(w)^2) over the whole table —
            shared by every candidate's probe-loss L2 term."""
            from aread_tpu.ops import overlay_adam as oa
            from aread_tpu.train.trainer import TABLE_L2
            return oa.drift_table_l2(table, cfg.regroup_update_step,
                                     cfg.update_lr, cfg.wd, TABLE_L2)

        @jax.jit
        def eval_loss_multi(params, state, batches, dm):
            """The regroup_eval_step no-grad probes in ONE dispatch:
            ``batches`` carries a leading [S] axis; returns [S] losses
            (run.py:651-657 runs them as separate no-grad steps — the
            model is not mutated, so stacking is exact)."""
            def one(batch):
                out = apply_model({"params": params, **state}, batch["x"],
                                  domain_mask=dm, mode="domain_with_mask",
                                  train=False)
                prob = jnp.clip(out["prob"], 1e-7, 1 - 1e-7)
                return masked_mean(-(batch["y"] * jnp.log(prob)
                                     + (1 - batch["y"]) * jnp.log1p(-prob)),
                                   batch["valid"])
            # reg terms constant across the stacked probes — one table pass
            reg = regularization_loss(params, reg_rules) \
                + table_reg_value(params["embedding"]["table"])
            return jax.lax.map(one, batches) + reg

        @jax.jit
        def eval_loss_step(params, state, batch, dm):
            """No-grad eval probe: BCE on mean-over-active-leaves prob + reg
            (run.py:651-657, mode='domain_with_mask')."""
            out = apply_model({"params": params, **state}, batch["x"],
                              domain_mask=dm, mode="domain_with_mask", train=False)
            prob = jnp.clip(out["prob"], 1e-7, 1 - 1e-7)
            bce = masked_mean(-(batch["y"] * jnp.log(prob)
                                + (1 - batch["y"]) * jnp.log1p(-prob)), batch["valid"])
            return bce + regularization_loss(params, reg_rules) \
                + table_reg_value(params["embedding"]["table"])

        @jax.jit
        def eval_prob_step(params, state, batch, dm):
            out = apply_model({"params": params, **state}, batch["x"],
                              domain_mask=dm, mode="domain_with_mask", train=False)
            return out["prob"]

        @jax.jit
        def eval_prob_final_step(params, state, batch, dm):
            """Prediction through the trained final gate (reference
            test(aread_final=True), run.py:714-727 with mode
            'domain_mask_final')."""
            out = apply_model({"params": params, **state}, batch["x"],
                              domain_mask=dm, mode="domain_mask_final",
                              train=False)
            return out["prob"]

        final_opt = make_optimizer(cfg.final_lr, cfg.wd)

        # Final-gate phase steps: ONLY the final_gate leaf updates. The
        # body is frozen in the LOSS (stop_gradient inside the model's
        # 'domain_mask_final' mode) AND must be frozen in the OPTIMIZER:
        # torch.optim.Adam skips parameters whose .grad is None, so the
        # reference's no-grad body never moves — whereas a dense-Adam
        # update over the full tree would walk every frozen weight toward
        # zero at ~final_lr per step (zero data grad + the tiny decay
        # term normalizes to a full-lr signed step), collapsing the body
        # within one final epoch. Found by the r5 2M-row --aread_final
        # run: final-phase valid mean_auc pinned at exactly 0.5
        # (per-domain-constant predictions) before this fix.
        import optax as _optax

        def final_core(params, state, opt_state, batch, dm, rng):
            from aread_tpu.train.trainer import matmul_precision_ctx
            with matmul_precision_ctx(cfg.compute_dtype):
                fg = params["final_gate"]
                rest = {k: v for k, v in params.items()
                        if k != "final_gate"}

                def lf(fg_p):
                    return bagging_loss(
                        {**rest, "final_gate": fg_p}, None, state, batch,
                        dm, rng, "domain_mask_final")

                (loss, (new_state, gms)), g = jax.value_and_grad(
                    lf, has_aux=True)(fg)
                if cfg.loss_report_table_l2:
                    loss = loss + table_reg_value(
                        params["embedding"]["table"])
                updates, new_opt_state = final_opt.update(g, opt_state, fg)
                new_fg = _optax.apply_updates(fg, updates)
                new_params = dict(params)
                new_params["final_gate"] = new_fg
                return new_params, dict(new_state), new_opt_state, loss, gms

        final_step = jax.jit(final_core, donate_argnums=(0, 1, 2))

        def final_scan_fn(params, state, opt_state, batches, dms, rng):
            def body(carry, inp):
                params, state, opt_state, rng = carry
                batch, dm = inp
                rng, srng = jax.random.split(rng)
                params, state, opt_state, loss, gms = final_core(
                    params, state, opt_state, batch, dm, srng)
                return (params, state, opt_state, rng), (loss, gms)

            (params, state, opt_state, rng), (losses, gms) = jax.lax.scan(
                body, (params, state, opt_state, rng), (batches, dms))
            return params, state, opt_state, rng, losses, gms

        final_scan = jax.jit(final_scan_fn, donate_argnums=(0, 1, 2))

        # streaming eval: per-domain histogram accumulation on device
        self._auc = metrics_lib.StreamingAUC(self.n_domain, cfg.auc_bins)
        acc = self._auc

        def make_accum(eval_mode):
            @jax.jit
            def accum(params, state, batch, dm, d, auc_state):
                out = apply_model({"params": params, **state}, batch["x"],
                                  domain_mask=dm, mode=eval_mode, train=False)
                domains = jnp.full(out["prob"].shape, d, jnp.int32)
                return acc.update(auc_state, out["prob"], batch["y"], domains,
                                  batch["valid"], logits=out["logit"])
            return accum

        self._fns = {
            "fast_adapt_many": jax.jit(fast_adapt_many, static_argnums=(6,)),
            "fast_adapt_many_idx": jax.jit(fast_adapt_many_idx,
                                           static_argnums=(8,)),
            "fast_adapt_many_ov": jax.jit(fast_adapt_many_ov),
            "fast_adapt_many_idx_ov": jax.jit(fast_adapt_many_idx_ov),
            "drift_l2": jax.jit(drift_l2_fn),
            "accum": make_accum("domain_with_mask"),
            "accum_final": make_accum("domain_mask_final"),
            "main_step": make_step(main_opt, cfg.lr, "domain_mask_bagging"),
            "main_scan": make_scan(main_opt, cfg.lr, "domain_mask_bagging"),
            "main_step_idx": make_step_idx(main_opt, cfg.lr,
                                           "domain_mask_bagging"),
            "main_scan_idx": make_scan_idx(main_opt, cfg.lr,
                                           "domain_mask_bagging"),
            "fast_step": make_step(fast_opt, cfg.update_lr, "domain_mask_bagging"),
            "warmup_step": make_step(main_opt, cfg.lr, "wo_mask"),
            "warmup_scan": make_scan(main_opt, cfg.lr, "wo_mask"),
            "warmup_step_idx": make_step_idx(main_opt, cfg.lr, "wo_mask"),
            "warmup_scan_idx": make_scan_idx(main_opt, cfg.lr, "wo_mask"),
            "final_step": final_step,
            "final_scan": final_scan,
            "final_opt": final_opt,
            "eval_loss": eval_loss_step,
            "eval_loss_multi": eval_loss_multi,
            "eval_prob": eval_prob_step,
            "eval_prob_final": eval_prob_final_step,
        }
        return self._fns

    # -------------------------------------------------------------- helpers
    def _fits_from_x(self, x_stacked):
        """Device-side kernel-window precheck from a placed batch stack
        [..., bs, F] (per-step predicate of ops/sparse_adam.
        steps_fit_kernel, evaluated as one batched row-sort)."""
        if self._fits_x is None:
            from aread_tpu.ops.embedding import compute_offsets
            from aread_tpu.ops.sparse_adam import steps_fit_kernel_jax

            spec, d = self.model.spec, self.model.embed_dim
            n_rows = int(np.sum(spec.one_hot_dims))
            offs = jnp.asarray(np.asarray(compute_offsets(
                spec.one_hot_dims, spec.n_seq_fields * spec.seq_maxlen,
                spec.itemid_idx)), jnp.int32)

            @jax.jit
            def fits_x(x):
                ids = jnp.clip(x + offs, 0, n_rows - 1)
                ids = ids.reshape(-1, x.shape[-2] * x.shape[-1])
                return steps_fit_kernel_jax(ids, n_rows, d)

            self._fits_x = fits_x
        return self._fits_x(x_stacked)

    def _fits_from_idx(self, dxc, idxs, per_step: bool = False):
        """Device-side kernel-window precheck from [S, bs] row ids into
        the HBM-resident split (per-step predicate, one batched sort —
        trainer.build_fits_from_rows, shared with the generic trainer).
        ``per_step``: [S] verdict vector instead of one bool, so a whole
        segment's verdicts cost one round trip."""
        if self._fits_idx is None:
            from aread_tpu.train.trainer import build_fits_from_rows
            self._fits_idx = build_fits_from_rows(self.model.spec,
                                                  self.model.embed_dim)
        return self._fits_idx(dxc, idxs, per_step=per_step)

    def device_data_enabled(self, train_x: np.ndarray,
                            aug_x: np.ndarray) -> bool:
        """config.device_data for the HEMP path: train + augmented splits
        both become HBM-resident (one concatenated array; aug batches are
        train-offset row ids)."""
        from aread_tpu.train.trainer import (Trainer,
                                             device_data_mode_enabled)
        total = train_x.nbytes + (0 if aug_x is train_x else aug_x.nbytes)
        return device_data_mode_enabled(self.config, self.mesh, total,
                                        Trainer.DEVICE_DATA_BUDGET)

    def stage_device_data(self, train_x, train_y, aug_x, aug_y) -> bool:
        """Place the [train; augmented] concatenation in HBM when
        config.device_data allows; returns whether the device-resident
        path is active. Aug row ids shift by the train length (no shift
        when the splits alias — no augmentation file)."""
        self._device_data = None
        if not self.device_data_enabled(train_x, aug_x):
            return False
        if aug_x is train_x:
            xc, yc, aug_off = train_x, train_y, 0
        else:
            xc = np.concatenate([train_x, aug_x])
            yc = np.concatenate([train_y, aug_y])
            aug_off = train_x.shape[0]
        self._device_data = (jax.device_put(xc), jax.device_put(yc),
                             aug_off)
        return True

    def _snapshot(self, params, state):
        """DEVICE-resident copy (jnp.array). Mask evolution restores the
        snapshot once per candidate (reference aread.py:534-546); a host
        snapshot would push the full parameter tree (~190MB at Amazon
        scale) back through the TPU tunnel on every restore."""
        return (jax.tree_util.tree_map(jnp.array, params),
                jax.tree_util.tree_map(jnp.array, state))

    def _restore(self, snap):
        """Fresh device buffers from the device snapshot (the originals of
        a snapshot must never be donated into a step)."""
        params = jax.tree_util.tree_map(jnp.array, snap[0])
        state = jax.tree_util.tree_map(jnp.array, snap[1])
        return params, state

    def init(self, rng, sample_batch):
        model = self.model
        # init through 'domain_mask_final' so EVERY param exists, including
        # the final gate (wo_mask init would leave final_gate uncreated and
        # the final-gate phase would fail at apply time)
        from aread_tpu.models.aread import full_mask
        fm = tuple(jnp.asarray(m) for m in full_mask(model.n_tower))
        variables = jax.jit(
            lambda r, x: model.init({"params": r, "dropout": r}, x,
                                    domain_mask=fm, mode="domain_mask_final",
                                    train=False)
        )(rng, jnp.asarray(sample_batch["x"]))
        params, state = split_variables(variables)
        if self.mesh is not None:
            from aread_tpu.parallel.mesh import param_shardings
            shardings = param_shardings(params, self.mesh)
            params = jax.tree_util.tree_map(jax.device_put, params, shardings)
        opt_state = hybrid_init(self.optimizer, params,
                                moments_dtype=self.config.table_moments_dtype)
        return params, state, opt_state

    def _place(self, batch):
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from aread_tpu.parallel.mesh import batch_sharding
        bsh = batch_sharding(self.mesh)
        return {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()}

    def _place_stacked(self, stacked, batch_axis: int = 1):
        """Shard a stack of batches over the data axis. ``batch_axis``:
        which axis is the per-step example axis — 1 for [S, bs, ...]
        scan stacks, 2 for the evolution's [N_cand, S, bs, ...] stacks."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in stacked.items()}
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh,
                           P(*([None] * batch_axis), "data"))
        return {k: jax.device_put(jnp.asarray(v), sh) for k, v in stacked.items()}

    # ------------------------------------------------------------ epochs
    SCAN_CHUNK = 32

    def train_epoch(self, params, state, opt_state, epoch_i: int,
                    train_batcher: DomainBatcher, aug_batcher: DomainBatcher,
                    rng, verbose: bool = True):
        cfg = self.config
        fns = self._fns or self._build_fns()
        ms = self.mask_state
        warm_up_interval = (cfg.warm_up_interval * 1024) // cfg.bs
        regroup_interval = max(1, (cfg.regroup_interval * 1024) // cfg.bs)

        losses: List[float] = []
        device = self._device_data is not None
        if device:
            dxc, dyc, _ = self._device_data
        from aread_tpu.train.trainer import (batch_fits_kernel,
                                             kernel_dispatch_eligible)
        eligible = kernel_dispatch_eligible(cfg, self.mesh, self.model.spec,
                                            self.model.embed_dim)

        def flush(params, state, opt_state, rng, kind, pending, fits=None,
                  idxs_dev=None):
            """Run the pending [(d, idx_np, mask, record)] steps on device
            — one lax.scan dispatch for a full chunk, single jitted steps
            for partial chunks (a scan per distinct length would
            recompile, and compiles over this image's TPU tunnel cost
            minutes). Steps are scheduled as ROW IDS; with the split
            HBM-resident (config.device_data) only the [S, bs] indices
            cross the tunnel and batches gather on device; otherwise rows
            are staged host-side (identical semantics — one shared index
            stream). ``fits``: precomputed kernel-window verdict for these
            steps (run_segment fetches a whole segment's verdicts in one
            round trip — a per-chunk device fetch here would stall the
            dispatch pipeline on a tunnel round trip per chunk). Flagged
            per-step gate means are recorded after."""
            spec, ed = self.model.spec, self.model.embed_dim

            def host_batch(idx_np):
                from aread_tpu.data.loader import pad_batch
                sel = idx_np[idx_np >= 0]
                return pad_batch(train_batcher.x[sel], train_batcher.y[sel],
                                 cfg.bs)

            if len(pending) == self.SCAN_CHUNK:
                dms = tuple(jnp.asarray(np.stack([np.asarray(p[2][l]) for p in pending]))
                            for l in range(len(pending[0][2])))
                n_ex = int(sum((p[1] >= 0).sum() for p in pending))
                if device:
                    # slice of the segment's device-resident index array
                    # (no second upload of the indices)
                    idxs = idxs_dev if idxs_dev is not None else \
                        jnp.asarray(np.stack([p[1] for p in pending]))
                    with self.step_timer.step(n_examples=n_ex):
                        params, state, opt_state, rng, ls, gms = \
                            fns[f"{kind}_scan_idx"](params, state, opt_state,
                                                    dxc, dyc, idxs, dms, rng,
                                                    bool(fits))
                else:
                    hb = [host_batch(p[1]) for p in pending]
                    stacked_np = {k: np.stack([b[k] for b in hb])
                                  for k in hb[0]}
                    hfits = eligible and batch_fits_kernel(spec, ed,
                                                           stacked_np["x"])
                    batches = self._place_stacked(stacked_np)
                    with self.step_timer.step(n_examples=n_ex):
                        params, state, opt_state, rng, ls, gms = \
                            fns[f"{kind}_scan"](params, state, opt_state,
                                                batches, dms, rng, hfits)
                losses.append(ls)  # device [S]; fetched once at epoch end
                if any(p[3] for p in pending):
                    # gate means are only needed on host for the recording
                    # window right before a regroup; fetching them every
                    # chunk would block the host on device completion and
                    # kill staging/compute overlap
                    gms_np = [np.asarray(g) for g in gms]  # [S, T_prev, T_l]
                    for i, (d, _, _, record) in enumerate(pending):
                        if record:
                            ms.record_gates(d, [g[i] for g in gms_np])
                return params, state, opt_state, rng
            for i, (d, idx_np, mask, record) in enumerate(pending):
                rng, srng = jax.random.split(rng)
                n_ex = int((idx_np >= 0).sum())
                if device:
                    idx = idxs_dev[i] if idxs_dev is not None \
                        else jnp.asarray(idx_np)
                    with self.step_timer.step(n_examples=n_ex):
                        params, state, opt_state, loss, gms = \
                            fns[f"{kind}_step_idx"](params, state, opt_state,
                                                    dxc, dyc, idx,
                                                    _to_device_mask(mask),
                                                    srng, bool(fits))
                else:
                    batch_np = host_batch(idx_np)
                    hfits = eligible and batch_fits_kernel(spec, ed,
                                                           batch_np["x"])
                    batch = self._place(batch_np)
                    with self.step_timer.step(n_examples=n_ex):
                        params, state, opt_state, loss, gms = \
                            fns[f"{kind}_step"](params, state, opt_state,
                                                batch, _to_device_mask(mask),
                                                srng, hfits)
                losses.append(loss)  # device scalar; fetched at epoch end
                if record:
                    ms.record_gates(d, [np.asarray(g) for g in gms])
            return params, state, opt_state, rng

        FITS_SLICE = 2048

        def run_segment(params, state, opt_state, rng, kind, steps):
            """Flush a regroup-interval segment (no evolutions inside):
            with the split HBM-resident, the segment's [S, bs] indices are
            uploaded ONCE (padded to a FITS_SLICE multiple so the fits
            precheck compiles for a single shape), the WHOLE segment's
            kernel-window verdicts are fetched in one round trip per
            slice, and the chunk dispatches slice the device-resident
            index array — no per-chunk index uploads or verdict syncs."""
            if not steps:
                return params, state, opt_state, rng
            ok, idxs_dev = None, None
            if device:
                n = len(steps)
                idxs_np = np.stack([s[1] for s in steps])
                pad = -(-n // FITS_SLICE) * FITS_SLICE - n
                if pad:
                    # -1 rows: the fits gather replicates rows[:, :1] for
                    # them (in-range garbage); their verdicts are discarded
                    idxs_np = np.concatenate(
                        [idxs_np, np.full((pad,) + idxs_np.shape[1:], -1,
                                          idxs_np.dtype)])
                idxs_dev = jnp.asarray(idxs_np)
                if eligible:
                    parts = [np.asarray(self._fits_from_idx(
                        dxc, idxs_dev[lo:lo + FITS_SLICE], per_step=True))
                        for lo in range(0, idxs_np.shape[0], FITS_SLICE)]
                    ok = np.concatenate(parts)[:n]
            for lo in range(0, len(steps), self.SCAN_CHUNK):
                chunk = steps[lo:lo + self.SCAN_CHUNK]
                fits = (bool(ok[lo:lo + len(chunk)].all())
                        if ok is not None else False)
                params, state, opt_state, rng = flush(
                    params, state, opt_state, rng, kind, chunk, fits=fits,
                    idxs_dev=None if idxs_dev is None
                    else idxs_dev[lo:lo + len(chunk)])
            return params, state, opt_state, rng

        if epoch_i == 0:
            # -------- warm-up: round-robin domains in wo_mask with gate
            # recording (run.py:588-607), chunked into device scans
            full = [np.ones(sh, bool) for sh in mask_shapes(self.model.n_tower)]
            domain_list: List[int] = []
            steps = []
            for i in range(warm_up_interval):
                if not domain_list:
                    domain_list = list(range(self.n_domain))
                d = domain_list.pop()
                steps.append((d, train_batcher.next_batch_indices(d),
                              full, True))
            params, state, opt_state, rng = run_segment(
                params, state, opt_state, rng, "warmup", steps)
            losses.clear()  # warm-up losses are not epoch losses

        seq = train_batcher.domain_batch_seq
        with profiling.trace():  # no-op unless AREAD_TPU_TRACE is set
            steps = []
            for i, d in enumerate(seq):
                if (epoch_i == 0 and i == 0) or ((i + 1) % regroup_interval == 0):
                    # keep step/evolution ordering exact: the segment's
                    # steps run before the evolution that follows them
                    params, state, opt_state, rng = run_segment(
                        params, state, opt_state, rng, "main", steps)
                    steps = []
                    with profiling.annotate("hemp_mask_evolution"):
                        params, state, rng = self._mask_evolution(
                            params, state, train_batcher, aug_batcher, rng, verbose)
                record = ((i + 1) // regroup_interval
                          - (i + 1 + warm_up_interval) // regroup_interval) > 0
                steps.append((d, train_batcher.next_batch_indices(d),
                              [m.copy() for m in ms.domain_mask[d]], record))
            params, state, opt_state, rng = run_segment(
                params, state, opt_state, rng, "main", steps)
        from aread_tpu.train.trainer import mean_losses
        return params, state, opt_state, rng, mean_losses(losses)

    def train_final_epoch(self, params, state, opt_state, epoch_i: int,
                          train_batcher: DomainBatcher, rng,
                          verbose: bool = True):
        """Final-gate training epoch (reference train_aread_final,
        run.py:688-710): frozen body (stop_gradient inside the model's
        'domain_mask_final' mode), BCE on the gate-mixed prob; every domain
        is appended to the sequence at least once (run.py:694-696)."""
        fns = self._fns or self._build_fns()
        ms = self.mask_state
        seq = list(train_batcher.domain_batch_seq)
        present = set(seq)
        seq.extend(d for d in range(self.n_domain) if d not in present)
        losses: List[float] = []
        pending: List[Tuple[int, Dict, List]] = []

        def flush(params, state, opt_state, rng, pending):
            if len(pending) == self.SCAN_CHUNK:
                batches = self._place_stacked(
                    {k: np.stack([p[1][k] for p in pending])
                     for k in pending[0][1]})
                dms = tuple(jnp.asarray(np.stack([np.asarray(p[2][l]) for p in pending]))
                            for l in range(len(pending[0][2])))
                n_ex = int(sum(p[1]["valid"].sum() for p in pending))
                with self.step_timer.step(n_examples=n_ex):
                    params, state, opt_state, rng, ls, _ = fns["final_scan"](
                        params, state, opt_state, batches, dms, rng)
                losses.append(ls)  # device [S]; fetched once at epoch end
                return params, state, opt_state, rng
            for d, batch_np, mask in pending:
                batch = self._place(batch_np)
                rng, srng = jax.random.split(rng)
                with self.step_timer.step(n_examples=int(batch_np["valid"].sum())):
                    params, state, opt_state, loss, _ = fns["final_step"](
                        params, state, opt_state, batch, _to_device_mask(mask), srng)
                losses.append(loss)  # device scalar
            return params, state, opt_state, rng

        for d in seq:
            pending.append((d, train_batcher.next_batch(d),
                            [m.copy() for m in ms.domain_mask[d]]))
            if len(pending) == self.SCAN_CHUNK:
                params, state, opt_state, rng = flush(params, state, opt_state, rng, pending)
                pending = []
        if pending:
            params, state, opt_state, rng = flush(params, state, opt_state, rng, pending)
        from aread_tpu.train.trainer import mean_losses
        return params, state, opt_state, rng, mean_losses(losses)

    def _mask_evolution(self, params, state, train_batcher: DomainBatcher,
                        aug_batcher: DomainBatcher, rng, verbose: bool = True):
        """HEMP candidate generation + fast adaptation + probe + selection
        (run.py:612-661)."""
        cfg = self.config
        fns = self._fns or self._build_fns()
        ms = self.mask_state
        snap = self._snapshot(params, state)
        self.random_modify_sigma *= 0.99
        self.init_active_percent = max(0.1, self.init_active_percent * 0.95)
        self.candidate_mask_num *= 0.99
        n_cand = max(1, int(self.candidate_mask_num))
        self.regroup_times += 1
        if verbose:
            print(f"regroup {self.regroup_times}: sigma={self.random_modify_sigma:.4f} "
                  f"active%={self.init_active_percent:.3f} candidates={n_cand}")
        t0 = time.time()
        # stage every candidate's mask + batch schedule host-side, then run
        # the ENTIRE regroup (domains x candidates: fresh fast Adam from
        # the snapshot + update steps with on-device pruning + eval probes)
        # in ONE device dispatch
        device = self._device_data is not None
        aug_off = self._device_data[2] if device else 0
        cand_index: List[Tuple[int, int]] = []
        masks_np: List[List[np.ndarray]] = []
        fa_all: List[List] = []
        probe_all: List[List] = []
        # ONE batched split for all candidates (a split per candidate is a
        # tiny device dispatch + host fetch each — 50 tunnel round trips
        # per regroup); keys[0] advances the caller's chain
        all_keys = np.asarray(jax.random.split(rng, self.n_domain * n_cand + 1))
        rng = jnp.asarray(all_keys[0])
        keys = list(all_keys[1:])
        for d in range(self.n_domain):
            # fall back to original train data for domains the augmented
            # file doesn't cover (possible for tiny subsamples)
            use_aug = len(aug_batcher.domain_indices[d]) > 0
            fa_batcher = aug_batcher if use_aug else train_batcher
            for z in range(n_cand):
                masks_np.append(ms.generate_mask(
                    "mask_max_gate", d,
                    init_active_percent=self.init_active_percent,
                    random_modify_sigma=self.random_modify_sigma))
                if device:
                    fa = [fa_batcher.next_batch_indices(d)
                          for _ in range(cfg.regroup_update_step)]
                    if use_aug and aug_off:
                        fa = [np.where(i >= 0, i + aug_off, -1) for i in fa]
                    fa_all.append(fa)
                    probe_all.append([train_batcher.next_batch_indices(d)
                                      for _ in range(cfg.regroup_eval_step)])
                else:
                    fa_all.append([fa_batcher.next_batch(d)
                                   for _ in range(cfg.regroup_update_step)])
                    probe_all.append([train_batcher.next_batch(d)
                                      for _ in range(cfg.regroup_eval_step)])
                cand_index.append((d, z))

        masks0 = tuple(
            jnp.asarray(np.stack([np.asarray(m[li]) for m in masks_np]))
            for li in range(len(masks_np[0])))
        from aread_tpu.train.trainer import kernel_dispatch_eligible
        overlay = self.overlay_enabled()
        eligible = (not overlay) and kernel_dispatch_eligible(
            cfg, self.mesh, self.model.spec, self.model.embed_dim)
        if overlay:
            # candidate-independent whole-table drift L2 (ops/overlay_adam
            # module doc) — one pass per regroup, shared by all probes
            drift_l2 = fns["drift_l2"](snap[0]["embedding"]["table"])
        if device:
            dxc, dyc, _ = self._device_data
            fa_idxs = jnp.asarray(np.stack(fa_all))        # [N, S, bs]
            probe_idxs = jnp.asarray(np.stack(probe_all))
            if overlay:
                out_masks, out_losses = fns["fast_adapt_many_idx_ov"](
                    snap[0], snap[1], masks0, dxc, dyc, fa_idxs,
                    probe_idxs, jnp.asarray(np.stack(keys)), drift_l2)
            else:
                fits = eligible and bool(self._fits_from_idx(
                    dxc, fa_idxs.reshape(-1, fa_idxs.shape[-1])))
                out_masks, out_losses = fns["fast_adapt_many_idx"](
                    snap[0], snap[1], masks0, dxc, dyc, fa_idxs,
                    probe_idxs, jnp.asarray(np.stack(keys)), fits)
        else:
            fa_stacked = self._place_stacked(
                {k: np.stack([[b[k] for b in cand] for cand in fa_all])
                 for k in fa_all[0][0]}, batch_axis=2)
            probe_stacked = self._place_stacked(
                {k: np.stack([[b[k] for b in cand] for cand in probe_all])
                 for k in probe_all[0][0]}, batch_axis=2)
            if overlay:
                out_masks, out_losses = fns["fast_adapt_many_ov"](
                    snap[0], snap[1], masks0, fa_stacked, probe_stacked,
                    jnp.asarray(np.stack(keys)), drift_l2)
            else:
                # cond-free kernel dispatch precheck ON DEVICE over the
                # already-placed stack (the host numpy sort of candidates x
                # steps x K ids costs seconds per regroup on 2 CPU cores)
                fits = eligible and bool(self._fits_from_x(fa_stacked["x"]))
                out_masks, out_losses = fns["fast_adapt_many"](
                    snap[0], snap[1], masks0, fa_stacked, probe_stacked,
                    jnp.asarray(np.stack(keys)), fits)
        out_masks = [np.asarray(m) for m in out_masks]
        out_losses = np.asarray(out_losses)
        for i, (d, z) in enumerate(cand_index):
            ms.candidate_domain_mask[d].append(
                [lvl[i] for lvl in out_masks])
            for loss in out_losses[i]:
                ms.add_eval_loss(float(loss), d=d, mask_z=z)
        ms.update_all_mask()
        if verbose:
            print(f"mask evolution took {time.time() - t0:.1f}s; "
                  f"active ratio {ms.current_active_ratio():.3f}")
        ms.reset_for_mask_update()
        # return the ADVANCED rng: the per-candidate splits above must not
        # be replayed by the caller's subsequent training steps
        params, state = self._restore(snap)
        return params, state, rng

    # ---------------------------------------------------------------- eval
    def evaluate(self, params, state, batcher: DomainBatcher,
                 domain_cnt_weight: np.ndarray, final: bool = False) -> Dict:
        fns = self._fns or self._build_fns()
        prob_fn = fns["eval_prob_final"] if final else fns["eval_prob"]
        ms = self.mask_state
        if self.config.streaming_eval:
            accum_fn = fns["accum_final"] if final else fns["accum"]
            auc_state = self._auc.init_state()
            for d in batcher.domain_batch_seq:
                batch = self._place(batcher.next_batch(d))
                auc_state = accum_fn(params, state, batch,
                                     _to_device_mask(ms.domain_mask[d]),
                                     jnp.int32(d), auc_state)
            return self._auc.finalize(
                auc_state, domain_cnt_weight,
                multi_domain=self.config.is_evaluate_multi_domain)
        preds, targets, domains = [], [], []
        for d in batcher.domain_batch_seq:
            batch_np = batcher.next_batch(d)
            batch = self._place(batch_np)
            prob = np.asarray(prob_fn(params, state, batch,
                                      _to_device_mask(ms.domain_mask[d])))
            n = int(batch_np["valid"].sum())
            preds.append(prob[:n])
            targets.append(batch_np["y"][:n])
            domains.append(np.full((n,), d, np.int64))
        return metrics_lib.full_evaluation(
            np.concatenate(targets), np.concatenate(preds), np.concatenate(domains),
            domain_cnt_weight, multi_domain=self.config.is_evaluate_multi_domain)

    def is_continuable(self, params, state, result: Dict, epoch_i: int) -> bool:
        key = "mean_auc" if "mean_auc" in result and not np.isnan(result["mean_auc"]) \
            else "total_auc"
        best = self.best_mean_auc if key == "mean_auc" else self.best_auc
        self._improved = result[key] > best
        if result[key] > best:
            self.trial_counter = 0
            self.best_auc = result["total_auc"]
            if "mean_auc" in result:
                self.best_mean_auc = result["mean_auc"]
            self.best_checkpoint = (
                self._snapshot(params, state),
                [None if m is None else [mm.copy() for mm in m]
                 for m in self.mask_state.domain_mask],
                epoch_i)
            return True
        if self.trial_counter + 1 < self.config.early_stop:
            self.trial_counter += 1
            return True
        return False

    def fit(self, data: SplitData, rng=None, epochs: Optional[int] = None,
            verbose: bool = True, final_gate: Optional[bool] = None,
            warm_start: Optional[Dict] = None,
            ckpt_dir: Optional[str] = None) -> Dict:
        try:
            return self._fit_inner(data, rng=rng, epochs=epochs,
                                   verbose=verbose, final_gate=final_gate,
                                   warm_start=warm_start, ckpt_dir=ckpt_dir)
        finally:
            # release the HBM split copy even on watchdog/eval failures
            # (post-fit eval/serving must not keep ~2.5 GB pinned)
            self._device_data = None

    def _fit_inner(self, data: SplitData, rng=None, epochs: Optional[int] = None,
            verbose: bool = True, final_gate: Optional[bool] = None,
            warm_start: Optional[Dict] = None,
            ckpt_dir: Optional[str] = None) -> Dict:
        """``warm_start``: checkpoint dict (train.checkpoint.load_checkpoint)
        providing params/state and optionally the per-domain HEMP masks —
        the reference's is_increment restart (run.py:835-840).

        ``ckpt_dir``: elastic recovery. On every improvement a full
        resumable checkpoint is written (params / state / optimizer /
        domain masks / HEMP sigma-active%-candidate schedule / RNG key /
        epoch / best metrics); an existing one resumes training at the
        saved epoch with the evolved masks and decayed schedule intact."""
        cfg = self.config
        final_gate = cfg.aread_final if final_gate is None else final_gate
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        train_b = DomainBatcher(data.train_x, data.train_y, cfg.bs,
                                data.spec.domain_idx, self.n_domain, seed=cfg.seed)
        eval_bs = cfg.bs * 8  # prediction is batch-size independent (eval
        # BN uses running stats); bigger batches amortize tunnel dispatches
        valid_b = DomainBatcher(data.valid_x, data.valid_y, eval_bs,
                                data.spec.domain_idx, self.n_domain,
                                shuffle=False, seed=cfg.seed)
        test_b = DomainBatcher(data.test_x, data.test_y, eval_bs,
                               data.spec.domain_idx, self.n_domain,
                               shuffle=False, seed=cfg.seed)
        aug_x = data.aug_train_x if data.aug_train_x is not None else data.train_x
        aug_y = data.aug_train_y if data.aug_train_y is not None else data.train_y
        aug_b = DomainBatcher(aug_x, aug_y, cfg.bs, data.spec.domain_idx,
                              self.n_domain, seed=cfg.seed + 1)

        # device-resident split (config.device_data): train (+ augmented)
        # rows live in HBM as one concatenated array; batches/candidate
        # probes gather on device by row id — per-chunk host staging and
        # host-side kernel prechecks disappear
        self.stage_device_data(data.train_x, data.train_y, aug_x, aug_y)

        init_rng, rng = jax.random.split(rng)
        sample = train_b.next_batch(int(np.argmax([len(i) for i in train_b.domain_indices])))
        # resolve the a2a exchange capacity BEFORE any step is traced
        # (unconditional — internal no-op unless embed_lookup='a2a'): auto-
        # calibrates when unset, validates a manual bound; pools cover the
        # augmented fast-adapt batches and the 8x eval batches too (one
        # static capacity serves every jitted fn)
        from aread_tpu.parallel.embed_shard import resolve_a2a_capacity
        cfg.a2a_capacity = resolve_a2a_capacity(
            cfg, self.mesh, self.model.spec, self.model.embed_dim,
            [(data.train_x, cfg.bs), (aug_x, cfg.bs),
             (data.valid_x, eval_bs), (data.test_x, eval_bs)],
            verbose=verbose)
        params, state, opt_state = self.init(init_rng, sample)
        if warm_start is not None:
            from aread_tpu.train.trainer import adopt_tree
            params = adopt_tree(params, warm_start["params"])
            if warm_start.get("state"):
                state = adopt_tree(state, warm_start["state"])
            if warm_start.get("domain_mask"):
                self.mask_state.domain_mask = [
                    None if m is None else [np.asarray(mm, bool) for mm in m]
                    for m in warm_start["domain_mask"]]

        start_epoch = 0
        if ckpt_dir and os.path.exists(os.path.join(ckpt_dir, "meta.json")):
            from aread_tpu.train.checkpoint import load_checkpoint, mask_template
            from aread_tpu.train.trainer import adopt_tree
            ck = load_checkpoint(ckpt_dir, n_domain=self.n_domain, template={
                "params": params, "state": state, "opt_state": opt_state,
                "rng_key": np.asarray(rng),
                "domain_mask": mask_template(self.model.n_tower, self.n_domain)})
            params = adopt_tree(params, ck["params"])
            state = adopt_tree(state, ck["state"])
            opt_state = adopt_tree(opt_state, ck["opt_state"])
            rng = jnp.asarray(np.asarray(ck["rng_key"]))
            self.mask_state.domain_mask = [
                None if m is None else [np.asarray(mm, bool) for mm in m]
                for m in ck["domain_mask"]]
            start_epoch = int(ck["epoch"])
            sched = ck.get("hemp_schedule") or {}
            self.random_modify_sigma = sched.get(
                "random_modify_sigma", self.random_modify_sigma)
            self.init_active_percent = sched.get(
                "init_active_percent", self.init_active_percent)
            self.candidate_mask_num = sched.get(
                "candidate_mask_num", self.candidate_mask_num)
            self.regroup_times = int(sched.get("regroup_times", 0))
            best = ck.get("best_result") or {}
            self.best_auc = best.get("total_auc") or 0.0
            self.best_mean_auc = best.get("mean_auc") or 0.0
            self.best_checkpoint = (
                self._snapshot(params, state),
                [[mm.copy() for mm in m] for m in self.mask_state.domain_mask],
                start_epoch - 1)
            if verbose:
                print(f"elastic resume from {ckpt_dir} at epoch {start_epoch} "
                      f"(regroups so far: {self.regroup_times})")

        from aread_tpu.utils.runlog import RunLogger
        logger = RunLogger(cfg.log_dir or None, config=cfg)

        history = []
        for epoch_i in range(start_epoch,
                             epochs if epochs is not None else cfg.epoch):
            t0 = time.time()
            from aread_tpu.parallel.health import epoch_deadline, watchdog
            with watchdog(epoch_deadline(cfg.epoch_timeout_s,
                                         cfg.epoch_timeout_first_mult),
                          tag=f"aread_epoch{epoch_i}",
                          kill_process=cfg.epoch_timeout_kill):
                params, state, opt_state, rng, train_loss = self.train_epoch(
                    params, state, opt_state, epoch_i, train_b, aug_b, rng,
                    verbose)
            from aread_tpu.train.trainer import raise_if_nonfinite
            raise_if_nonfinite(train_loss, epoch_i, cfg)
            train_b.shuffle_seq()
            result = self.evaluate(params, state, valid_b, data.domain_cnt_weight)
            result["train_loss"] = train_loss
            result["epoch_time_s"] = time.time() - t0
            result["examples_per_s"] = self.step_timer.summary()["examples_per_s"]
            history.append(result)
            logger.log({"valid": result}, step=epoch_i + 1)
            if verbose:
                print(f"epoch {epoch_i + 1}: train_loss={train_loss:.4f} "
                      f"valid auc={result['total_auc']:.4f} "
                      f"loss={result['total_loss']:.4f} "
                      f"mean_auc={result.get('mean_auc', np.nan):.4f}")
            cont = self.is_continuable(params, state, result, epoch_i)
            if ckpt_dir and self._improved:
                from aread_tpu.train.checkpoint import save_checkpoint
                assert all(m is not None for m in self.mask_state.domain_mask)
                save_checkpoint(
                    ckpt_dir, params, state, opt_state, epoch=epoch_i + 1,
                    best_result=result, rng_key=np.asarray(rng),
                    domain_mask=self.mask_state.domain_mask,
                    hemp_schedule={
                        "random_modify_sigma": self.random_modify_sigma,
                        "init_active_percent": self.init_active_percent,
                        "candidate_mask_num": self.candidate_mask_num,
                        "regroup_times": self.regroup_times})
            if not cont:
                break
        if self.best_checkpoint is not None:
            snap, masks, _ = self.best_checkpoint
            params, state = self._restore(snap)
            self.mask_state.domain_mask = [
                None if m is None else [mm.copy() for mm in m] for m in masks]

        if final_gate:
            # final-gate phase (reference run.py:861-885, commented out
            # there because config.final_lr was never defined): fresh Adam
            # at final_lr over the frozen-body 'domain_mask_final' loss,
            # early stopping on weighted mean AUC, then test through the
            # trained gate. Deviation: the reference trains each epoch on a
            # 1/20th slice of the sequence (run.py:863-874); we train on the
            # full sequence per epoch. We also reset the patience counter —
            # the main loop exits with it exhausted.
            fns = self._fns or self._build_fns()
            # fresh Adam over the final_gate leaf ONLY (see the
            # final_core note in _build_fns: the frozen body must not
            # enter the optimizer, matching torch's skip-gradless-params)
            final_opt_state = fns["final_opt"].init(params["final_gate"])
            self.trial_counter = 0
            for epoch_i in range(epochs if epochs is not None else cfg.final_epoch):
                t0 = time.time()
                params, state, final_opt_state, rng, floss = self.train_final_epoch(
                    params, state, final_opt_state, epoch_i, train_b, rng, verbose)
                from aread_tpu.train.trainer import raise_if_nonfinite
                raise_if_nonfinite(floss, epoch_i, cfg)
                train_b.shuffle_seq()
                result = self.evaluate(params, state, valid_b,
                                       data.domain_cnt_weight, final=True)
                result["train_loss"] = floss
                result["epoch_time_s"] = time.time() - t0
                result["phase"] = "final_gate"
                history.append(result)
                if verbose:
                    print(f"final-gate epoch {epoch_i + 1}: train_loss={floss:.4f} "
                          f"valid auc={result['total_auc']:.4f} "
                          f"loss={result['total_loss']:.4f} "
                          f"mean_auc={result.get('mean_auc', np.nan):.4f}")
                if not self.is_continuable(params, state, result, epoch_i):
                    break
            if self.best_checkpoint is not None:
                snap, masks, _ = self.best_checkpoint
                params, state = self._restore(snap)
                self.mask_state.domain_mask = [
                    None if m is None else [mm.copy() for mm in m] for m in masks]

        test_result = self.evaluate(params, state, test_b, data.domain_cnt_weight,
                                    final=final_gate)
        logger.log({"test": test_result,
                    "domain_mask_active": [
                        None if m is None else [float(np.mean(mm)) for mm in m]
                        for m in self.mask_state.domain_mask]})
        logger.close()
        return {"history": history, "test": test_result,
                "params": params, "state": state,
                "domain_mask": self.mask_state.domain_mask}
