"""Training/eval orchestration for the non-AREAD model zoo.

Reproduces the reference Run's semantics (run.py:33-908):
  * Adam(lr, betas=(0.9, 0.99), eps=1e-8, weight_decay=1e-8) (run.py:830);
  * loss = BCE (mean) + manual L2 regularization term (run.py:505);
  * multi-tower models compute all towers; the loss gathers the sample's
    group column (run.py:497-500);
  * early stopping on weighted mean AUC with patience ``early_stop``
    (run.py:459-484), checkpoint on every improvement, best model reloaded
    for the test pass (run.py:899-901).

TPU-first: a single donated jitted train step per model; batches are fixed
shape with a validity mask; BCE is computed from logits (equal to the
reference's BCELoss on probabilities, but stable and fusable).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aread_tpu.config import Config
from aread_tpu.data.loader import DomainBatcher, GlobalBatcher, SplitData
from aread_tpu.models.base import gather_group, regularization_loss
from aread_tpu.train import metrics as metrics_lib
from aread_tpu.utils import profiling

MULTI_TOWER_MODELS = ("ple", "mmoe", "pepnet", "epnet", "star", "adl", "hinet")
CONCAT_GROUP_MODELS = ("star", "adl", "hinet")  # forward consumes group


def bce_with_logits(logit, y):
    """Numerically stable binary cross-entropy from logits."""
    return jnp.maximum(logit, 0.0) - logit * y + jnp.log1p(jnp.exp(-jnp.abs(logit)))


def masked_mean(values, valid):
    return jnp.sum(values * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def mean_losses(losses) -> float:
    """Mean over a mixed list of device scalars and [S] device/numpy loss
    arrays. The epoch loops accumulate UN-FETCHED device values — fetching
    per chunk would block the host on device completion and serialize
    batch staging with compute (each fetch is a 30-70 ms round trip over
    this image's TPU tunnel) — and materialize them all here, once."""
    if not losses:
        return float("nan")
    return float(np.mean(
        np.concatenate([np.atleast_1d(np.asarray(l)) for l in losses])))


def make_optimizer(lr: float, wd: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, betas=(0.9,0.99), eps=1e-8, weight_decay=wd):
    torch applies weight decay additively to the gradient BEFORE the moment
    updates, which is optax.add_decayed_weights placed before adam."""
    return optax.chain(
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8),
        optax.scale(-lr),
    )


def split_variables(variables) -> Tuple[Dict, Dict]:
    # 'perturbations' (the sparse-grad tap, ops/embedding.py) is an input
    # collection the step supplies per batch, never carried state
    params = variables["params"]
    state = {k: v for k, v in variables.items()
             if k not in ("params", "perturbations")}
    return params, state


# ---------------------------------------------------------------------------
# Hybrid optimizer: the fused embedding table (~99% of parameters at Amazon
# scale, 1.37M itemid rows, config.py:7) is updated by ONE Pallas pass with
# torch-Adam semantics and the weight-decay + embedding-L2 gradient folded
# in (see ops/pallas/fused_adam.py); all other leaves go through the optax
# chain. Numerically identical to optax-on-everything with the L2 term in
# the loss: torch computes grad(loss + l2*||w||^2) + wd*w, which equals
# grad(loss) + (2*l2 + wd)*w for the table leaf.
# ---------------------------------------------------------------------------

TABLE_RULE = r"^embedding/table$"
TABLE_L2 = 1e-5  # l2_reg_embedding (reference layer.py:15,31)


def split_table(tree: Dict) -> Tuple[Any, Dict]:
    """(table_leaf, tree-without-table). Every model's params contain
    embedding/table (models/base.py _backbone)."""
    table = tree["embedding"]["table"]
    rest = dict(tree)
    rest["embedding"] = {k: v for k, v in tree["embedding"].items() if k != "table"}
    return table, rest


def merge_table(rest: Dict, table) -> Dict:
    out = dict(rest)
    emb = dict(out.get("embedding", {}))
    emb["table"] = table
    out["embedding"] = emb
    return out


def strip_table_rule(rules):
    """Reg rules without the embedding-table term (its gradient is folded
    into the fused Adam decay). The LOSS VALUE still reports the term via
    a stop_gradient summand so printed losses match the reference."""
    return tuple((p, l2) for p, l2 in rules if p != TABLE_RULE)


def table_reg_value(table):
    """stop_gradient(l2*||table||^2): keeps the reported loss equal to the
    reference's (run.py:505) without paying the dense backward pass.
    f32 accumulation for bf16-stored tables (config.table_dtype)."""
    return TABLE_L2 * jnp.sum(jnp.square(
        jax.lax.stop_gradient(table).astype(jnp.float32)))


def hybrid_init(optimizer: optax.GradientTransformation, params: Dict,
                moments_dtype=None) -> Dict:
    """``moments_dtype``: storage dtype for the table Adam moments
    (config.table_moments_dtype; bf16 halves their sweep traffic)."""
    table, rest = split_table(params)
    mdt = table.dtype if moments_dtype is None else jnp.dtype(moments_dtype)
    return {
        "inner": optimizer.init(rest),
        "m": jnp.zeros(table.shape, mdt),
        "v": jnp.zeros(table.shape, mdt),
        "t": jnp.zeros((), jnp.int32),
    }


def clip_scale_by_global_norm(grad_trees, clip_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics: returns the scalar factor
    min(1, clip/||g||) over the concatenation of all leaves of all trees
    in ``grad_trees`` (identity when clip_norm <= 0)."""
    if not clip_norm or clip_norm <= 0.0:
        return None
    leaves = [l for t in grad_trees for l in jax.tree_util.tree_leaves(t)]
    sq = sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
    norm = jnp.sqrt(sq)
    return jnp.minimum(1.0, clip_norm / (norm + 1e-6))


def hybrid_update(optimizer: optax.GradientTransformation, lr: float, wd: float,
                  params: Dict, grads: Dict, opt_state: Dict,
                  table_l2: float = TABLE_L2,
                  clip_norm: float = 0.0) -> Tuple[Dict, Dict]:
    """One optimizer step; returns (new_params, new_opt_state).

    The table goes through ``reference_adam_update`` — a single fused jnp
    expression XLA compiles to one pass over (w, m, v, g). The Pallas
    kernel variant (ops/pallas/fused_adam.py) is opt-in via
    ``AREAD_TPU_PALLAS_ADAM=1``: measured on this image's tunneled v5e it
    is NOT faster than the XLA fusion, and it needs interpret mode on CPU.

    ``clip_norm``: optional global-norm gradient clipping over ALL data
    gradients (config.grad_clip_norm — a beyond-reference stability knob;
    the root-cause study showed the shared lr=1e-2 gated-family recipe
    blows up without it, PARITY.md). The decay/L2 terms folded inside the
    Adam updates are not clipped (they are O(1e-5 * w)).
    """
    import os as _os

    from aread_tpu.ops.pallas.fused_adam import (fused_adam_update,
                                                 reference_adam_update)

    scale = clip_scale_by_global_norm([grads], clip_norm)
    if scale is not None:
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    g_table, g_rest = split_table(grads)
    p_table, p_rest = split_table(params)
    t = opt_state["t"] + 1
    table_fn = fused_adam_update if _os.environ.get("AREAD_TPU_PALLAS_ADAM") \
        else reference_adam_update
    new_table, m, v = table_fn(
        p_table, opt_state["m"], opt_state["v"], g_table, t,
        lr=lr, weight_decay=wd, l2=table_l2)
    updates, new_inner = optimizer.update(g_rest, opt_state["inner"], p_rest)
    new_rest = optax.apply_updates(p_rest, updates)
    new_opt_state = {"inner": new_inner, "m": m, "v": v, "t": t}
    return merge_table(new_rest, new_table), new_opt_state


def embed_lookup_ctx(config, mesh):
    """Zero-arg context-manager factory routing FeaturesEmbedding row
    gathers per ``config.embed_lookup``: 'gspmd' (default) leaves the plain
    jnp.take for XLA to partition; 'a2a' routes through the explicit dedup
    + all-to-all exchange (parallel/embed_shard.a2a_lookup). Shared by
    Trainer and AREADTrainer so the knob applies to EVERY model's steps —
    validation included (an unknown value must fail loudly for both)."""
    if config.embed_lookup == "a2a":
        if mesh is None:
            raise ValueError("embed_lookup='a2a' needs a device mesh")
        from functools import partial as _partial

        from aread_tpu.ops.embedding import lookup_override
        from aread_tpu.parallel.embed_shard import a2a_lookup

        cap = int(config.a2a_capacity or 0)
        return _partial(
            lookup_override,
            # <=0 -> always-exact; fit() resolves 0 (auto) to a measured
            # bound via resolve_a2a_capacity before any step is traced
            _partial(a2a_lookup, mesh=mesh,
                     capacity=cap if cap > 0 else None))
    if config.embed_lookup != "gspmd":
        raise ValueError(f"embed_lookup={config.embed_lookup!r}")
    import contextlib

    return contextlib.nullcontext


def raise_if_nonfinite(train_loss, epoch_i: int, config) -> None:
    """Host-side NaN guard on the fetched per-epoch train loss (ADVICE r2).

    Without it, a NaN-poisoned run (a2a capacity overflow on a late batch,
    lr blowup, bad data) sails into evaluate(); is_continuable sees NaN
    metrics, NaN > best is False, and the run quietly early-stops as if
    converged. Raise loudly with the likely causes instead."""
    if np.isfinite(float(train_loss)):
        return
    hints = ["lr too high", "non-finite rows in the input"]
    if getattr(config, "embed_lookup", "gspmd") == "a2a" and \
            int(getattr(config, "a2a_capacity", 0) or 0) > 0:
        hints.insert(0, (
            f"a2a_capacity={config.a2a_capacity} overflowed on a batch "
            "after calibration (the exchange NaN-poisons instead of "
            "silently dropping rows) — raise it or pass -1 for always-"
            "exact"))
    raise FloatingPointError(
        f"non-finite train loss {train_loss} at epoch {epoch_i + 1}; "
        "possible causes: " + "; ".join(hints))


def embedding_flat_ids(spec, x) -> jnp.ndarray:
    """The table row each input column gathers (offsets applied, clipped
    exactly like the forward's take(mode='clip')) — the sparse scatter
    targets for ops/sparse_adam."""
    from aread_tpu.ops.embedding import compute_offsets

    offsets = compute_offsets(spec.one_hot_dims,
                              spec.n_seq_fields * spec.seq_maxlen,
                              spec.itemid_idx)
    n_rows = int(np.sum(spec.one_hot_dims))
    ids = x + jnp.asarray(offsets, dtype=x.dtype)[None, :]
    return jnp.clip(ids, 0, n_rows - 1)


def batch_fits_kernel(spec, embed_dim: int, x_np) -> bool:
    """Host-side overflow precheck for the no-cond fast dispatch (the
    lax.cond fallback costs ~1.26 ms/step in table copies). ``x_np`` is a
    single batch [bs, F] or any stack of batches [..., bs, F]; the
    kernel's PAD_W predicate is evaluated PER STEP (per batch), matching
    pack_meta's per-dispatch overflow flag. Only meaningful on the TPU
    backend — returns False elsewhere so the safe variant is the one
    (and only) compilation."""
    if jax.default_backend() != "tpu":
        return False
    from aread_tpu.ops.embedding import compute_offsets
    from aread_tpu.ops.sparse_adam import steps_fit_kernel

    offsets = np.asarray(compute_offsets(
        spec.one_hot_dims, spec.n_seq_fields * spec.seq_maxlen,
        spec.itemid_idx))
    n_rows = int(np.sum(spec.one_hot_dims))
    x = np.asarray(x_np)
    ids = np.clip(x + offsets, 0, n_rows - 1)
    if ids.ndim == 2:
        ids = ids[None]
    return steps_fit_kernel(ids.reshape(-1, ids.shape[-2] * ids.shape[-1]),
                            n_rows, embed_dim)


def build_fits_from_rows(spec, embed_dim: int):
    """Jitted ON-DEVICE kernel-window precheck builder: returns
    ``fits(dx, rows)`` where ``dx`` is the HBM-resident [N, F] split and
    ``rows`` a [S, bs] int32 schedule (-1 = padding, replicated from the
    batch's first row exactly like the gather). Computes the per-step
    predicate of ops/sparse_adam.steps_fit_kernel as one batched row-sort
    — the host numpy variant costs seconds per epoch on this image's 2
    CPU cores at Amazon scale. Shared by the generic device-resident
    epoch (Trainer) and the HEMP index feeds (AREADTrainer)."""
    from aread_tpu.ops.embedding import compute_offsets
    from aread_tpu.ops.sparse_adam import steps_fit_kernel_jax

    n_rows = int(np.sum(spec.one_hot_dims))
    offs = jnp.asarray(np.asarray(compute_offsets(
        spec.one_hot_dims, spec.n_seq_fields * spec.seq_maxlen,
        spec.itemid_idx)), jnp.int32)

    @partial(jax.jit, static_argnames=("per_step",))
    def fits(dx, rows, per_step=False):
        gidx = jnp.where(rows < 0, rows[:, :1], rows)        # [S, bs]
        ids = jnp.clip(dx[gidx] + offs[None, None, :], 0, n_rows - 1)
        return steps_fit_kernel_jax(ids.reshape(rows.shape[0], -1),
                                    n_rows, embed_dim, per_step=per_step)

    return fits


def device_data_mode_enabled(config, mesh, total_bytes: int,
                             budget: int) -> bool:
    """config.device_data gate shared by both trainers: '0' off, mesh
    runs off ('1' on a mesh is an error, not a silent ignore), '1'
    forced, 'auto' = fits the HBM budget."""
    cfg = config.device_data
    if cfg == "0":
        return False
    if mesh is not None:
        if cfg == "1":
            raise ValueError(
                "device_data=1 is not supported on mesh runs (the epoch "
                "paths gather from a single-device split); use "
                "device_data=auto/0 with a mesh")
        return False
    if cfg == "1":
        return True
    return total_bytes <= budget


def kernel_dispatch_eligible(config, mesh, spec, embed_dim: int,
                             lazy_counts: bool = True) -> bool:
    """Shared gate for the cond-free sparse-Adam kernel dispatch: the
    per-batch fits-precheck is only meaningful when the kernel path would
    actually run (single device, sparse table grads, exact — not lazy —
    optimizer, TPU backend, supported layout)."""
    if not (config.sparse_table_grad and mesh is None):
        return False
    if lazy_counts and config.table_optimizer == "lazy_adam":
        return False
    if jax.default_backend() != "tpu":
        return False
    from aread_tpu.ops.pallas import sparse_adam_kernel as sak
    return sak.supports(int(np.sum(spec.one_hot_dims)), embed_dim)


def perturbation_zeros(spec, x, embed_dim: int) -> Dict:
    """Zero 'perturbations' collection matching the embedding tap."""
    return {"embedding": {"rows": jnp.zeros(x.shape + (embed_dim,),
                                            jnp.float32)}}


def hybrid_update_sparse(optimizer: optax.GradientTransformation, lr: float,
                         wd: float, params: Dict, g_rest: Dict,
                         table_ids: jnp.ndarray, row_grads: jnp.ndarray,
                         opt_state: Dict, table_l2: float = TABLE_L2,
                         table_shape: Tuple[int, int] = None,
                         mesh=None, lazy: bool = False,
                         assume_no_overflow: bool = False,
                         want_table_l2: bool = False,
                         clip_norm: float = 0.0):
    """hybrid_update with the table's data gradient in sparse (ids, rows)
    form: the dense [n_rows, E] cotangent never exists. Bit-identical to
    the dense path (ops/sparse_adam.py). ``g_rest`` excludes the table.
    ``table_shape``: logical (n_rows, E), required when the table is
    stored flat (spec.flat_table). With a mesh whose 'model' axis > 1 the
    update runs per-shard under shard_map (parallel/sharded_adam.py) —
    left to GSPMD, the Pallas custom call would be replicated.

    ``want_table_l2``: also return TABLE_L2 * sum(w_pre**2) — the loss-
    report term table_reg_value computes — as a 3rd output. On the Pallas
    kernel path the sum accumulates INSIDE the optimizer sweep (the table
    already streams through it), so reporting the reference's full loss
    costs zero extra HBM traffic; other paths pay the same single pass a
    trainer-side table_reg_value would."""
    from aread_tpu.ops.sparse_adam import dedup_rows, sparse_adam_dispatch

    p_table, p_rest = split_table(params)
    t = opt_state["t"] + 1
    flat_ids = table_ids.reshape(-1)
    flat_rows = row_grads.reshape(-1, row_grads.shape[-1])
    n_rows = (table_shape if table_shape is not None else p_table.shape)[0]
    use_sharded = mesh is not None and mesh.shape.get("model", 1) > 1
    uids = gsum = None
    if not use_sharded:
        # dedup ONCE here (sparse_adam_dispatch consumes the deduped form
        # directly) so the clip norm below can use the summed-per-id rows
        flat_ids32 = flat_ids.astype(jnp.int32)
        uids, gsum = dedup_rows(flat_ids32, flat_rows, n_rows)
    # global-norm clip over the full data gradient: non-table leaves plus
    # the table's data gradient. The table term uses the DEDUPED per-id
    # row sums (sentinel rows carry exact zeros), so the factor equals
    # torch's over the dense cotangent even when duplicate ids' row grads
    # are positively aligned (sum-of-per-row ||g||^2 would UNDER-count
    # ||sum g||^2 there and clip too weakly — ADVICE r4). The mesh branch
    # pays one extra dedup for the same exactness, only when clipping.
    if clip_norm and clip_norm > 0 and gsum is None:
        _, gsum = dedup_rows(flat_ids.astype(jnp.int32), flat_rows, n_rows)
    scale = clip_scale_by_global_norm(
        [g_rest, gsum] if gsum is not None else [g_rest], clip_norm)
    if scale is not None:
        g_rest = jax.tree_util.tree_map(lambda g: g * scale, g_rest)
        flat_rows = flat_rows * scale
        if uids is not None:
            gsum = gsum * scale
    l2val = None
    if use_sharded:
        from aread_tpu.parallel.sharded_adam import sharded_sparse_table_adam
        new_table, m, v = sharded_sparse_table_adam(
            p_table, opt_state["m"], opt_state["v"], flat_ids, flat_rows,
            t, mesh=mesh, lr=lr, weight_decay=wd, l2=table_l2,
            table_shape=table_shape, lazy=lazy)
        if want_table_l2:
            l2val = table_l2 * jnp.sum(jnp.square(
                jax.lax.stop_gradient(p_table).astype(jnp.float32)))
    else:
        out = sparse_adam_dispatch(
            p_table, opt_state["m"], opt_state["v"], uids, gsum,
            t, lr=lr, weight_decay=wd, l2=table_l2, table_shape=table_shape,
            lazy=lazy, assume_no_overflow=assume_no_overflow,
            want_l2=want_table_l2)
        if want_table_l2:
            new_table, m, v, raw_l2 = out
            l2val = table_l2 * raw_l2
        else:
            new_table, m, v = out
    updates, new_inner = optimizer.update(g_rest, opt_state["inner"], p_rest)
    new_rest = optax.apply_updates(p_rest, updates)
    new_opt_state = {"inner": new_inner, "m": m, "v": v, "t": t}
    new_params = merge_table(new_rest, new_table)
    if want_table_l2:
        return new_params, new_opt_state, l2val
    return new_params, new_opt_state


def matmul_precision_ctx(compute_dtype: str):
    """The TPU-idiomatic realization of config.compute_dtype: params and
    activations stay float32 in memory, but with 'bfloat16' every fp32
    matmul traced under the context runs as a single bf16 MXU pass
    (jax.default_matmul_precision) instead of the 3-pass bf16_3x default —
    the standard speed/accuracy knob for CTR models whose quality is
    embedding- not precision-bound. 'float32' leaves XLA's default."""
    import contextlib

    if compute_dtype == "bfloat16":
        return jax.default_matmul_precision("bfloat16")
    return contextlib.nullcontext()


def adopt_tree(init_tree, loaded_tree):
    """Map checkpoint-loaded (numpy) leaves onto a freshly initialized
    tree, keeping each init leaf's dtype and device/sharding placement
    (mesh runs included). Shapes must match — a shape error here means the
    checkpoint was written by a different model/spec configuration."""
    def one(i, l):
        arr = jnp.asarray(np.asarray(l), dtype=i.dtype)
        assert arr.shape == i.shape, (arr.shape, i.shape)
        if hasattr(i, "sharding"):
            return jax.device_put(arr, i.sharding)
        return arr
    return jax.tree_util.tree_map(one, init_tree, loaded_tree)


class Trainer:
    """Generic trainer for single-output and multi-tower models."""

    def __init__(self, model, config: Config, n_domain: int,
                 domain2group: Optional[np.ndarray] = None, mesh=None):
        self.model = model
        self.config = config
        self.n_domain = n_domain
        self.model_name = getattr(model, "model_name", type(model).__name__.lower())
        self.is_multi_tower = self.model_name in MULTI_TOWER_MODELS
        self.domain2group = domain2group
        # Optional jax.sharding.Mesh('data','model'): params placed with
        # the table row-sharded, batches data-sharded; the SAME jitted
        # steps then run SPMD via GSPMD sharding propagation.
        self.mesh = mesh
        self.optimizer = make_optimizer(config.lr, config.wd)
        self._train_step = None
        self._train_scan = None
        self._epoch_scan = None
        self._epoch_fits = None
        self._device_data = None  # (host_x, host_y, dx, dy) HBM train split
        self._eval_step = None
        self._eval_accum_step = None
        self._all_tower_step = None
        # early-stop state (reference run.py:99-103)
        self.trial_counter = 0
        self.best_auc, self.best_mean_auc = 0.0, 0.0
        self.best_loss, self.best_mean_loss = np.inf, np.inf
        self.best_checkpoint = None
        self._improved = False
        # --adl_eval_dlm_update: evaluate() sets this to the post-eval
        # model state (mutated DLM centers) for fit() to carry forward;
        # initialized here so no path can observe a stale value
        self.eval_mutated_state = None
        self.step_timer = profiling.StepTimer()

    # ---------------------------------------------------------------- init
    def init(self, rng, sample_batch) -> Tuple[Dict, Dict, Any]:
        has_group = "group" in sample_batch
        model = self.model

        @jax.jit
        def _init(rng, x, group):
            kwargs = {"train": False}
            if group is not None:
                kwargs["group"] = group
            return model.init({"params": rng, "dropout": rng}, x, **kwargs)

        variables = _init(rng, jnp.asarray(sample_batch["x"]),
                          jnp.asarray(sample_batch["group"]) if has_group else None)
        params, state = split_variables(variables)
        if self.mesh is not None:
            from aread_tpu.parallel.mesh import param_shardings
            shardings = param_shardings(params, self.mesh)
            params = jax.tree_util.tree_map(jax.device_put, params, shardings)
        opt_state = hybrid_init(self.optimizer, params,
                                moments_dtype=self.config.table_moments_dtype)
        return params, state, opt_state

    # ------------------------------------------------------------ placement
    def _place(self, batch: Dict) -> Dict:
        """Host batch -> device; data-sharded over the mesh if present."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from aread_tpu.parallel.mesh import batch_sharding
        bsh = batch_sharding(self.mesh)
        return {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()}

    def _place_stacked(self, stacked: Dict) -> Dict:
        """[S, bs, ...] scan input; the batch axis (axis 1) data-shards."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in stacked.items()}
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P(None, "data"))
        return {k: jax.device_put(jnp.asarray(v), sh) for k, v in stacked.items()}

    def _model_kwargs(self, batch, train: bool) -> Dict:
        kwargs: Dict[str, Any] = {"train": train}
        if train:
            kwargs["mask"] = jnp.asarray(batch["valid"])
        if "group" in batch:
            kwargs["group"] = jnp.asarray(batch["group"])
        return kwargs

    # ---------------------------------------------------------- jitted fns
    def _build_step_core(self):
        model, optimizer = self.model, self.optimizer
        # table L2 gradient folds into the fused Adam pass (hybrid_update);
        # its value is reported via table_reg_value so loss matches the
        # reference's (run.py:505)
        reg_rules = strip_table_rule(type(self.model).REG_RULES)
        is_multi_tower = self.is_multi_tower
        lr, wd = self.config.lr, self.config.wd
        clip = self.config.grad_clip_norm

        spec = self.model.spec
        embed_dim = self.model.embed_dim
        sparse = self.config.sparse_table_grad
        mesh = self.mesh
        report_treg = self.config.loss_report_table_l2

        compute_dtype = self.config.compute_dtype

        # mesh-only: optionally route the table gather through the explicit
        # dedup + all-to-all exchange (config.embed_lookup='a2a'). Applied
        # at trace time inside every jit wrapper of this step body.
        _lookup_ctx = embed_lookup_ctx(self.config, mesh)

        def step_core(params, state, opt_state, batch, rng,
                      no_overflow=False):
            with matmul_precision_ctx(compute_dtype), _lookup_ctx():
                return _step_body(params, state, opt_state, batch, rng,
                                  no_overflow)

        def _step_body(params, state, opt_state, batch, rng, no_overflow):
            x, y, valid = batch["x"], batch["y"], batch["valid"]
            group = batch.get("group")

            def forward(variables):
                kwargs = {"train": True, "mask": valid}
                if group is not None:
                    kwargs["group"] = group
                out, new_state = model.apply(
                    variables, x, mutable=list(state.keys()),
                    rngs={"dropout": rng}, **kwargs)
                logit = out["logit"]
                if is_multi_tower and logit.ndim == 2:
                    logit = gather_group(logit, group if group is not None else batch["domain"])
                return masked_mean(bce_with_logits(logit, y), valid), new_state

            if sparse:
                # data grads w.r.t. the GATHERED rows (flax perturb tap,
                # ops/embedding.py) — the dense table cotangent is never
                # built; table goes through the 2-phase sparse Adam
                table, rest = split_table(params)

                def loss_fn(rest_p, pert):
                    variables = {"params": merge_table(rest_p, table),
                                 "perturbations": pert, **state}
                    bce, new_state = forward(variables)
                    loss = bce + regularization_loss(rest_p, reg_rules)
                    return loss, new_state

                pert0 = perturbation_zeros(spec, x, embed_dim)
                (loss, new_state), (g_rest, g_pert) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True)(rest, pert0)
                ids = embedding_flat_ids(spec, x)
                out = hybrid_update_sparse(
                    optimizer, lr, wd, params, g_rest, ids,
                    g_pert["embedding"]["rows"], opt_state,
                    table_shape=(int(np.sum(spec.one_hot_dims)), embed_dim),
                    mesh=mesh,
                    lazy=self.config.table_optimizer == "lazy_adam",
                    assume_no_overflow=no_overflow,
                    want_table_l2=report_treg, clip_norm=clip)
                if report_treg:
                    # reported loss includes the table L2 value (reference
                    # run.py:505) — the kernel accumulated it for free over
                    # the SAME pre-update table the forward used
                    new_params, new_opt_state, l2val = out
                    loss = loss + l2val
                else:
                    new_params, new_opt_state = out
                return new_params, dict(new_state), new_opt_state, loss

            def loss_fn(p):
                bce, new_state = forward({"params": p, **state})
                loss = bce + regularization_loss(p, reg_rules)
                if report_treg:
                    loss = loss + table_reg_value(p["embedding"]["table"])
                return loss, new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            new_params, new_opt_state = hybrid_update(
                optimizer, lr, wd, params, grads, opt_state, clip_norm=clip)
            return new_params, dict(new_state), new_opt_state, loss

        return step_core

    def _build_train_step(self):
        return partial(jax.jit, donate_argnums=(0, 1, 2),
                       static_argnums=(5,))(self._build_step_core())

    def _build_train_scan(self):
        """SCAN_CHUNK train steps in ONE device dispatch (lax.scan).

        On this image's tunneled TPU a python-loop step pays ~8-30 ms of
        host dispatch per step — several times the device step itself —
        so the epoch loop batches steps on device. Stacked batches are a
        dict of [S, bs, ...] arrays."""
        step_core = self._build_step_core()

        @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(5,))
        def train_scan(params, state, opt_state, batches, rng,
                       no_overflow=False):
            def body(carry, batch):
                params, state, opt_state, rng = carry
                rng, srng = jax.random.split(rng)
                params, state, opt_state, loss = step_core(
                    params, state, opt_state, batch, srng, no_overflow)
                return (params, state, opt_state, rng), loss

            (params, state, opt_state, rng), losses = jax.lax.scan(
                body, (params, state, opt_state, rng), batches)
            return params, state, opt_state, rng, losses

        return train_scan

    def _build_epoch_scan(self):
        """ONE device dispatch per EPOCH over device-resident data.

        The train split lives in HBM (placed once by fit); each scan step
        gathers its batch rows by index from it. The only per-epoch
        transfer is the [n_batches, bs] int32 permutation. Padded slots
        carry -1 and replicate the batch's first row (exactly the host
        path's pad_batch semantics, loader.py pad_batch), so the two paths
        are numerically identical given the same shuffle stream and rng.
        """
        step_core = self._build_step_core()
        domain_idx = self.model.spec.domain_idx
        d2g = (None if self.domain2group is None
               else jnp.asarray(self.domain2group, jnp.int32))

        @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(7,))
        def epoch_scan(params, state, opt_state, dx, dy, perm, rng,
                       no_overflow=False):
            def body(carry, idx):
                params, state, opt_state, rng = carry
                rng, srng = jax.random.split(rng)
                valid = (idx >= 0).astype(jnp.float32)
                # pad slots replicate the batch's first row (always valid:
                # only the tail batch is ragged and padding is at its end)
                gidx = jnp.where(idx < 0, idx[0], idx)
                x = dx[gidx]
                y = dy[gidx].astype(jnp.float32) * valid
                batch = {"x": x, "y": y, "valid": valid,
                         "domain": x[:, domain_idx].astype(jnp.int32)}
                if d2g is not None:
                    batch["group"] = d2g[batch["domain"]]
                params, state, opt_state, loss = step_core(
                    params, state, opt_state, batch, srng, no_overflow)
                return (params, state, opt_state, rng), loss

            (params, state, opt_state, rng), losses = jax.lax.scan(
                body, (params, state, opt_state, rng), perm)
            return params, state, opt_state, rng, losses

        return epoch_scan

    def _build_eval_step(self):
        model = self.model
        is_multi_tower = self.is_multi_tower
        # ADL opt-in (--adl_eval_dlm_update): the reference mutates DLM
        # cluster centers during eval batches too (adl.py:61-77); the
        # mutable step threads model_state through the eval loop so the
        # deviation's AUC effect is measurable (VERDICT r3 item 3)
        eval_mutates = getattr(model, "eval_dlm_update", False)

        @jax.jit
        def eval_step(params, state, batch):
            variables = {"params": params, **state}
            kwargs: Dict[str, Any] = {"train": False}
            if "group" in batch:
                kwargs["group"] = batch["group"]
            if eval_mutates:
                out, new_state = model.apply(variables, batch["x"],
                                             mutable=list(state.keys()),
                                             **kwargs)
            else:
                out = model.apply(variables, batch["x"], **kwargs)
                new_state = state
            prob = out["prob"]
            if is_multi_tower and prob.ndim == 2:
                prob = gather_group(prob, batch["group"])
            return prob, dict(new_state)

        return eval_step

    # ------------------------------------------------------------ training
    SCAN_CHUNK = 32

    def train_epoch(self, params, state, opt_state, batcher: Iterable, rng,
                    log_every: int = 200):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        if self._train_scan is None:
            self._train_scan = self._build_train_scan()
        losses: list = []
        pending: list = []

        def flush_chunk(params, state, opt_state, rng, chunk):
            stacked_np = {k: np.stack([b[k] for b in chunk]) for k in chunk[0]}
            fits = self._kernel_dispatch_eligible() and \
                batch_fits_kernel(self.model.spec, self.model.embed_dim,
                                  stacked_np["x"])
            stacked = self._place_stacked(stacked_np)
            n_ex = int(sum(b["valid"].sum() for b in chunk))
            with self.step_timer.step(n_examples=n_ex):
                params, state, opt_state, rng, ls = self._train_scan(
                    params, state, opt_state, stacked, rng, fits)
            losses.append(ls)  # device [S]; fetched once at epoch end
            return params, state, opt_state, rng

        with profiling.trace():  # no-op unless AREAD_TPU_TRACE is set
            for batch in batcher:
                pending.append(batch)
                if len(pending) == self.SCAN_CHUNK:
                    params, state, opt_state, rng = flush_chunk(
                        params, state, opt_state, rng, pending)
                    pending = []
            # remainder: single jitted steps (a second compile, but only
            # for the tail of the epoch)
            for batch in pending:
                rng, step_rng = jax.random.split(rng)
                fits = self._kernel_dispatch_eligible() and \
                    batch_fits_kernel(self.model.spec,
                                      self.model.embed_dim, batch["x"])
                jb = self._place(batch)
                with self.step_timer.step(n_examples=int(batch["valid"].sum())):
                    params, state, opt_state, loss = self._train_step(
                        params, state, opt_state, jb, step_rng, fits)
                losses.append(loss)
        return params, state, opt_state, rng, mean_losses(losses)

    # HBM budget for the device-resident train split (v5e has 16 GB; the
    # full Amazon split is ~1.2 GB of int32)
    DEVICE_DATA_BUDGET = 4 * 2**30

    def device_data_enabled(self, train_x: np.ndarray) -> bool:
        return device_data_mode_enabled(self.config, self.mesh,
                                        train_x.nbytes,
                                        self.DEVICE_DATA_BUDGET)

    def _kernel_dispatch_eligible(self, lazy_counts: bool = True) -> bool:
        return kernel_dispatch_eligible(self.config, self.mesh,
                                        self.model.spec,
                                        self.model.embed_dim,
                                        lazy_counts=lazy_counts)

    def _build_epoch_fits(self):
        return build_fits_from_rows(self.model.spec, self.model.embed_dim)

    def _epoch_fits_kernel(self, dx, perm_dev) -> bool:
        """True iff the no-cond kernel dispatch is safe for EVERY step of
        this epoch's schedule (``perm_dev``: device [n_batches, bs])."""
        if not self._kernel_dispatch_eligible():
            return False
        if self._epoch_fits is None:
            self._epoch_fits = self._build_epoch_fits()
        return bool(self._epoch_fits(dx, perm_dev))

    # steps per device dispatch for the device-resident epoch. One dispatch
    # for the WHOLE epoch would be ideal, but a 17k-step scan runs >60 s on
    # device and this image's tunneled backend drops RPCs that long (the
    # TPU worker reports 'crashed or restarted'); ~8 s dispatches are safe
    # and the per-chunk scalar sync costs one tunnel round trip each.
    DEVICE_EPOCH_CHUNK = 2048

    def train_epoch_device(self, params, state, opt_state,
                           batcher: GlobalBatcher, rng):
        """train_epoch over the HBM-resident split: a handful of scan
        dispatches per epoch (see _build_epoch_scan). Numerically identical
        to train_epoch — same shuffle stream (batcher.epoch_perm advances
        the shared rng), same per-step rng chain, same padded-batch
        semantics; (params, rng) chain across chunks exactly as one scan."""
        if self._epoch_scan is None:
            self._epoch_scan = self._build_epoch_scan()
        # cache keyed on the host split's identity: a second fit() on new
        # data must not gather from the previous split's HBM copy. Hold the
        # host arrays themselves and compare with `is` — id() keys can be
        # recycled after garbage collection, which would silently reuse a
        # stale device copy for a new same-shape array.
        if (self._device_data is None
                or self._device_data[0] is not batcher.x
                or self._device_data[1] is not batcher.y):
            self._device_data = (batcher.x, batcher.y,
                                 jax.device_put(batcher.x),
                                 jax.device_put(batcher.y))
        _, _, dx, dy = self._device_data
        perm_np = batcher.epoch_perm()
        losses = []
        with profiling.trace():
            for lo in range(0, perm_np.shape[0], self.DEVICE_EPOCH_CHUNK):
                chunk = perm_np[lo:lo + self.DEVICE_EPOCH_CHUNK]
                perm = jax.device_put(jnp.asarray(chunk))
                fits = self._epoch_fits_kernel(dx, perm)
                n_ex = int(np.sum(chunk >= 0))
                with self.step_timer.step(n_examples=n_ex):
                    params, state, opt_state, rng, ls = self._epoch_scan(
                        params, state, opt_state, dx, dy, perm, rng, fits)
                    float(ls[-1])  # bound the tunnel RPC per chunk
                losses.append(ls)
        return params, state, opt_state, rng, mean_losses(losses)

    def evaluate(self, params, state, x: np.ndarray, y: np.ndarray,
                 domain_cnt_weight: np.ndarray) -> Dict:
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        # eval is BN-running-stats based, so batch size does not affect
        # predictions; 8x batches cut host->device dispatches (each costs
        # ~8-30 ms over this image's TPU tunnel) by 8x
        bs = self.config.bs * 8
        batcher = GlobalBatcher(x, y, bs, self.model.spec.domain_idx,
                                self.domain2group, shuffle=False)
        eval_mutates = getattr(self.model, "eval_dlm_update", False)
        self.eval_mutated_state = None
        if self.config.streaming_eval:
            # device-resident histogram AUC: predictions never leave the
            # device; only [n_domain, auc_bins] histograms cross the tunnel.
            # With --adl_eval_dlm_update the model state (DLM centers)
            # threads batch-to-batch through the accum step too (ADVICE
            # r4: the flag must not silently no-op under streaming eval).
            acc = metrics_lib.StreamingAUC(self.n_domain, self.config.auc_bins)
            if self._eval_accum_step is None:
                model = self.model
                is_multi_tower = self.is_multi_tower

                @jax.jit
                def accum(params, state, batch, auc_state):
                    variables = {"params": params, **state}
                    kwargs: Dict[str, Any] = {"train": False}
                    if "group" in batch:
                        kwargs["group"] = batch["group"]
                    if eval_mutates:
                        out, new_state = model.apply(
                            variables, batch["x"],
                            mutable=list(state.keys()), **kwargs)
                    else:
                        out = model.apply(variables, batch["x"], **kwargs)
                        new_state = state
                    prob, logit = out["prob"], out["logit"]
                    if is_multi_tower and prob.ndim == 2:
                        prob = gather_group(prob, batch["group"])
                        logit = gather_group(logit, batch["group"])
                    return acc.update(auc_state, prob, batch["y"],
                                      batch["domain"], batch["valid"],
                                      logits=logit), dict(new_state)
                self._eval_accum_step = accum
            auc_state = acc.init_state()
            for batch in batcher:
                jb = self._place(batch)
                auc_state, new_state = self._eval_accum_step(
                    params, state, jb, auc_state)
                if eval_mutates:
                    state = new_state
            if eval_mutates:
                self.eval_mutated_state = state
            return acc.finalize(auc_state, domain_cnt_weight,
                                multi_domain=self.config.is_evaluate_multi_domain)
        preds, targets, domains = [], [], []
        for batch in batcher:
            jb = self._place(batch)
            prob, new_state = self._eval_step(params, state, jb)
            prob = np.asarray(prob)
            if eval_mutates:
                state = new_state  # thread DLM centers batch-to-batch
            n = int(batch["valid"].sum())
            preds.append(prob[:n])
            targets.append(batch["y"][:n])
            domains.append(batch["domain"][:n])
        if eval_mutates:
            # surface the mutated centers so fit() carries them into the
            # next epoch, matching the reference's persistent mutation
            self.eval_mutated_state = state
        preds = np.concatenate(preds)
        targets = np.concatenate(targets)
        domains = np.concatenate(domains)
        return metrics_lib.full_evaluation(
            targets, preds, domains, domain_cnt_weight,
            multi_domain=self.config.is_evaluate_multi_domain)

    # ------------------------------------------------- dynamic regrouping
    def tower_domain_losses(self, params, state, x: np.ndarray,
                            y: np.ndarray) -> np.ndarray:
        """Per-(tower, domain) mean BCE of ALL tower heads on a split —
        the loss matrix train/regroup.regroup_all_domain consumes (the
        populated realization of the reference's always-empty
        train_loss_domain_group, run.py:73,539-550)."""
        from aread_tpu.train.regroup import get_losses_tower_domain

        model = self.model

        @jax.jit
        def all_tower_probs(params, state, batch):
            kwargs: Dict[str, Any] = {"train": False}
            if "group" in batch:
                kwargs["group"] = batch["group"]
            out = model.apply({"params": params, **state}, batch["x"],
                              **kwargs)
            return out["prob"]

        if self._all_tower_step is None:
            self._all_tower_step = all_tower_probs
        batcher = GlobalBatcher(x, y, self.config.bs * 8,
                                self.model.spec.domain_idx,
                                self.domain2group, shuffle=False)
        preds, targets, domains = [], [], []
        for batch in batcher:
            prob = np.asarray(self._all_tower_step(
                params, state, self._place(batch)))
            n = int(batch["valid"].sum())
            if prob.ndim == 1:  # single-head model: degenerate 1-tower
                prob = prob[:, None]
            preds.append(prob[:n])
            targets.append(batch["y"][:n])
            domains.append(batch["domain"][:n])
        n_tower = preds[0].shape[1]
        return get_losses_tower_domain(np.concatenate(preds),
                                       np.concatenate(targets),
                                       np.concatenate(domains),
                                       n_tower, self.n_domain)

    def apply_dynamic_regroup(self, params, state, valid_x, valid_y,
                              verbose: bool = True) -> bool:
        """Recompute domain->group from the valid-split loss matrix and
        swap it in for subsequent epochs (config.dynamic_regroup). Returns
        True when the assignment changed. The host batcher reads
        self.domain2group per batch; only the device epoch scan captured
        it at trace time, so that jit is dropped for a rebuild."""
        modes = tuple(m.strip() for m in
                      self.config.dynamic_regroup.split(",") if m.strip())
        if not modes or modes == ("off",):
            return False
        if not self.is_multi_tower or self.domain2group is None:
            raise ValueError(
                f"dynamic_regroup={self.config.dynamic_regroup!r} needs a "
                f"multi-tower model with a domain2group map "
                f"(model={self.model_name})")
        from aread_tpu.train.regroup import regroup_all_domain

        matrix = self.tower_domain_losses(params, state, valid_x, valid_y)
        selected = None
        if "served" in modes:
            # each tower pins the domain it currently serves best: argmin
            # of its own loss row over its currently assigned domains
            # (falling back to its global argmin if it serves none)
            n_tower = matrix.shape[0]
            cur = np.asarray(self.domain2group)
            selected = []
            for g in range(n_tower):
                mine = np.flatnonzero(cur == g)
                row = matrix[g]
                if mine.size and np.isfinite(row[mine]).any():
                    selected.append(int(mine[np.nanargmin(row[mine])]))
                else:
                    selected.append(int(np.nanargmin(row)))
        # NaN columns (domains absent from the split) keep their current
        # assignment instead of argmin-ing over NaNs
        safe = np.where(np.isnan(matrix), np.inf, matrix)
        new_d2g = regroup_all_domain(safe, modes, selected_domain=selected)
        nan_dom = np.isnan(matrix).all(axis=0)
        new_d2g = np.where(nan_dom, np.asarray(self.domain2group), new_d2g)
        changed = not np.array_equal(new_d2g, np.asarray(self.domain2group))
        if changed:
            if verbose:
                moved = int(np.sum(new_d2g != np.asarray(self.domain2group)))
                print(f"dynamic_regroup({','.join(modes)}): {moved} "
                      f"domain(s) reassigned")
            self.domain2group = new_d2g.astype(np.int64)
            self._epoch_scan = None  # captured the old d2g at trace time
        return changed

    def is_continuable(self, params, state, opt_state, result: Dict, epoch_i: int) -> bool:
        """Early stopping on mean_auc with patience (reference run.py:459-484)."""
        key = "mean_auc" if "mean_auc" in result and not np.isnan(result["mean_auc"]) \
            else "total_auc"
        best = self.best_mean_auc if key == "mean_auc" else self.best_auc
        self._improved = result[key] > best
        if result[key] > best:
            self.trial_counter = 0
            self.best_auc = result["total_auc"]
            self.best_loss = result["total_loss"]
            if "mean_auc" in result:
                self.best_mean_auc = result["mean_auc"]
                self.best_mean_loss = result.get("mean_loss", np.inf)
            # device-resident copy: avoids pushing ~190MB through the TPU
            # tunnel per improvement and preserves mesh shardings
            self.best_checkpoint = (
                jax.tree_util.tree_map(jnp.array, params),
                jax.tree_util.tree_map(jnp.array, state),
                epoch_i,
            )
            return True
        if self.trial_counter + 1 < self.config.early_stop:
            self.trial_counter += 1
            return True
        return False

    def fit(self, data: SplitData, rng=None, epochs: Optional[int] = None,
            verbose: bool = True, warm_start: Optional[Dict] = None,
            ckpt_dir: Optional[str] = None) -> Dict:
        """``warm_start``: a checkpoint dict (train.checkpoint.
        load_checkpoint) whose params/state replace the fresh init — the
        reference's is_increment restart (run.py:835-840; the optimizer
        starts fresh, matching a new Adam over loaded weights).

        ``ckpt_dir``: elastic-recovery directory. A full resumable
        checkpoint (params / BN state / optimizer state / RNG key / epoch /
        best metrics) is written there on every improvement — the
        reference's per-improvement torch.save (run.py:459-484) — and, when
        one already exists, training RESUMES from it at the saved epoch
        instead of starting over (batch shuffling restarts from the epoch
        boundary; step-exact replay within an epoch is not attempted)."""
        cfg = self.config
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        d2g = self.domain2group
        batcher = GlobalBatcher(data.train_x, data.train_y, cfg.bs,
                                data.spec.domain_idx, d2g, seed=cfg.seed)
        init_rng, rng = jax.random.split(rng)
        sample = batcher.sample_batch()  # shape-only; epoch stream untouched
        # resolve the a2a exchange capacity BEFORE any step is traced
        # (unconditional — internal no-op unless embed_lookup='a2a'):
        # auto-calibrates when unset, validates a manual bound, and covers
        # the 8x eval batches too (one static capacity serves every jit)
        from aread_tpu.parallel.embed_shard import resolve_a2a_capacity
        cfg.a2a_capacity = resolve_a2a_capacity(
            cfg, self.mesh, self.model.spec, self.model.embed_dim,
            [(data.train_x, cfg.bs), (data.valid_x, cfg.bs * 8),
             (data.test_x, cfg.bs * 8)], verbose=verbose)
        params, state, opt_state = self.init(init_rng, sample)
        if warm_start is not None:
            params = adopt_tree(params, warm_start["params"])
            if warm_start.get("state"):
                state = adopt_tree(state, warm_start["state"])

        start_epoch = 0
        if ckpt_dir and os.path.exists(os.path.join(ckpt_dir, "meta.json")):
            from aread_tpu.train.checkpoint import load_checkpoint
            ck = load_checkpoint(ckpt_dir, template={
                "params": params, "state": state, "opt_state": opt_state,
                "rng_key": np.asarray(rng)})
            params = adopt_tree(params, ck["params"])
            state = adopt_tree(state, ck["state"])
            opt_state = adopt_tree(opt_state, ck["opt_state"])
            rng = jnp.asarray(np.asarray(ck["rng_key"]))
            start_epoch = int(ck["epoch"])
            # replay the exact shuffle stream the uninterrupted run would
            # have used from this epoch (epoch-keyed permutations)
            batcher.set_epoch(start_epoch)
            best = ck.get("best_result") or {}
            self.best_auc = best.get("total_auc") or 0.0
            self.best_loss = best.get("total_loss") or np.inf
            self.best_mean_auc = best.get("mean_auc") or 0.0
            self.best_mean_loss = best.get("mean_loss") or np.inf
            self.best_checkpoint = (
                jax.tree_util.tree_map(jnp.array, params),
                jax.tree_util.tree_map(jnp.array, state), start_epoch - 1)
            if verbose:
                print(f"elastic resume from {ckpt_dir} at epoch {start_epoch}")

        from aread_tpu.utils.runlog import RunLogger
        logger = RunLogger(cfg.log_dir or None, config=cfg)

        device_data = self.device_data_enabled(data.train_x)
        history = []

        def run_epochs(params, state, opt_state, rng):
            from aread_tpu.parallel.health import epoch_deadline, watchdog
            for epoch_i in range(start_epoch,
                                 epochs if epochs is not None else cfg.epoch):
                t0 = time.time()
                with watchdog(epoch_deadline(cfg.epoch_timeout_s,
                                             cfg.epoch_timeout_first_mult),
                              tag=f"train_epoch{epoch_i}",
                              kill_process=cfg.epoch_timeout_kill):
                    if device_data:
                        params, state, opt_state, rng, train_loss = \
                            self.train_epoch_device(params, state, opt_state,
                                                    batcher, rng)
                    else:
                        params, state, opt_state, rng, train_loss = \
                            self.train_epoch(params, state, opt_state,
                                             batcher, rng)
                raise_if_nonfinite(train_loss, epoch_i, cfg)
                result = self.evaluate(params, state, data.valid_x,
                                       data.valid_y, data.domain_cnt_weight)
                if getattr(self, "eval_mutated_state", None) is not None:
                    state = self.eval_mutated_state  # --adl_eval_dlm_update
                result["train_loss"] = train_loss
                result["epoch_time_s"] = time.time() - t0
                result["examples_per_s"] = self.step_timer.summary()["examples_per_s"]
                history.append(result)
                logger.log({"valid": result}, step=epoch_i + 1)
                if verbose:
                    msg = (f"epoch {epoch_i + 1}: train_loss={train_loss:.4f} "
                           f"valid auc={result['total_auc']:.4f} loss={result['total_loss']:.4f}")
                    if "mean_auc" in result:
                        msg += f" mean_auc={result['mean_auc']:.4f}"
                    print(msg)
                cont = self.is_continuable(params, state, opt_state, result, epoch_i)
                if cont and self.config.dynamic_regroup != "off":
                    # between-epoch domain->group reassignment from the
                    # valid loss matrix (config.dynamic_regroup); the host
                    # batcher reads the trainer's map per batch
                    if self.apply_dynamic_regroup(params, state,
                                                  data.valid_x, data.valid_y,
                                                  verbose=verbose):
                        batcher.domain2group = self.domain2group
                if ckpt_dir and self._improved:
                    from aread_tpu.train.checkpoint import save_checkpoint
                    save_checkpoint(ckpt_dir, params, state, opt_state,
                                    epoch=epoch_i + 1, best_result=result,
                                    rng_key=np.asarray(rng))
                if not cont:
                    break
            return params, state, opt_state, rng

        try:
            params, state, opt_state, rng = run_epochs(params, state,
                                                       opt_state, rng)
        finally:
            # release the HBM split copy (~1.2 GB at Amazon scale) even on
            # watchdog/eval failures — a restarted fit or post-fit serving
            # must not find it pinned
            self._device_data = None

        if self.best_checkpoint is not None:
            best_params, best_state, _ = self.best_checkpoint
            params = jax.tree_util.tree_map(jnp.asarray, best_params)
            state = jax.tree_util.tree_map(jnp.asarray, best_state)
        test_result = self.evaluate(params, state, data.test_x, data.test_y,
                                    data.domain_cnt_weight)
        logger.log({"test": test_result})
        logger.close()
        return {"history": history, "test": test_result,
                "params": params, "state": state}
