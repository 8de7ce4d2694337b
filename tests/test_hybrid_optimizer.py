"""Hybrid optimizer (Pallas fused table Adam + optax rest) equivalence.

The hybrid path must produce the SAME parameters as the pure-optax path
with the embedding-L2 term in the loss — torch semantics:
grad(loss + l2*||w||^2) + wd*w == grad(loss) + (2*l2 + wd)*w.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aread_tpu.data.loader import make_synthetic_data
from aread_tpu.models.base import regularization_loss
from aread_tpu.models.deepfm import DeepFM
from aread_tpu.train.trainer import (bce_with_logits, hybrid_init,
                                     hybrid_update, make_optimizer,
                                     masked_mean, split_variables,
                                     strip_table_rule, table_reg_value)


def test_hybrid_matches_pure_optax_multi_step():
    data = make_synthetic_data(n_rows=256, n_domain=3, vocab=50, seed=0)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,), dropout=0.0)
    x = jnp.asarray(data.train_x[:64])
    y = jnp.asarray(data.train_y[:64].astype(np.float32))
    valid = jnp.ones((64,), jnp.float32)

    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)}, x, train=False)
    params, state = split_variables(variables)
    lr, wd = 1e-2, 1e-8
    opt = make_optimizer(lr, wd)

    full_rules = DeepFM.REG_RULES
    rest_rules = strip_table_rule(full_rules)

    def loss_pure(p):
        out, _ = model.apply({"params": p, **state}, x, train=True, mask=valid,
                             mutable=list(state.keys()),
                             rngs={"dropout": jax.random.PRNGKey(1)})
        bce = masked_mean(bce_with_logits(out["logit"], y), valid)
        return bce + regularization_loss(p, full_rules)

    def loss_hybrid(p):
        out, _ = model.apply({"params": p, **state}, x, train=True, mask=valid,
                             mutable=list(state.keys()),
                             rngs={"dropout": jax.random.PRNGKey(1)})
        bce = masked_mean(bce_with_logits(out["logit"], y), valid)
        return bce + regularization_loss(p, rest_rules) \
            + table_reg_value(p["embedding"]["table"])

    # pure optax path
    p1 = params
    os1 = opt.init(p1)
    # hybrid path
    p2 = jax.tree_util.tree_map(jnp.array, params)
    os2 = hybrid_init(opt, p2)

    for step in range(4):
        l1, g1 = jax.value_and_grad(loss_pure)(p1)
        updates, os1 = opt.update(g1, os1, p1)
        p1 = optax.apply_updates(p1, updates)

        l2_, g2 = jax.value_and_grad(loss_hybrid)(p2)
        p2, os2 = hybrid_update(opt, lr, wd, p2, g2, os2)

        # identical reported loss (reg value included via stop_gradient)
        np.testing.assert_allclose(float(l1), float(l2_), rtol=1e-6)

    # Leaves with ~zero gradient (a Linear bias directly followed by
    # BatchNorm is a no-op parameter: BN subtracts the mean) are excluded:
    # Adam's g/sqrt(v) on noise-level gradients amplifies float rounding
    # chaotically in BOTH paths — the same degeneracy exists in the torch
    # reference. All meaningful leaves must match to float precision.
    _, g_final = jax.value_and_grad(loss_pure)(p1)
    key = lambda kv: str(kv[0])
    for (k1, a), (k2, b), (_, g) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(p1), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(p2), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(g_final), key=key)):
        if float(jnp.max(jnp.abs(g))) < 1e-6:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, err_msg=str(k1))


def test_trainer_uses_hybrid_state():
    """Trainer.init returns the hybrid opt-state layout and training runs."""
    from aread_tpu.config import Config
    from aread_tpu.data.loader import GlobalBatcher
    from aread_tpu.train.trainer import Trainer

    data = make_synthetic_data(n_rows=256, n_domain=3, vocab=40, seed=1)
    cfg = Config(bs=128, embed_dim=8)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
    trainer = Trainer(model, cfg, data.n_domain)
    batcher = GlobalBatcher(data.train_x, data.train_y, 128, data.spec.domain_idx)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0),
                                            next(iter(batcher)))
    assert set(opt_state.keys()) == {"inner", "m", "v", "t"}
    assert opt_state["m"].shape == params["embedding"]["table"].shape
    params, state, opt_state, _, loss = trainer.train_epoch(
        params, state, opt_state, batcher, jax.random.PRNGKey(1))
    assert np.isfinite(loss)
    assert int(opt_state["t"]) == len(list(iter(batcher)))


def test_grad_clip_norm_scales_update():
    """clip_norm semantics (torch clip_grad_norm_): a clipped hybrid
    update must equal the unclipped update fed pre-scaled gradients; a
    clip above the norm must be a no-op. Covers both the dense and the
    sparse (ids, rows) update paths."""
    from aread_tpu.train.trainer import (clip_scale_by_global_norm,
                                         hybrid_update_sparse)

    data = make_synthetic_data(n_rows=256, n_domain=3, vocab=50, seed=1)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,), dropout=0.0)
    x = jnp.asarray(data.train_x[:64])
    y = jnp.asarray(data.train_y[:64].astype(np.float32))
    valid = jnp.ones((64,), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(0)}, x, train=False)
    params, state = split_variables(variables)
    opt = make_optimizer(1e-2, 1e-8)

    def loss(p):
        out, _ = model.apply({"params": p, **state}, x, train=True,
                             mask=valid, mutable=list(state.keys()),
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return masked_mean(bce_with_logits(out["logit"], y), valid)

    grads = jax.grad(loss)(params)
    clip = 0.01  # far below the actual norm so clipping engages
    scale = clip_scale_by_global_norm([grads], clip)
    assert float(scale) < 1.0
    pre_scaled = jax.tree_util.tree_map(lambda g: g * scale, grads)

    os0 = hybrid_init(opt, params)
    p_clip, _ = hybrid_update(opt, 1e-2, 1e-8, params, grads,
                              jax.tree_util.tree_map(jnp.array, os0),
                              clip_norm=clip)
    p_manual, _ = hybrid_update(opt, 1e-2, 1e-8, params, pre_scaled,
                                jax.tree_util.tree_map(jnp.array, os0))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-7),
        p_clip, p_manual)
    # clip far above the norm: identical to no clipping
    p_noop, _ = hybrid_update(opt, 1e-2, 1e-8, params, grads,
                              jax.tree_util.tree_map(jnp.array, os0),
                              clip_norm=1e6)
    p_ref, _ = hybrid_update(opt, 1e-2, 1e-8, params, grads,
                             jax.tree_util.tree_map(jnp.array, os0))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-7),
        p_noop, p_ref)

    # sparse path: clipped sparse update == unclipped with scaled inputs
    ids = jnp.arange(64, dtype=jnp.int32).reshape(8, 8)
    rows = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 8, 8)), jnp.float32)
    from aread_tpu.train.trainer import split_table
    _, g_rest = split_table(grads)
    n_rows = int(np.sum(data.spec.one_hot_dims))
    s2 = clip_scale_by_global_norm([g_rest, rows.reshape(-1, 8)], clip)
    ps1, _ = hybrid_update_sparse(
        opt, 1e-2, 1e-8, params, g_rest, ids, rows,
        jax.tree_util.tree_map(jnp.array, os0),
        table_shape=(n_rows, 8), clip_norm=clip)
    ps2, _ = hybrid_update_sparse(
        opt, 1e-2, 1e-8, params,
        jax.tree_util.tree_map(lambda g: g * s2, g_rest), ids, rows * s2,
        jax.tree_util.tree_map(jnp.array, os0), table_shape=(n_rows, 8))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-7),
        ps1, ps2)

    # DUPLICATE ids (ADVICE r4): the sparse clip factor must equal
    # torch's over the dense cotangent, i.e. duplicates' row grads sum
    # BEFORE the norm. With all rows positively aligned, the naive
    # per-row sum under-counts the norm, so this distinguishes the two.
    dup_ids = jnp.zeros((8, 8), jnp.int32)  # every gather hits row 0
    dup_rows = jnp.ones((8, 8, 8), jnp.float32)
    from aread_tpu.ops.sparse_adam import dedup_rows
    gsum_d = dedup_rows(dup_ids.reshape(-1), dup_rows.reshape(-1, 8),
                        n_rows)[1]
    s_dense = clip_scale_by_global_norm([g_rest, gsum_d], clip)
    pd1, _ = hybrid_update_sparse(
        opt, 1e-2, 1e-8, params, g_rest, dup_ids, dup_rows,
        jax.tree_util.tree_map(jnp.array, os0),
        table_shape=(n_rows, 8), clip_norm=clip)
    pd2, _ = hybrid_update_sparse(
        opt, 1e-2, 1e-8, params,
        jax.tree_util.tree_map(lambda g: g * s_dense, g_rest), dup_ids,
        dup_rows * s_dense, jax.tree_util.tree_map(jnp.array, os0),
        table_shape=(n_rows, 8))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-7),
        pd1, pd2)
    # and the naive per-row norm would have produced a DIFFERENT factor
    s_naive = clip_scale_by_global_norm([g_rest, dup_rows.reshape(-1, 8)],
                                        clip)
    assert abs(float(s_dense) - float(s_naive)) > 1e-6
