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
