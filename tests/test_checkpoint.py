"""Checkpoint/resume round-trip tests (reference run.py:459-484, 835-840)."""

import os
import tempfile

import jax
import numpy as np
import pytest

from aread_tpu.config import Config
from aread_tpu.data.loader import GlobalBatcher, make_synthetic_data
from aread_tpu.models.deepfm import DeepFM
from aread_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from aread_tpu.train.trainer import Trainer
from aread_tpu.utils.masks import create_single_full_mask, mask_shapes


def test_checkpoint_roundtrip_params_and_masks():
    data = make_synthetic_data(n_rows=256, n_domain=3, vocab=40, seed=0)
    cfg = Config(bs=128, embed_dim=8)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
    trainer = Trainer(model, cfg, data.n_domain)
    batcher = GlobalBatcher(data.train_x, data.train_y, 128, data.spec.domain_idx)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0), next(iter(batcher)))

    rng = np.random.default_rng(0)
    masks = [create_single_full_mask((2, 4), 0.5, rng) for _ in range(3)]
    hemp = {"random_modify_sigma": 0.19, "init_active_percent": 0.6,
            "candidate_mask_num": 9.8, "regroup_times": 3}

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt")
        save_checkpoint(path, params, state, opt_state, epoch=4,
                        best_result={"total_auc": 0.7, "mean_auc": 0.65},
                        domain_mask=masks, hemp_schedule=hemp,
                        rng_key=jax.random.PRNGKey(7))
        out = load_checkpoint(path, n_domain=3)

    assert out["epoch"] == 4
    assert abs(out["best_result"]["total_auc"] - 0.7) < 1e-9
    assert out["hemp_schedule"]["regroup_times"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(out["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for d in range(3):
        for m1, m2 in zip(masks[d], out["domain_mask"][d]):
            np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(np.asarray(out["rng_key"]),
                                  np.asarray(jax.random.PRNGKey(7)))


def test_checkpoint_resume_continues_training():
    """Save mid-training, restore, one more step runs with restored opt
    state (the reference's is_increment warm start, run.py:835-840)."""
    data = make_synthetic_data(n_rows=256, n_domain=3, vocab=40, seed=1)
    cfg = Config(bs=128, embed_dim=8, lr=1e-2)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
    trainer = Trainer(model, cfg, data.n_domain)
    batcher = GlobalBatcher(data.train_x, data.train_y, 128, data.spec.domain_idx)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0), next(iter(batcher)))
    params, state, opt_state, _, loss1 = trainer.train_epoch(
        params, state, opt_state, batcher, jax.random.PRNGKey(1))

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt")
        save_checkpoint(path, params, state, opt_state, epoch=1)
        out = load_checkpoint(path)

    import jax.numpy as jnp
    p2 = jax.tree_util.tree_map(jnp.asarray, out["params"])
    s2 = jax.tree_util.tree_map(jnp.asarray, out["state"])
    # optax tree structure must be restored to the same pytree type
    o2 = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(opt_state),
        [jnp.asarray(x) for x in jax.tree_util.tree_leaves(out["opt_state"])])
    p2, s2, o2, _, loss2 = trainer.train_epoch(p2, s2, o2, batcher,
                                               jax.random.PRNGKey(2))
    assert np.isfinite(loss2) and loss2 < loss1 * 1.5


def test_fit_warm_start_adopts_checkpoint_params():
    """fit(warm_start=ckpt) trains from the checkpointed weights, not a
    fresh init (the is_increment restart, reference run.py:835-840)."""
    data = make_synthetic_data(n_rows=256, n_domain=3, vocab=40, seed=2)
    cfg = Config(bs=128, embed_dim=8, epoch=1, dropout=0.0)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))

    tr1 = Trainer(model, cfg, data.n_domain)
    r1 = tr1.fit(data, epochs=1, verbose=False)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt")
        save_checkpoint(path, r1["params"], r1["state"], opt_state={},
                        epoch=1)
        ws = load_checkpoint(path)

        tr2 = Trainer(model, cfg, data.n_domain)
        r2 = tr2.fit(data, epochs=0, verbose=False, warm_start=ws)

    # epochs=0: no training steps, so the returned params ARE the warm
    # start — identical to the checkpoint
    for a, b in zip(jax.tree_util.tree_leaves(r1["params"]),
                    jax.tree_util.tree_leaves(r2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and its eval equals the first run's test eval
    assert abs(r1["test"]["total_auc"] - r2["test"]["total_auc"]) < 1e-9
