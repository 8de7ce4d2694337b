"""Forward-shape and train-smoke tests for the single-output model family
(DeepFM, DCN, DCNv2, AutoInt) and the first multi-tower model (MMoE)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aread_tpu.config import Config
from aread_tpu.data.loader import GlobalBatcher, make_synthetic_data
from aread_tpu.models.autoint import AutoInt
from aread_tpu.models.dcn import DCN
from aread_tpu.models.dcnv2 import DCNv2
from aread_tpu.models.deepfm import DeepFM
from aread_tpu.models.mmoe import MMoE
from aread_tpu.train.trainer import Trainer


def _small_models(spec):
    return [
        DeepFM(spec=spec, embed_dim=8, mlp_dims=(16, 8)),
        DCN(spec=spec, embed_dim=8, mlp_dims=(16, 8)),
        DCNv2(spec=spec, embed_dim=8, mlp_dims=(16, 8), low_rank=4, num_experts=2),
        AutoInt(spec=spec, embed_dim=8, atten_embed_dim=16, att_layer_num=2,
                mlp_dims=(16, 8)),
    ]


def test_single_output_models_forward(synthetic_data):
    data = synthetic_data
    x = jnp.asarray(data.train_x[:32])
    for model in _small_models(data.spec):
        variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                         "dropout": jax.random.PRNGKey(1)}, x)
        out = jax.jit(model.apply)(variables, x)
        assert out["logit"].shape == (32,), type(model).__name__
        assert out["prob"].shape == (32,)
        p = np.asarray(out["prob"])
        assert ((p >= 0) & (p <= 1)).all()


def test_mmoe_forward_multi_tower(synthetic_data):
    data = synthetic_data
    model = MMoE(spec=data.spec, embed_dim=8, n_tower=3,
                 expert_dims=(16, 8), tower_dims=(8, 4),
                 att_layer_num=1, atten_embed_dim=8)
    x = jnp.asarray(data.train_x[:16])
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                     "dropout": jax.random.PRNGKey(1)}, x)
    out = jax.jit(model.apply)(variables, x)
    assert out["logit"].shape == (16, 3)


def test_deepfm_learns_synthetic(synthetic_data):
    """End-to-end: loss decreases and AUC beats chance on learnable data."""
    data = synthetic_data
    cfg = Config(model="deepfm", bs=256, lr=1e-2, epoch=2, embed_dim=8,
                 is_evaluate_multi_domain=True)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(32, 16))
    trainer = Trainer(model, cfg, data.n_domain)
    result = trainer.fit(data, epochs=12, verbose=False)
    assert result["test"]["total_auc"] > 0.62, result["test"]
    assert np.isfinite(result["history"][0]["train_loss"])


def test_mmoe_trains_with_group_gather(synthetic_data):
    data = synthetic_data
    d2g = np.array([0, 1, 2, 0])  # 4 domains -> 3 groups
    cfg = Config(model="mmoe", bs=256, lr=1e-2, embed_dim=8)
    model = MMoE(spec=data.spec, embed_dim=8, n_tower=3,
                 expert_dims=(16, 8), tower_dims=(8, 4),
                 att_layer_num=1, atten_embed_dim=8)
    trainer = Trainer(model, cfg, data.n_domain, domain2group=d2g)
    result = trainer.fit(data, epochs=4, verbose=False)
    assert result["test"]["total_auc"] > 0.55


def test_padded_batch_does_not_affect_loss(synthetic_data):
    """Training on a ragged final batch must mask pad rows out of the loss."""
    data = synthetic_data
    cfg = Config(bs=300, lr=1e-3, embed_dim=8)  # 2048*0.8=1638 -> ragged
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
    trainer = Trainer(model, cfg, data.n_domain)
    batcher = GlobalBatcher(data.train_x, data.train_y, 300, data.spec.domain_idx)
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0), next(iter(batcher)))
    params, state, opt_state, _, loss = trainer.train_epoch(
        params, state, opt_state, batcher, jax.random.PRNGKey(1))
    assert np.isfinite(loss)


def test_build_model_n_tower_capped_by_n_domain():
    """ADVICE r1: a dataset with fewer domains than the 3-group fallback
    must not build empty towers (config.py n_tower fallback)."""
    from aread_tpu.config import Config
    from aread_tpu.data.loader import make_synthetic_data
    from aread_tpu.models import build_model

    data = make_synthetic_data(n_rows=64, n_domain=2, seed=0)
    cfg = Config(model="mmoe", dataset_name="cloudtheme", embed_dim=8)
    assert cfg.n_tower == 3  # the config-level upper bound is unchanged
    model = build_model(cfg, data.spec, n_domain=2)
    assert model.n_tower == 2
