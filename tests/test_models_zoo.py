"""Forward-pass and one-step-train tests for the multi-domain zoo:
PLE, PEPNet/EPNet/EPNet-single, STAR, HiNet, AdaSparse, ADL, MAMDR."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aread_tpu.config import Config
from aread_tpu.data.loader import GlobalBatcher
from aread_tpu.models import (ADL, MAMDR, PLE, STAR, AdaSparse, HiNet, PEPNet)
from aread_tpu.train.trainer import Trainer


def _att_small():
    return dict(att_layer_num=1, atten_embed_dim=8, att_head_num=2)


def _models(spec):
    return {
        "ple": PLE(spec=spec, embed_dim=8, n_tower=3, expert_dims=((16,), (8,)),
                   tower_dims=(8,), **_att_small()),
        "pepnet": PEPNet(spec=spec, embed_dim=8, n_tower=3, tower_dims=(16, 8),
                         use_ppnet=True, **_att_small()),
        "epnet": PEPNet(spec=spec, embed_dim=8, n_tower=3, tower_dims=(16, 8),
                        use_ppnet=False, **_att_small()),
        "epnet-single": PEPNet(spec=spec, embed_dim=8, n_tower=1, tower_dims=(16, 8),
                               use_ppnet=False, **_att_small()),
        "star": STAR(spec=spec, embed_dim=8, n_tower=3, tower_dims=(16, 8),
                     **_att_small()),
        "hinet": HiNet(spec=spec, embed_dim=8, n_tower=3, sei_dims=(16, 8),
                       tower_dims=(16, 8), **_att_small()),
        "adasparse": AdaSparse(spec=spec, embed_dim=8, hidden_dims=(16, 8),
                               **_att_small()),
        "adl": ADL(spec=spec, embed_dim=8, n_tower=3, tower_dims=(16, 8),
                   **_att_small()),
        "mamdr": MAMDR(spec=spec, embed_dim=8, mlp_dims=(16, 8)),
    }


EXPECTED_SHAPES = {
    "ple": (16, 3), "pepnet": (16, 3), "epnet": (16, 3), "epnet-single": (16,),
    "star": (16, 3), "hinet": (16,), "adasparse": (16,), "adl": (16,),
    "mamdr": (16,),
}


@pytest.mark.parametrize("name", list(EXPECTED_SHAPES))
def test_zoo_forward_shapes(synthetic_data, name):
    data = synthetic_data
    model = _models(data.spec)[name]
    x = jnp.asarray(data.train_x[:16])
    group = jnp.asarray((data.train_x[:16, data.spec.domain_idx] % 3).astype(np.int32))
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                     "dropout": jax.random.PRNGKey(1)}, x, group)

    def fwd(v, x, g):
        return model.apply(v, x, group=g)

    out = jax.jit(fwd)(variables, x, group)
    assert out["logit"].shape == EXPECTED_SHAPES[name], name
    p = np.asarray(out["prob"])
    assert np.isfinite(p).all() and ((p >= 0) & (p <= 1)).all()


@pytest.mark.parametrize("name", ["ple", "pepnet", "star", "hinet", "adl"])
def test_zoo_one_train_step(synthetic_data, name):
    data = synthetic_data
    model = _models(data.spec)[name]
    d2g = np.array([0, 1, 2, 0])
    cfg = Config(model=name, bs=128, lr=1e-3, embed_dim=8)
    trainer = Trainer(model, cfg, data.n_domain, domain2group=d2g)
    batcher = GlobalBatcher(data.train_x[:256], data.train_y[:256], 128,
                            data.spec.domain_idx, d2g)
    params, state, opt = trainer.init(jax.random.PRNGKey(0), next(iter(batcher)))
    params, state, opt, _, loss = trainer.train_epoch(
        params, state, opt, batcher, jax.random.PRNGKey(1))
    assert np.isfinite(loss), name


def test_adl_updates_cluster_state(synthetic_data):
    data = synthetic_data
    model = _models(data.spec)["adl"]
    cfg = Config(model="adl", bs=128, embed_dim=8)
    d2g = np.array([0, 1, 2, 0])
    trainer = Trainer(model, cfg, data.n_domain, domain2group=d2g)
    batcher = GlobalBatcher(data.train_x[:256], data.train_y[:256], 128,
                            data.spec.domain_idx, d2g)
    params, state, opt = trainer.init(jax.random.PRNGKey(0), next(iter(batcher)))
    before = np.asarray(state["model_state"]["cluster_centers"])
    params, state, opt, _, _ = trainer.train_epoch(
        params, state, opt, batcher, jax.random.PRNGKey(1))
    after = np.asarray(state["model_state"]["cluster_centers"])
    assert not np.allclose(before, after)
    # centers stay L2-normalized (adl.py:73-77)
    np.testing.assert_allclose(np.linalg.norm(after, axis=1), 1.0, rtol=1e-5)


def test_adl_eval_dlm_update_flag(synthetic_data):
    """--adl_eval_dlm_update replicates the reference's eval-time DLM
    center mutation (adl.py:61-77): centers must change across an eval
    pass and the trainer must surface the mutated state; the default
    (pure eval) must leave them bit-identical."""
    from aread_tpu.models import ADL

    data = synthetic_data
    d2g = np.array([0, 1, 2, 0])
    for flag in (False, True):
        model = ADL(spec=data.spec, embed_dim=8, n_tower=3,
                    tower_dims=(16, 8), att_layer_num=1, atten_embed_dim=8,
                    eval_dlm_update=flag)
        cfg = Config(model="adl", bs=128, embed_dim=8,
                     adl_eval_dlm_update=flag)
        trainer = Trainer(model, cfg, data.n_domain, domain2group=d2g)
        batcher = GlobalBatcher(data.train_x[:256], data.train_y[:256], 128,
                                data.spec.domain_idx, d2g)
        params, state, opt = trainer.init(jax.random.PRNGKey(0),
                                          next(iter(batcher)))
        before = np.asarray(state["model_state"]["cluster_centers"])
        trainer.evaluate(params, state, data.valid_x[:256],
                         data.valid_y[:256], data.domain_cnt_weight)
        mutated = trainer.eval_mutated_state
        if flag:
            after = np.asarray(mutated["model_state"]["cluster_centers"])
            assert not np.allclose(before, after)
            np.testing.assert_allclose(np.linalg.norm(after, axis=1), 1.0,
                                       rtol=1e-5)
        else:
            assert mutated is None


def test_adl_eval_dlm_update_streaming(synthetic_data):
    """--adl_eval_dlm_update must also mutate DLM centers under
    --streaming_eval (ADVICE r4: the accum path previously skipped the
    mutable apply, silently no-op'ing the flag)."""
    from aread_tpu.models import ADL

    data = synthetic_data
    d2g = np.array([0, 1, 2, 0])
    model = ADL(spec=data.spec, embed_dim=8, n_tower=3,
                tower_dims=(16, 8), att_layer_num=1, atten_embed_dim=8,
                eval_dlm_update=True)
    cfg = Config(model="adl", bs=128, embed_dim=8, adl_eval_dlm_update=True,
                 streaming_eval=True)
    trainer = Trainer(model, cfg, data.n_domain, domain2group=d2g)
    batcher = GlobalBatcher(data.train_x[:256], data.train_y[:256], 128,
                            data.spec.domain_idx, d2g)
    params, state, opt = trainer.init(jax.random.PRNGKey(0),
                                      next(iter(batcher)))
    before = np.asarray(state["model_state"]["cluster_centers"])
    res = trainer.evaluate(params, state, data.valid_x[:256],
                           data.valid_y[:256], data.domain_cnt_weight)
    assert np.isfinite(res["total_auc"])
    mutated = trainer.eval_mutated_state
    assert mutated is not None
    after = np.asarray(mutated["model_state"]["cluster_centers"])
    assert not np.allclose(before, after)


def test_star_weight_product_effect(synthetic_data):
    """Zeroing the shared kernel must zero every domain tower's pre-BN
    output (weight product, star.py:82-94)."""
    data = synthetic_data
    model = _models(data.spec)["star"]
    x = jnp.asarray(data.train_x[:8])
    group = jnp.zeros((8,), jnp.int32)
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                     "dropout": jax.random.PRNGKey(1)}, x, group)
    params = variables["params"]
    zeroed = jax.tree_util.tree_map(lambda v: v, params)
    zeroed = dict(params)
    zeroed["shared_dnn_linear_kernel"] = jnp.zeros_like(params["shared_dnn_linear_kernel"])
    out = model.apply({**variables, "params": zeroed}, x, group=group)
    # with the product kernel zeroed, tower logits collapse to bias + side
    # terms identical across towers
    lg = np.asarray(out["logit"])
    assert np.allclose(lg[:, 0] - lg[:, 1], (lg[:, 0] - lg[:, 1])[0], atol=1e-5)
