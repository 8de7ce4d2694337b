"""MAMDR Reptile meta-training tests."""

import jax.numpy as jnp
import numpy as np

from aread_tpu.config import Config
from aread_tpu.data.loader import make_synthetic_data
from aread_tpu.models.mamdr import MAMDR
from aread_tpu.train.mamdr import MamdrTrainer, reptile_update, tree_add


def test_reptile_update_math():
    u = {"w": jnp.ones((2,))}
    new = {"w": jnp.full((2,), 3.0)}
    old = {"w": jnp.full((2,), 1.0)}
    out = reptile_update(u, new, old, meta_lr=0.5)
    np.testing.assert_allclose(np.asarray(out["w"]), [2.0, 2.0])


def test_mamdr_meta_epoch_runs():
    data = make_synthetic_data(n_rows=512, n_domain=3, vocab=50, seed=3)
    cfg = Config(model="mamdr", bs=128, lr=1e-3, embed_dim=8,
                 mamdr_meta_lr=0.1, mamdr_aux_sample_num=1, epoch=1)
    model = MAMDR(spec=data.spec, embed_dim=8, mlp_dims=(16, 8))
    trainer = MamdrTrainer(model, cfg, data.n_domain)
    result = trainer.fit(data, epochs=1, verbose=False)
    assert np.isfinite(result["test"]["total_auc"])
    # specific weights diverged from zero-delta
    delta = result["domain_weights"][0]["mlp"]["linear_0"]["kernel"]
    base = trainer.meta_weights["mlp"]["linear_0"]["kernel"]
    merged = tree_add(result["meta_weights"], result["domain_weights"][0])
    assert not np.allclose(np.asarray(merged["mlp"]["linear_0"]["kernel"]),
                           np.asarray(base))
