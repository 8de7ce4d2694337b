"""Device-resident epoch path (config.device_data): one on-device scan per
epoch over an HBM-resident train split must be numerically equivalent to
the host-staged chunked path (same shuffle stream, same rng chain, same
padded-batch semantics). Covers single-output + multi-tower (group-gather)
models and ragged tail batches."""

import dataclasses

import jax
import numpy as np
import pytest

from aread_tpu.config import Config
from aread_tpu.data.loader import GlobalBatcher, make_synthetic_data
from aread_tpu.models.deepfm import DeepFM
from aread_tpu.models.mmoe import MMoE
from aread_tpu.train.trainer import Trainer


def _fit_params(model, data, cfg, device_data: str, epochs: int = 2):
    cfg = dataclasses.replace(cfg, device_data=device_data)
    trainer = Trainer(model, cfg, data.n_domain,
                      domain2group=np.asarray(
                          [d % 3 for d in range(data.n_domain)])
                      if cfg.model == "mmoe" else None)
    out = trainer.fit(data, epochs=epochs, verbose=False)
    return out


@pytest.mark.parametrize("model_name", ["deepfm", "mmoe"])
def test_device_epoch_matches_host_path(model_name):
    # bs=192 over 1638 train rows -> ragged tail batch exercises padding
    data = make_synthetic_data(n_rows=2048, n_domain=4, seed=3)
    cfg = Config(model=model_name, bs=192, lr=1e-2, epoch=2, embed_dim=8,
                 is_evaluate_multi_domain=True)
    if model_name == "deepfm":
        mk = lambda: DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16, 8))
    else:
        mk = lambda: MMoE(spec=data.spec, embed_dim=8, n_tower=3,
                          expert_dims=(16, 8), tower_dims=(8, 4),
                          att_layer_num=1, atten_embed_dim=8)
    host = _fit_params(mk(), data, cfg, device_data="0")
    dev = _fit_params(mk(), data, cfg, device_data="1")

    flat_h = jax.tree_util.tree_leaves(host["params"])
    flat_d = jax.tree_util.tree_leaves(dev["params"])
    for a, b in zip(flat_h, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert host["test"]["total_auc"] == pytest.approx(
        dev["test"]["total_auc"], abs=1e-5)


def test_device_data_auto_budget():
    data = make_synthetic_data(n_rows=512, n_domain=3, seed=0)
    cfg = Config(model="deepfm", bs=128, embed_dim=8)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(8,))
    tr = Trainer(model, cfg, data.n_domain)
    assert tr.device_data_enabled(data.train_x)  # tiny split -> auto on
    huge = np.lib.stride_tricks.as_strided(
        np.zeros(1, np.int32), shape=(2 ** 28, 17), strides=(0, 0))
    assert not tr.device_data_enabled(huge)  # over budget -> off

    cfg0 = dataclasses.replace(cfg, device_data="0")
    assert not Trainer(model, cfg0, data.n_domain).device_data_enabled(
        data.train_x)


def test_device_data_cache_invalidated_across_fits():
    """fit() on new data must not gather from a previous split's HBM copy
    (and fit releases the copy afterwards)."""
    cfg = Config(model="deepfm", bs=128, epoch=1, embed_dim=8,
                 device_data="1")
    data_a = make_synthetic_data(n_rows=512, n_domain=3, seed=1)
    model = DeepFM(spec=data_a.spec, embed_dim=8, mlp_dims=(8,))
    tr = Trainer(model, cfg, data_a.n_domain)
    tr.fit(data_a, epochs=1, verbose=False)
    assert tr._device_data is None  # released after fit
    # second fit on a different (larger) split with the same spec
    data_b = make_synthetic_data(n_rows=1024, n_domain=3, seed=2)
    out = tr.fit(data_b, epochs=1, verbose=False)
    assert np.isfinite(out["test"]["total_auc"])


def test_device_data_mesh_force_raises():
    import jax
    from jax.sharding import Mesh

    data = make_synthetic_data(n_rows=256, n_domain=3, seed=0)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(8,))
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1), ("data", "model"))
    cfg = dataclasses.replace(Config(model="deepfm", bs=128, embed_dim=8),
                              device_data="1")
    tr = Trainer(model, cfg, data.n_domain, mesh=mesh)
    with pytest.raises(ValueError):
        tr.device_data_enabled(data.train_x)
    # auto on a mesh: silently off, no error
    cfg2 = dataclasses.replace(cfg, device_data="auto")
    assert not Trainer(model, cfg2, data.n_domain,
                       mesh=mesh).device_data_enabled(data.train_x)


def test_device_epoch_chunked_matches_single_chunk():
    """DEVICE_EPOCH_CHUNK-bounded dispatches must chain (params, rng)
    exactly like one whole-epoch scan (tunnel RPC-length safety must not
    change numerics)."""
    data = make_synthetic_data(n_rows=1024, n_domain=3, seed=5)
    cfg = Config(model="deepfm", bs=128, lr=1e-2, epoch=2, embed_dim=8,
                 device_data="1")

    def run(chunk):
        model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16, 8))
        tr = Trainer(model, cfg, data.n_domain)
        tr.DEVICE_EPOCH_CHUNK = chunk
        return tr.fit(data, epochs=2, verbose=False)

    big = run(10_000)   # whole epoch in one dispatch
    small = run(3)      # 3-step dispatches with a ragged tail
    for a, b in zip(jax.tree_util.tree_leaves(big["params"]),
                    jax.tree_util.tree_leaves(small["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_fits_matches_host_predicate():
    """The on-device whole-epoch kernel-window precheck must compute the
    same predicate as the host steps_fit_kernel (distinct table rows per
    flat block <= PAD_W, per step)."""
    from aread_tpu.ops.embedding import compute_offsets
    from aread_tpu.ops.sparse_adam import steps_fit_kernel

    data = make_synthetic_data(n_rows=1024, n_domain=3, seed=7)
    spec = data.spec.with_flat_table(8)
    cfg = Config(model="deepfm", bs=64, embed_dim=8)
    model = DeepFM(spec=spec, embed_dim=8, mlp_dims=(8,))
    tr = Trainer(model, cfg, data.n_domain)
    fits_fn = tr._build_epoch_fits()

    import jax.numpy as jnp
    n_rows = int(np.sum(spec.one_hot_dims))
    offs = np.asarray(compute_offsets(
        spec.one_hot_dims, spec.n_seq_fields * spec.seq_maxlen,
        spec.itemid_idx))
    dx = jnp.asarray(data.train_x)
    # a ragged-tail schedule over the split
    from aread_tpu.data.loader import GlobalBatcher
    b = GlobalBatcher(data.train_x, data.train_y, 64, spec.domain_idx, seed=0)
    perm = b.epoch_perm()
    got = bool(fits_fn(dx, jnp.asarray(perm)))
    gidx = np.where(perm < 0, perm[:, :1], perm)
    ids = np.clip(data.train_x[gidx] + offs, 0, n_rows - 1)
    want = steps_fit_kernel(ids.reshape(perm.shape[0], -1), n_rows, 8)
    assert got == want

    # and a schedule that VIOLATES the window (dense vocab coverage in one
    # block) must come back False from both
    data2 = make_synthetic_data(n_rows=4096, n_domain=3, vocab=2000, seed=8)
    spec2 = data2.spec.with_flat_table(8)
    tr2 = Trainer(DeepFM(spec=spec2, embed_dim=8, mlp_dims=(8,)),
                  Config(model="deepfm", bs=512, embed_dim=8), data2.n_domain)
    fits2 = tr2._build_epoch_fits()
    b2 = GlobalBatcher(data2.train_x, data2.train_y, 512, spec2.domain_idx,
                       seed=0)
    perm2 = b2.epoch_perm()
    n_rows2 = int(np.sum(spec2.one_hot_dims))
    offs2 = np.asarray(compute_offsets(
        spec2.one_hot_dims, spec2.n_seq_fields * spec2.seq_maxlen,
        spec2.itemid_idx))
    got2 = bool(fits2(jnp.asarray(data2.train_x), jnp.asarray(perm2)))
    gidx2 = np.where(perm2 < 0, perm2[:, :1], perm2)
    ids2 = np.clip(data2.train_x[gidx2] + offs2, 0, n_rows2 - 1)
    want2 = steps_fit_kernel(ids2.reshape(perm2.shape[0], -1), n_rows2, 8)
    assert got2 == want2
    assert not want2  # dense vocab coverage must overflow the window
