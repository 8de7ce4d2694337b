"""Unit tests for the ops library against hand-computed numpy references
(the reference repo ships no tests — SURVEY.md §4 — so these are the
numeric ground truth for each op)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aread_tpu.ops.cross import CrossNetMix, CrossNetV2, CrossNetwork
from aread_tpu.ops.embedding import FeaturesEmbedding, compute_offsets
from aread_tpu.ops.fm import FactorizationMachine, InnerProductNetwork
from aread_tpu.ops.mlp import MLP, BatchNorm, GateNN, Linear, StackedLinear, StackedMLP


def test_offsets_match_reference_semantics():
    # layer.py:152-157: offsets = cumsum-shifted; multi-hot slots reuse itemid
    dims = [10, 5, 7]
    off = compute_offsets(dims, n_multi_hot_slots=4, itemid_idx=1)
    np.testing.assert_array_equal(off, [0, 10, 15, 10, 10, 10, 10])


def test_embedding_mean_pooling():
    key = jax.random.PRNGKey(0)
    emb = FeaturesEmbedding(
        one_hot_dims=(6, 4), embed_dim=3,
        multi_hot_flag=(False, False, True, True),
        itemid_idx=0, seq_maxlen=2, method="mean")
    x = jnp.array([[1, 2, 0, 3]], dtype=jnp.int32)
    variables = emb.init(key, x)
    table = variables["params"]["table"]
    out = emb.apply(variables, x)
    assert out.shape == (1, 3, 3)  # 2 one-hot + 1 pooled multi-hot field
    np.testing.assert_allclose(out[0, 0], table[1], rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], table[6 + 2], rtol=1e-6)
    # multi-hot uses itemid offset (0) and mean-pools over seq_maxlen
    np.testing.assert_allclose(out[0, 2], (table[0] + table[3]) / 2, rtol=1e-6)


def test_fm_square_of_sum_identity():
    x = np.random.default_rng(0).standard_normal((4, 5, 3)).astype(np.float32)
    fm = FactorizationMachine()
    out = fm.apply({}, jnp.asarray(x))
    # FM pooled == sum of pairwise inner products
    ipnn = InnerProductNetwork().apply({}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out)[:, 0],
                               np.asarray(ipnn).sum(axis=1), rtol=1e-4)


def test_batchnorm_torch_semantics():
    bn = BatchNorm()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 4)), jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), x, train=True)
    out, updated = bn.apply(variables, x, train=True, mutable=["batch_stats"])
    mean, var = np.mean(np.asarray(x), 0), np.var(np.asarray(x), 0)
    np.testing.assert_allclose(np.asarray(out), (np.asarray(x) - mean) / np.sqrt(var + 1e-5), rtol=1e-4)
    # running stats: momentum 0.1, unbiased var
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["mean"]), 0.1 * mean, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["var"]),
                               0.9 + 0.1 * var * 16 / 15, rtol=1e-4)


def test_batchnorm_masked_ignores_pad_rows():
    bn = BatchNorm()
    rng = np.random.default_rng(1)
    x_real = rng.standard_normal((10, 4)).astype(np.float32)
    pad = np.full((6, 4), 100.0, np.float32)  # poison rows
    x = jnp.asarray(np.concatenate([x_real, pad]))
    mask = jnp.asarray(np.concatenate([np.ones(10), np.zeros(6)]).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x, train=True)
    out, _ = bn.apply(variables, x, train=True, mask=mask, mutable=["batch_stats"])
    mean, var = x_real.mean(0), x_real.var(0)
    np.testing.assert_allclose(np.asarray(out)[:10], (x_real - mean) / np.sqrt(var + 1e-5), rtol=1e-3)


def test_batchnorm_tied_affine():
    """tied_affine=True on [B, T, D]: ONE [D] gamma/beta shared across the
    T towers (the reference PPNet's tower-tied BN module, pepnet.py:163)
    while batch statistics stay per-tower — output must equal the untied
    BatchNorm whose per-tower affine params are tiles of the shared ones."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, 3, 4)), jnp.float32)
    tied = BatchNorm(tied_affine=True)
    v_tied = tied.init(jax.random.PRNGKey(0), x, train=True)
    assert v_tied["params"]["scale"].shape == (4,)
    # nudge the shared affine off the identity so the tying is observable
    v_tied["params"]["scale"] = jnp.asarray(rng.standard_normal(4), jnp.float32)
    v_tied["params"]["bias"] = jnp.asarray(rng.standard_normal(4), jnp.float32)
    out_tied, st_tied = tied.apply(v_tied, x, train=True,
                                   mutable=["batch_stats"])

    untied = BatchNorm()
    v_un = untied.init(jax.random.PRNGKey(0), x, train=True)
    assert v_un["params"]["scale"].shape == (3, 4)
    v_un["params"]["scale"] = jnp.tile(v_tied["params"]["scale"], (3, 1))
    v_un["params"]["bias"] = jnp.tile(v_tied["params"]["bias"], (3, 1))
    out_un, st_un = untied.apply(v_un, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_tied), np.asarray(out_un),
                               rtol=1e-5)
    # running stats remain per-tower in both
    np.testing.assert_allclose(np.asarray(st_tied["batch_stats"]["mean"]),
                               np.asarray(st_un["batch_stats"]["mean"]),
                               rtol=1e-5)


def test_batchnorm_single_row_passthrough():
    # reference layer.py:226-227: BN skipped when batch==1
    bn = BatchNorm()
    x = jnp.ones((1, 4)) * 7.0
    variables = bn.init(jax.random.PRNGKey(0), x, train=True)
    out, updated = bn.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["mean"]), 0.0)


def test_stacked_linear_matches_loop():
    key = jax.random.PRNGKey(0)
    sl = StackedLinear(n_stack=3, features=4)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((5, 3, 6)), jnp.float32)
    variables = sl.init(key, x)
    out = sl.apply(variables, x)
    k, b = variables["params"]["kernel"], variables["params"]["bias"]
    for t in range(3):
        np.testing.assert_allclose(np.asarray(out[:, t]),
                                   np.asarray(x[:, t] @ k[t] + b[t]), rtol=1e-5)


def test_stacked_mlp_broadcast_input():
    sm = StackedMLP(n_stack=2, layer_dims=(8, 4), dropout=0.0)
    x = jnp.ones((6, 10))
    variables = sm.init(jax.random.PRNGKey(0), x, train=False)
    out = sm.apply(variables, x, train=False)
    assert out.shape == (6, 2, 4)


def test_crossnetwork_math():
    cn = CrossNetwork(num_layers=1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 6)), jnp.float32)
    variables = cn.init(jax.random.PRNGKey(0), x)
    out = cn.apply(variables, x)
    w = np.asarray(variables["params"]["w_0"])
    b = np.asarray(variables["params"]["b_0"])
    expect = np.asarray(x) * (np.asarray(x) @ w) + b + np.asarray(x)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_crossnetmix_shapes():
    cn = CrossNetMix(num_layers=2, low_rank=4, num_experts=3)
    x = jnp.ones((5, 12))
    variables = cn.init(jax.random.PRNGKey(0), x)
    assert cn.apply(variables, x).shape == (5, 12)


def test_gatenn_range():
    g = GateNN(hidden_dim=8, output_dim=6)
    x = jnp.ones((4, 10))
    variables = g.init(jax.random.PRNGKey(0), x)
    out = np.asarray(g.apply(variables, x))
    assert out.min() >= 0.0 and out.max() <= 2.0


def test_mlp_eval_uses_running_stats():
    mlp = MLP((8,), dropout=0.5, output_layer=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((32, 6)), jnp.float32)
    variables = mlp.init(jax.random.PRNGKey(0), x, train=False)
    out1 = mlp.apply(variables, x, train=False)
    out2 = mlp.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))  # deterministic eval
