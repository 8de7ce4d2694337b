"""Numeric parity against the ACTUAL reference PyTorch modules.

Each test instantiates the reference module (imported read-only from
/root/reference), copies its torch weights into the corresponding
aread_tpu flax param tree, and asserts forward-output agreement to float32
precision. This is the strongest guard against silent semantic divergence
(BN details, offset layout, expert contraction order, ...).

Weight-layout notes:
  * torch Linear.weight is [out, in]  -> flax kernel [in, out] (transpose);
  * torch CrossNetMix does tanh(C @ v) (layer.py:399-401) while our stacked
    einsum contracts v @ C — same family, so C must be TRANSPOSED when
    copying for exact parity;
  * torch MultiheadAttention packs in_proj as [3E, E] -> ours [E, 3E].

Skipped entirely when /root/reference is not mounted.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "model")),
                                reason="reference repo not mounted")

if os.path.isdir(os.path.join(REF, "model")):
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")


def t2n(t):
    return t.detach().cpu().numpy()


def n2j(a):
    return jnp.asarray(np.asarray(a, dtype=np.float32))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


# --------------------------------------------------------------- embedding
def test_features_embedding_parity(rng):
    from model.layer import FeaturesEmbedding as TorchEmbedding

    from aread_tpu.ops.embedding import FeaturesEmbedding

    one_hot_dims = [11, 5, 7]
    seq_maxlen, n_seq = 5, 2
    multi_hot_flag = [False] * 3 + [True] * (n_seq * seq_maxlen)
    mh = {"multi_hot_flag": multi_hot_flag, "seq_maxlen": seq_maxlen,
          "itemid_idx": 0, "method": "mean"}
    tm = TorchEmbedding(one_hot_dims, 4, mh).eval()

    B = 6
    x = np.stack([
        rng.integers(0, 11, B), rng.integers(0, 5, B), rng.integers(0, 7, B),
        *[rng.integers(0, 11, B) for _ in range(n_seq * seq_maxlen)],
    ], axis=1).astype(np.int64)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))

    jm = FeaturesEmbedding(one_hot_dims=tuple(one_hot_dims), embed_dim=4,
                           multi_hot_flag=tuple(multi_hot_flag), itemid_idx=0,
                           seq_maxlen=seq_maxlen, method="mean")
    params = {"params": {"table": n2j(t2n(tm.embedding_dict.weight))}}
    out = jm.apply(params, jnp.asarray(x.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


# --------------------------------------------------------------------- MLP
def _copy_torch_mlp(tm):
    """reference MultiLayerPerceptron.layers -> our MLP param dict."""
    params, stats = {}, {}
    i = 0
    linears = [m for m in tm.layers if isinstance(m, torch.nn.Linear)]
    bns = [m for m in tm.layers if isinstance(m, torch.nn.BatchNorm1d)]
    n_hidden = len(bns) if bns else len(linears) - 1
    for i in range(n_hidden):
        lin = linears[i]
        params[f"linear_{i}"] = {"kernel": n2j(t2n(lin.weight).T),
                                 "bias": n2j(t2n(lin.bias))}
        if bns:
            bn = bns[i]
            params[f"bn_{i}"] = {"scale": n2j(t2n(bn.weight)),
                                 "bias": n2j(t2n(bn.bias))}
            stats[f"bn_{i}"] = {"mean": n2j(t2n(bn.running_mean)),
                                "var": n2j(t2n(bn.running_var))}
    if len(linears) > n_hidden:
        out = linears[-1]
        params["out"] = {"kernel": n2j(t2n(out.weight).T),
                         "bias": n2j(t2n(out.bias))}
    return params, stats


@pytest.mark.parametrize("train_mode", [False, True])
def test_mlp_parity(rng, train_mode):
    from model.layer import MultiLayerPerceptron

    from aread_tpu.ops.mlp import MLP

    tm = MultiLayerPerceptron(12, (16, 8), dropout=0.0, output_layer=True)
    tm.train(train_mode)
    x = rng.normal(size=(32, 12)).astype(np.float32)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))

    jm = MLP(layer_dims=(16, 8), dropout=0.0, output_layer=True)
    params, stats = _copy_torch_mlp(MultiLayerPerceptron(12, (16, 8), 0.0))
    # re-copy from tm (fresh module above was only for structure)
    params, stats = _copy_torch_mlp(tm)
    variables = {"params": params, "batch_stats": stats}
    if train_mode:
        out, _ = jm.apply(variables, n2j(x), train=True,
                          mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(0)})
    else:
        out = jm.apply(variables, n2j(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_mlp_batch1_bn_skip_parity(rng):
    """reference layer.py:226-227: BN layers skipped when batch == 1."""
    from model.layer import MultiLayerPerceptron

    from aread_tpu.ops.mlp import MLP

    tm = MultiLayerPerceptron(6, (8,), dropout=0.0, output_layer=True)
    tm.train(True)
    x = rng.normal(size=(1, 6)).astype(np.float32)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))
    jm = MLP(layer_dims=(8,), dropout=0.0, output_layer=True)
    params, stats = _copy_torch_mlp(tm)
    out, _ = jm.apply({"params": params, "batch_stats": stats}, n2j(x),
                      train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# ------------------------------------------------------------- cross nets
def test_crossnetwork_parity(rng):
    from model.layer import CrossNetwork as TorchCN

    from aread_tpu.ops.cross import CrossNetwork

    tm = TorchCN(10, 3).eval()
    x = rng.normal(size=(16, 10)).astype(np.float32)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))
    params = {}
    for i in range(3):
        params[f"w_{i}"] = n2j(t2n(tm.w[i].weight).T)  # [1,d] -> [d,1]
        params[f"b_{i}"] = n2j(t2n(tm.b[i]))
    out = CrossNetwork(num_layers=3).apply({"params": params}, n2j(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_crossnetv2_parity(rng):
    from model.layer import CrossNetV2 as TorchCN

    from aread_tpu.ops.cross import CrossNetV2

    tm = TorchCN(10, 2).eval()
    x = rng.normal(size=(16, 10)).astype(np.float32)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))
    params = {}
    for i in range(2):
        params[f"w_{i}"] = n2j(t2n(tm.w[i].weight).T)
        params[f"b_{i}"] = n2j(t2n(tm.b[i]))
    out = CrossNetV2(num_layers=2).apply({"params": params}, n2j(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_crossnetmix_parity(rng):
    from model.layer import CrossNetMix as TorchCN

    from aread_tpu.ops.cross import CrossNetMix

    d, L, r, E = 10, 2, 4, 3
    tm = TorchCN(d, num_layers=L, low_rank=r, num_experts=E).eval()
    x = rng.normal(size=(16, d)).astype(np.float32)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))

    params = {"gate": jnp.stack([n2j(t2n(g.weight).T) for g in tm.gating])}
    for i in range(L):
        params[f"u_{i}"] = n2j(t2n(tm.u_list[i]))
        params[f"v_{i}"] = n2j(t2n(tm.v_list[i]))
        # reference computes C @ v (layer.py:400); our einsum contracts
        # v @ C, so copy C transposed per expert
        params[f"c_{i}"] = n2j(np.transpose(t2n(tm.c_list[i]), (0, 2, 1)))
        params[f"bias_{i}"] = n2j(t2n(tm.bias[i])[:, 0])
    out = CrossNetMix(num_layers=L, low_rank=r, num_experts=E).apply(
        {"params": params}, n2j(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# --------------------------------------------------------------- attention
def test_multihead_attention_parity(rng):
    from aread_tpu.ops.attention import MultiHeadSelfAttention

    E, H, B, L = 8, 2, 4, 6
    tm = torch.nn.MultiheadAttention(E, H, dropout=0.0).eval()
    x = rng.normal(size=(B, L, E)).astype(np.float32)
    xt = torch.tensor(x).transpose(0, 1)  # [L, B, E], reference layout
    with torch.no_grad():
        ref, _ = tm(xt, xt, xt)
    ref = t2n(ref.transpose(0, 1))

    params = {
        "in_proj_kernel": n2j(t2n(tm.in_proj_weight).T),
        "in_proj_bias": n2j(t2n(tm.in_proj_bias)),
        "out_proj": {"kernel": n2j(t2n(tm.out_proj.weight).T),
                     "bias": n2j(t2n(tm.out_proj.bias))},
    }
    out = MultiHeadSelfAttention(embed_dim=E, num_heads=H, dropout=0.0).apply(
        {"params": params}, n2j(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# ------------------------------------------------------------------ DeepFM
def test_deepfm_forward_parity(rng):
    from model.dfm import DeepFM as TorchDeepFM

    from aread_tpu.models.base import FeatureSpec
    from aread_tpu.models.deepfm import DeepFM

    one_hot_dims = [13, 6, 4]
    seq_maxlen, n_seq = 5, 2
    multi_hot_flag = [False] * 3 + [True] * (n_seq * seq_maxlen)
    mh = {"multi_hot_flag": multi_hot_flag, "seq_maxlen": seq_maxlen,
          "itemid_idx": 0, "method": "mean"}
    # BaseModel does one_hot_feature_dims + sum(flag) (layer.py:18): array-like
    tm = TorchDeepFM(np.array(one_hot_dims), 4, mh,
                     mlp_dims=(16, 8), dropout=0.0).eval()

    B = 12
    x = np.stack([
        rng.integers(0, 13, B), rng.integers(0, 6, B), rng.integers(0, 4, B),
        *[rng.integers(0, 13, B) for _ in range(n_seq * seq_maxlen)],
    ], axis=1).astype(np.int64)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))

    spec = FeatureSpec(one_hot_dims=tuple(one_hot_dims), n_seq_fields=n_seq,
                       itemid_idx=0, domain_idx=2, seq_maxlen=seq_maxlen)
    jm = DeepFM(spec=spec, embed_dim=4, mlp_dims=(16, 8), dropout=0.0)
    mlp_params, mlp_stats = _copy_torch_mlp(tm.mlp)
    variables = {
        "params": {
            "embedding": {"table": n2j(t2n(tm.embedding.embedding_dict.weight))},
            "linear": {"kernel": n2j(t2n(tm.linear.fc.weight).T),
                       "bias": n2j(t2n(tm.linear.fc.bias))},
            "mlp": mlp_params,
        },
        "batch_stats": {"mlp": mlp_stats},
    }
    out = jm.apply(variables, jnp.asarray(x.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)


# ------------------------------------------------- regularization term
def test_regularization_loss_parity(rng):
    """Our rule-based reg walk == the reference's list walk on DeepFM."""
    from model.dfm import DeepFM as TorchDeepFM

    from aread_tpu.models.base import regularization_loss
    from aread_tpu.models.deepfm import DeepFM

    one_hot_dims = [13, 6, 4]
    mh = {"multi_hot_flag": [False] * 3, "seq_maxlen": 5,
          "itemid_idx": 0, "method": "mean"}
    tm = TorchDeepFM(np.array(one_hot_dims), 4, mh,
                     mlp_dims=(16, 8), dropout=0.0).eval()
    with torch.no_grad():
        ref = float(tm.get_regularization_loss(torch.device("cpu")))

    mlp_params, _ = _copy_torch_mlp(tm.mlp)
    params = {
        "embedding": {"table": n2j(t2n(tm.embedding.embedding_dict.weight))},
        "linear": {"kernel": n2j(t2n(tm.linear.fc.weight).T),
                   "bias": n2j(t2n(tm.linear.fc.bias))},
        "mlp": mlp_params,
    }
    ours = float(regularization_loss(params, DeepFM.REG_RULES))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
