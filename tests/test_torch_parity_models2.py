"""Torch weight-copy forward parity for the rest of the model zoo:
DCN, DCNv2, AutoInt, AdaSparse, HiNet, PEPNet/EPNet/EPNet-single, ADL.

(MMoE/PLE/STAR/AREAD/DeepFM live in test_torch_parity_models.py.)
"""

import os
import sys
from types import SimpleNamespace

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

from tests.test_torch_parity_models import (make_inputs, n2j, stack_linears,
                                            stack_mlps, t2n)

ONE_HOT = [9, 5, 4]
MH = {"multi_hot_flag": [False] * 3, "seq_maxlen": 5, "itemid_idx": 0,
      "method": "mean"}
EMBED = 4


def base_params(tm):
    return {
        "embedding": {"table": n2j(t2n(tm.embedding.embedding_dict.weight))},
        "linear": {"kernel": n2j(t2n(tm.linear.fc.weight).T),
                   "bias": n2j(t2n(tm.linear.fc.bias))},
    }


def our_spec():
    from aread_tpu.models.base import FeatureSpec
    return FeatureSpec(one_hot_dims=tuple(ONE_HOT), n_seq_fields=0,
                       itemid_idx=0, domain_idx=2)


def copy_mlp(tm_mlp, output_layer=True):
    """single reference MultiLayerPerceptron -> our MLP params/stats."""
    p, s = stack_mlps([tm_mlp], output_layer=output_layer)
    unstack = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
    return unstack(p), unstack(s)


def cn_params(tcn):
    out = {}
    for i in range(len(tcn.w)):
        out[f"w_{i}"] = n2j(t2n(tcn.w[i].weight).T)
        out[f"b_{i}"] = n2j(t2n(tcn.b[i]))
    return out


# --------------------------------------------------------------------- DCN
def test_dcn_forward_parity():
    from model.dcn import DCN as TorchDCN

    from aread_tpu.models.dcn import DCN

    rng = np.random.default_rng(0)
    torch.manual_seed(0)
    tm = TorchDCN(np.array(ONE_HOT), EMBED, MH, n_cross_layers=2,
                  mlp_dims=(16, 8), dropout=0.0).eval()
    x = make_inputs(rng, ONE_HOT, 10)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))

    jm = DCN(spec=our_spec(), embed_dim=EMBED, n_cross_layers=2,
             mlp_dims=(16, 8), dropout=0.0)
    mlp_p, mlp_s = copy_mlp(tm.mlp, output_layer=False)
    params = base_params(tm)
    params["cn"] = cn_params(tm.cn)
    params["mlp"] = mlp_p
    params["mlp_linear"] = {"kernel": n2j(t2n(tm.mlp_linear.weight).T)}
    out = jm.apply({"params": params, "batch_stats": {"mlp": mlp_s}},
                   jnp.asarray(x.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)


# ------------------------------------------------------------------- DCNv2
def test_dcnv2_forward_parity():
    from model.dcnv2 import DCNv2 as TorchDCNv2

    from aread_tpu.models.dcnv2 import DCNv2

    rng = np.random.default_rng(1)
    torch.manual_seed(1)
    tm = TorchDCNv2(np.array(ONE_HOT), EMBED, MH, n_cross_layers=2,
                    mlp_dims=(16, 8), dropout=0.0, low_rank=4,
                    num_experts=3).eval()
    x = make_inputs(rng, ONE_HOT, 10)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))

    jm = DCNv2(spec=our_spec(), embed_dim=EMBED, n_cross_layers=2,
               mlp_dims=(16, 8), dropout=0.0, low_rank=4, num_experts=3)
    dnn_p, dnn_s = copy_mlp(tm.dnn, output_layer=False)
    params = base_params(tm)
    cross = {"gate": jnp.stack([n2j(t2n(g.weight).T) for g in tm.crossnet.gating])}
    for i in range(2):
        cross[f"u_{i}"] = n2j(t2n(tm.crossnet.u_list[i]))
        cross[f"v_{i}"] = n2j(t2n(tm.crossnet.v_list[i]))
        # reference computes C @ v; our einsum contracts v @ C -> transpose
        cross[f"c_{i}"] = n2j(np.transpose(t2n(tm.crossnet.c_list[i]), (0, 2, 1)))
        cross[f"bias_{i}"] = n2j(t2n(tm.crossnet.bias[i])[:, 0])
    params["crossnet"] = cross
    params["dnn"] = dnn_p
    params["dnn_linear"] = {"kernel": n2j(t2n(tm.dnn_linear.weight).T)}
    out = jm.apply({"params": params, "batch_stats": {"dnn": dnn_s}},
                   jnp.asarray(x.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)


# ----------------------------------------------------------------- AutoInt
def test_autoint_forward_parity():
    from model.autoint import AutoInt as TorchAutoInt

    from aread_tpu.models.autoint import AutoInt

    rng = np.random.default_rng(2)
    torch.manual_seed(2)
    tm = TorchAutoInt(np.array(ONE_HOT), EMBED, MH, atten_embed_dim=8,
                      att_layer_num=2, att_head_num=2, att_res=True,
                      mlp_dims=(16, 8), dropout=0.0).eval()
    x = make_inputs(rng, ONE_HOT, 10)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))

    jm = AutoInt(spec=our_spec(), embed_dim=EMBED, atten_embed_dim=8,
                 att_layer_num=2, att_head_num=2, att_res=True,
                 mlp_dims=(16, 8), dropout=0.0)
    dnn_p, dnn_s = copy_mlp(tm.dnn, output_layer=False)
    params = base_params(tm)
    params["atten_embedding"] = {"kernel": n2j(t2n(tm.atten_embedding.weight).T),
                                 "bias": n2j(t2n(tm.atten_embedding.bias))}
    for i, attn in enumerate(tm.self_attns):
        params[f"attn_{i}"] = {
            "in_proj_kernel": n2j(t2n(attn.in_proj_weight).T),
            "in_proj_bias": n2j(t2n(attn.in_proj_bias)),
            "out_proj": {"kernel": n2j(t2n(attn.out_proj.weight).T),
                         "bias": n2j(t2n(attn.out_proj.bias))},
        }
    params["v_res"] = {"kernel": n2j(t2n(tm.V_res_embedding.weight).T),
                       "bias": n2j(t2n(tm.V_res_embedding.bias))}
    params["dnn"] = dnn_p
    params["dnn_linear"] = {"kernel": n2j(t2n(tm.dnn_linear.weight).T)}
    out = jm.apply({"params": params, "batch_stats": {"dnn": dnn_s}},
                   jnp.asarray(x.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)


# ---------------------------------------------------------------- AdaSparse
def test_adasparse_forward_parity():
    from model.adasparse import AdaSparse as TorchAdaSparse

    from aread_tpu.models.adasparse import AdaSparse

    rng = np.random.default_rng(3)
    torch.manual_seed(3)
    cfg = SimpleNamespace(use_dcn=False, use_atten=False)
    tm = TorchAdaSparse(np.array(ONE_HOT), EMBED, MH, hidden_dims=(16, 8),
                        domain_idx=2, dropout=0.0, config=cfg).eval()
    x = make_inputs(rng, ONE_HOT, 10)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))

    jm = AdaSparse(spec=our_spec(), embed_dim=EMBED, hidden_dims=(16, 8),
                   dropout=0.0, use_dcn=False, use_atten=False)
    params = base_params(tm)
    stats = {}
    for i in range(2):
        params[f"dnn_linear_{i}"] = {
            "kernel": n2j(t2n(tm.dnn.linears[i].weight).T),
            "bias": n2j(t2n(tm.dnn.linears[i].bias))}
        params[f"pruner_{i}"] = {
            "kernel": n2j(t2n(tm.dnn.pruners[i].weight).T),
            "bias": n2j(t2n(tm.dnn.pruners[i].bias))}
        params[f"bn_{i}"] = {"scale": n2j(t2n(tm.dnn.bn[i].weight)),
                             "bias": n2j(t2n(tm.dnn.bn[i].bias))}
        stats[f"bn_{i}"] = {"mean": n2j(t2n(tm.dnn.bn[i].running_mean)),
                            "var": n2j(t2n(tm.dnn.bn[i].running_var))}
    params["dnn_linear_out"] = {"kernel": n2j(t2n(tm.dnn_linear.weight).T),
                                "bias": n2j(t2n(tm.dnn_linear.bias))}
    out = jm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)


# ------------------------------------------------------------------- HiNet
def test_hinet_forward_parity():
    from model.hinet import HiNet as TorchHiNet

    from aread_tpu.models.hinet import HiNet

    rng = np.random.default_rng(4)
    torch.manual_seed(4)
    cfg = SimpleNamespace(use_dcn=False, use_atten=False)
    n_tower = 3
    tm = TorchHiNet(np.array(ONE_HOT), EMBED, MH, n_tower=n_tower,
                    sei_dims=[8, 6], tower_dims=[6, 4], domain_idx=2,
                    dropout=0.0, config=cfg).eval()
    B = 10
    x = make_inputs(rng, ONE_HOT, B)
    group = rng.integers(0, n_tower, B)
    with torch.no_grad():
        ref, _ = tm(torch.tensor(x), torch.tensor(group[:, None]),
                    targets=torch.zeros(B, 1))
    ref = t2n(ref).ravel()

    jm = HiNet(spec=our_spec(), embed_dim=EMBED, n_tower=n_tower,
               sei_dims=(8, 6), tower_dims=(6, 4), dropout=0.0,
               use_dcn=False, use_atten=False)

    def sei_params(seis):
        """list of SEI modules -> SEIStack params: T*E stacked experts."""
        all_experts = [e for sei in seis for e in sei.experts]
        exp_p, exp_s = stack_mlps(all_experts, output_layer=False)
        gk, gb = stack_linears([sei.gate[0] for sei in seis])
        return ({"experts": exp_p, "gate": {"kernel": gk, "bias": gb}},
                {"experts": exp_s})

    spec_p, spec_s = sei_params(list(tm.specific_seis))
    shared_p, shared_s = sei_params([tm.shared_seis])
    tower_p, tower_s = copy_mlp(tm.tower, output_layer=False)
    params = base_params(tm)
    params["specific_seis"] = spec_p
    params["shared_sei"] = shared_p
    params["san_gate"] = {"kernel": n2j(t2n(tm.san_gate[0].weight).T),
                          "bias": n2j(t2n(tm.san_gate[0].bias))}
    params["tower"] = tower_p
    params["tower_linear"] = {"kernel": n2j(t2n(tm.tower_linear.weight).T)}
    out = jm.apply({"params": params,
                    "batch_stats": {"specific_seis": spec_s,
                                    "shared_sei": shared_s,
                                    "tower": tower_s}},
                   jnp.asarray(x.astype(np.int32)),
                   group=jnp.asarray(group.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)


# ------------------------------------------------------------------ PEPNet
def _pep_common(tm):
    params = base_params(tm)
    params["epnet"] = {
        "fc1": {"kernel": n2j(t2n(tm.epnet.gate[0].weight).T),
                "bias": n2j(t2n(tm.epnet.gate[0].bias))},
        "fc2": {"kernel": n2j(t2n(tm.epnet.gate[2].weight).T),
                "bias": n2j(t2n(tm.epnet.gate[2].bias))},
    }
    return params


def test_pepnet_forward_parity():
    from model.pepnet import PEPNet as TorchPEPNet

    from aread_tpu.models.pepnet import PEPNet

    rng = np.random.default_rng(5)
    torch.manual_seed(5)
    cfg = SimpleNamespace(use_dcn=False, use_atten=False)
    n_tower, tower_dims = 3, (8, 6)
    tm = TorchPEPNet(np.array(ONE_HOT), EMBED, MH, n_tower=n_tower,
                     tower_dims=tower_dims, gate_hidden_dim=8,
                     use_ppnet=True, domain_idx=2, dropout=0.0,
                     config=cfg).eval()
    B = 10
    x = make_inputs(rng, ONE_HOT, B)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))  # [B, n_tower]

    jm = PEPNet(spec=our_spec(), embed_dim=EMBED, n_tower=n_tower,
                tower_dims=tower_dims, gate_hidden_dim=8, use_ppnet=True,
                dropout=0.0, use_dcn=False, use_atten=False)
    params = _pep_common(tm)
    pp = {}
    pp_stats = {}
    for idx in range(len(tower_dims)):
        shared = tm.ppnet.tower_layers[idx][0]  # tower-shared Sequential
        lin, bn = shared[0], shared[1]
        pp[f"kernel_{idx}"] = n2j(t2n(lin.weight).T)
        pp[f"bias_{idx}"] = n2j(t2n(lin.bias))
        # tied_affine: one [D] gamma/beta shared across towers, exactly
        # the reference's shared BN module; only the running STATS are
        # kept per tower ([T, D], documented deviation) so they tile
        pp[f"bn_{idx}"] = {
            "scale": n2j(t2n(bn.weight)),
            "bias": n2j(t2n(bn.bias))}
        pp_stats[f"bn_{idx}"] = {
            "mean": n2j(np.tile(t2n(bn.running_mean), (n_tower, 1))),
            "var": n2j(np.tile(t2n(bn.running_var), (n_tower, 1)))}
        gate = tm.ppnet.gate_layers[idx]
        pp[f"gate_{idx}"] = {
            "fc1": {"kernel": n2j(t2n(gate.gate[0].weight).T),
                    "bias": n2j(t2n(gate.gate[0].bias))},
            "fc2": {"kernel": n2j(t2n(gate.gate[2].weight).T),
                    "bias": n2j(t2n(gate.gate[2].bias))},
        }
    params["ppnet"] = pp
    lk, _ = stack_linears(list(tm.ppnet_linears))
    params["ppnet_linears"] = {"kernel": lk}
    out = jm.apply({"params": params, "batch_stats": {"ppnet": pp_stats}},
                   jnp.asarray(x.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)


@pytest.mark.parametrize("n_tower", [3, 1])
def test_epnet_forward_parity(n_tower):
    from model.pepnet import PEPNet as TorchPEPNet

    from aread_tpu.models.pepnet import PEPNet

    rng = np.random.default_rng(6)
    torch.manual_seed(6)
    cfg = SimpleNamespace(use_dcn=False, use_atten=False)
    tower_dims = (8, 6)
    tm = TorchPEPNet(np.array(ONE_HOT), EMBED, MH, n_tower=n_tower,
                     tower_dims=tower_dims, gate_hidden_dim=8,
                     use_ppnet=False, domain_idx=2, dropout=0.0,
                     config=cfg).eval()
    B = 10
    x = make_inputs(rng, ONE_HOT, B)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))

    jm = PEPNet(spec=our_spec(), embed_dim=EMBED, n_tower=n_tower,
                tower_dims=tower_dims, gate_hidden_dim=8, use_ppnet=False,
                dropout=0.0, use_dcn=False, use_atten=False)
    params = _pep_common(tm)
    towers = list(tm.towers) if n_tower > 1 else [tm.towers]
    tow_p, tow_s = stack_mlps(towers, output_layer=False)
    params["towers"] = tow_p
    linears = list(tm.ppnet_linears) if n_tower > 1 else [tm.ppnet_linears]
    lk, _ = stack_linears(linears)
    params["ppnet_linears"] = {"kernel": lk}
    out = jm.apply({"params": params, "batch_stats": {"towers": tow_s}},
                   jnp.asarray(x.astype(np.int32)), train=False)
    ours = np.asarray(out["prob"])
    np.testing.assert_allclose(ours, ref if n_tower > 1 else ref, atol=1e-5)


# --------------------------------------------------------------------- ADL
def test_adl_forward_parity():
    """Single-call parity with shared cluster centers (the reference also
    EMA-updates centers inside eval calls — an intentional deviation — but
    one call's OUTPUT only depends on the incoming centers)."""
    from model.adl import ADL as TorchADL

    from aread_tpu.models.adl import ADL

    rng = np.random.default_rng(7)
    torch.manual_seed(7)
    cfg = SimpleNamespace(use_dcn=False, use_atten=False)
    n_tower, tower_dims = 3, (8, 6)
    tm = TorchADL(np.array(ONE_HOT), EMBED, MH, n_tower=n_tower,
                  tower_dims=tower_dims, dlm_iters=2, domain_idx=2,
                  device="cpu", dropout=0.0, config=cfg).eval()
    B = 10
    x = make_inputs(rng, ONE_HOT, B)
    centers = t2n(tm.cluster_centers).copy()
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))[:, 0]

    jm = ADL(spec=our_spec(), embed_dim=EMBED, n_tower=n_tower,
             tower_dims=tower_dims, dlm_iters=2, dropout=0.0,
             use_dcn=False, use_atten=False)
    dom_p, dom_s = stack_mlps(list(tm.domain_mlps), output_layer=False)
    sh_p, sh_s = stack_mlps([tm.shared_mlps], output_layer=False)
    params = base_params(tm)
    params["domain_mlps"] = dom_p
    params["shared_mlps"] = sh_p
    dk, db = stack_linears(list(tm.domain_mlps_linears))
    params["domain_mlps_linears_kernel"] = dk
    params["domain_mlps_linears_bias"] = db
    params["shared_mlps_linear_kernel"] = n2j(t2n(tm.shared_mlps_linear.weight).T)
    params["shared_mlps_linear_bias"] = n2j(t2n(tm.shared_mlps_linear.bias))
    variables = {"params": params,
                 "batch_stats": {"domain_mlps": dom_s, "shared_mlps": sh_s},
                 "model_state": {"cluster_centers": n2j(centers)}}
    out = jm.apply(variables, jnp.asarray(x.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)
