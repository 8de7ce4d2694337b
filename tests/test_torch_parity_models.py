"""Whole-model numeric parity against the reference PyTorch models.

Copies reference torch weights into our flax param trees (stacking
per-tower/per-expert ModuleList weights into the leading stack axis of
StackedLinear/StackedMLP) and compares eval-mode forwards. Covers MMoE
(the multi-tower gather path) and AREAD (the flagship: wo_mask and
masked hierarchical forwards, reference aread.py:156-202, 263-322).

Skipped when /root/reference is not mounted.
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


def t2n(t):
    return t.detach().cpu().numpy()


def n2j(a):
    return jnp.asarray(np.asarray(a, dtype=np.float32))


def stack_linears(torch_linears, transpose=True):
    """ModuleList of nn.Linear -> (kernel [T, din, dout], bias [T, dout])."""
    ks = [t2n(m.weight).T if transpose else t2n(m.weight) for m in torch_linears]
    bs = [t2n(m.bias) for m in torch_linears if m.bias is not None]
    kernel = n2j(np.stack(ks))
    bias = n2j(np.stack(bs)) if bs else None
    return kernel, bias


def stack_mlps(torch_mlps, output_layer=None):
    """ModuleList of reference MultiLayerPerceptron -> StackedMLP params.

    Returns (params, batch_stats) with kernels [T, din, dout] and BN
    stats [T, D]. ``output_layer`` must be passed explicitly for bn=False
    MLPs (no BN count to infer the hidden-layer count from)."""
    params, stats = {}, {}
    linears = [[m for m in mlp.layers if isinstance(m, torch.nn.Linear)]
               for mlp in torch_mlps]
    bns = [[m for m in mlp.layers if isinstance(m, torch.nn.BatchNorm1d)]
           for mlp in torch_mlps]
    if bns[0]:
        n_hidden = len(bns[0])
    elif output_layer is None or output_layer:
        n_hidden = len(linears[0]) - 1
    else:
        n_hidden = len(linears[0])
    for i in range(n_hidden):
        params[f"linear_{i}"] = {
            "kernel": n2j(np.stack([t2n(ls[i].weight).T for ls in linears])),
            "bias": n2j(np.stack([t2n(ls[i].bias) for ls in linears]))}
        if bns[0]:
            params[f"bn_{i}"] = {
                "scale": n2j(np.stack([t2n(bs[i].weight) for bs in bns])),
                "bias": n2j(np.stack([t2n(bs[i].bias) for bs in bns]))}
            stats[f"bn_{i}"] = {
                "mean": n2j(np.stack([t2n(bs[i].running_mean) for bs in bns])),
                "var": n2j(np.stack([t2n(bs[i].running_var) for bs in bns]))}
    if len(linears[0]) > n_hidden:  # output layer
        params["out"] = {
            "kernel": n2j(np.stack([t2n(ls[-1].weight).T for ls in linears])),
            "bias": n2j(np.stack([t2n(ls[-1].bias) for ls in linears]))}
    return params, stats


def make_inputs(rng, one_hot_dims, B):
    return np.stack([rng.integers(0, d, B) for d in one_hot_dims],
                    axis=1).astype(np.int64)


# ------------------------------------------------------------------- MMoE
def test_mmoe_forward_parity(rng=np.random.default_rng(3)):
    from model.mmoe import MMoE as TorchMMoE

    from aread_tpu.models.base import FeatureSpec
    from aread_tpu.models.mmoe import MMoE

    one_hot_dims = [9, 5, 4]
    mh = {"multi_hot_flag": [False] * 3, "seq_maxlen": 5, "itemid_idx": 0,
          "method": "mean"}
    cfg = SimpleNamespace(use_dcn=False, use_atten=False)
    n_tower, n_expert = 3, 4
    tm = TorchMMoE(np.array(one_hot_dims), 4, mh, n_tower, n_expert,
                   expert_dims=(16, 8), tower_dims=(8, 4), dropout=0.0,
                   config=cfg).eval()

    B = 10
    x = make_inputs(rng, one_hot_dims, B)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))  # [B, n_tower]

    spec = FeatureSpec(one_hot_dims=tuple(one_hot_dims), n_seq_fields=0,
                       itemid_idx=0, domain_idx=2)
    jm = MMoE(spec=spec, embed_dim=4, n_tower=n_tower, n_expert=n_expert,
              expert_dims=(16, 8), tower_dims=(8, 4), dropout=0.0,
              use_dcn=False, use_atten=False)

    exp_p, exp_s = stack_mlps(tm.experts)
    tow_p, tow_s = stack_mlps(tm.towers)
    gate_k, gate_b = stack_linears([g[0] for g in tm.gates])
    variables = {
        "params": {
            "embedding": {"table": n2j(t2n(tm.embedding.embedding_dict.weight))},
            "linear": {"kernel": n2j(t2n(tm.linear.fc.weight).T),
                       "bias": n2j(t2n(tm.linear.fc.bias))},
            "experts": exp_p,
            "gates": {"kernel": gate_k, "bias": gate_b},
            "towers": tow_p,
        },
        "batch_stats": {"experts": exp_s, "towers": tow_s},
    }
    out = jm.apply(variables, jnp.asarray(x.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)


# ------------------------------------------------------------------ AREAD
N_TOWER = (2, 4)
TOWER_DIMS = ((8, 6), (6, 4))
EXPERT_DIMS = (16, 6)
EMBED_DIM = 4
ONE_HOT = [9, 5, 6]  # domain field last-but-one; domain_idx=2
N_DOMAIN = 6


def _build_ref_aread(seed=0):
    from model.aread import AREAD as TorchAREAD

    torch.manual_seed(seed)
    mh = {"multi_hot_flag": [False] * 3, "seq_maxlen": 5, "itemid_idx": 0,
          "method": "mean"}
    cfg = SimpleNamespace(use_dcn=True, use_atten=False, n_cross_layers=2,
                          mmoe_n_expert=3,
                          domain_size={"aliccp": [10] * N_DOMAIN},
                          dataset_name="aliccp")
    tm = TorchAREAD(np.array(ONE_HOT), EMBED_DIM, mh, n_tower=N_TOWER,
                    n_domain=N_DOMAIN, base_model="mmoe",
                    expert_dims=EXPERT_DIMS, tower_dims=TOWER_DIMS,
                    domain_idx=2, device="cpu", dropout=0.0, config=cfg).eval()
    tm.reset_for_mask_update()
    return tm


def _build_our_aread():
    from aread_tpu.models.aread import AREAD
    from aread_tpu.models.base import FeatureSpec

    spec = FeatureSpec(one_hot_dims=tuple(ONE_HOT), n_seq_fields=0,
                       itemid_idx=0, domain_idx=2)
    return AREAD(spec=spec, embed_dim=EMBED_DIM, n_tower=N_TOWER,
                 n_domain=N_DOMAIN, base_model="mmoe",
                 expert_dims=EXPERT_DIMS, tower_dims=TOWER_DIMS,
                 dropout=0.0, use_dcn=True, n_cross_layers=2,
                 mmoe_n_expert=3)


def _copy_aread_weights(tm):
    exp_p, exp_s = stack_mlps(tm.mmoe_experts)
    gate_k, gate_b = stack_linears([g[0] for g in tm.mmoe_gates])
    params = {
        "embedding": {"table": n2j(t2n(tm.embedding.embedding_dict.weight))},
        "linear": {"kernel": n2j(t2n(tm.linear.fc.weight).T),
                   "bias": n2j(t2n(tm.linear.fc.bias))},
        "mmoe_experts": exp_p,
        "mmoe_gates": {"kernel": gate_k, "bias": gate_b},
        "group_embedding": n2j(t2n(tm.group_embedding.weight)),
        "final_gate": {"kernel": n2j(t2n(tm.final_gate[0].weight).T)},
    }
    stats = {"mmoe_experts": exp_s}
    for i in range(len(tm.cn.w)):
        params.setdefault("cn", {})[f"w_{i}"] = n2j(t2n(tm.cn.w[i].weight).T)
        params["cn"][f"b_{i}"] = n2j(t2n(tm.cn.b[i]))
    for l in range(len(N_TOWER)):
        tp, ts = stack_mlps(tm.towers[l])
        params[f"towers_{l}"] = tp
        stats[f"towers_{l}"] = ts
        if l > 0:
            gk, gb = stack_linears([g[0] for g in tm.tower_gates[l - 1]])
            params[f"tower_gates_{l}"] = {"kernel": gk, "bias": gb}
    lk, _ = stack_linears(tm.towers_linear)
    params["towers_linear"] = {"kernel": lk}
    return {"params": params, "batch_stats": stats}


def _rand_valid_mask(rng):
    """A random mask in the reference layout [1xT0, T0xT1, T1x1] that keeps
    at least one full path alive (built via our validated generator)."""
    from aread_tpu.utils.masks import create_single_full_mask, validate_mask

    masks = create_single_full_mask(N_TOWER, 0.6, rng)
    return validate_mask(masks, N_TOWER)


def test_aread_wo_mask_forward_parity():
    rng = np.random.default_rng(5)
    tm = _build_ref_aread()
    jm = _build_our_aread()
    variables = _copy_aread_weights(tm)

    B = 12
    x = make_inputs(rng, ONE_HOT, B)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x), mode="wo_mask"))
    out = jm.apply(variables, jnp.asarray(x.astype(np.int32)), mode="wo_mask",
                   train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref[:, 0], atol=1e-5)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_aread_masked_forward_parity(seed):
    rng = np.random.default_rng(seed)
    tm = _build_ref_aread()
    jm = _build_our_aread()
    variables = _copy_aread_weights(tm)

    masks_np = _rand_valid_mask(rng)
    masks_t = [torch.tensor(np.asarray(m)) for m in masks_np]

    B = 12
    x = make_inputs(rng, ONE_HOT, B)
    d = 1
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x), mode="domain_with_mask", domain_i=d,
                     current_mask=masks_t))
    out = jm.apply(variables, jnp.asarray(x.astype(np.int32)),
                   domain_mask=tuple(jnp.asarray(np.asarray(m)) for m in masks_np),
                   mode="domain_with_mask", train=False)
    # hier_tower_mask_forward squeezes the last dim: ref is [B]
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)

    # bagging mode: reference returns the active-leaf stack
    with torch.no_grad():
        ref_stack = t2n(tm(torch.tensor(x), mode="domain_mask_bagging",
                           domain_i=d, current_mask=masks_t))
    out = jm.apply(variables, jnp.asarray(x.astype(np.int32)),
                   domain_mask=tuple(jnp.asarray(np.asarray(m)) for m in masks_np),
                   mode="domain_mask_bagging", train=False)
    active = np.asarray(out["leaf_active"]).astype(bool)
    ours_stack = np.asarray(out["leaf_prob"])[:, active].T  # [n_active, B]
    np.testing.assert_allclose(ours_stack, ref_stack, atol=1e-5)


# ------------------------------------------------------------------- STAR
def test_star_forward_parity():
    """Partitioned normalization + weight-product towers (star.py:36-167)
    — SURVEY §7 flags this as the biggest silent-divergence risk."""
    from model.star import STAR as TorchSTAR

    from aread_tpu.models.base import FeatureSpec
    from aread_tpu.models.star import STAR

    rng = np.random.default_rng(7)
    one_hot_dims = [9, 5, 4]
    mh = {"multi_hot_flag": [False] * 3, "seq_maxlen": 5, "itemid_idx": 0,
          "method": "mean"}
    cfg = SimpleNamespace(use_atten=False)
    n_tower, tower_dims = 3, (8, 6)
    torch.manual_seed(1)
    tm = TorchSTAR(np.array(one_hot_dims), 4, mh, n_tower=n_tower,
                   tower_dims=tower_dims, dropout=0.0, config=cfg).eval()

    B = 10
    x = make_inputs(rng, one_hot_dims, B)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))  # [B, n_tower]

    spec = FeatureSpec(one_hot_dims=tuple(one_hot_dims), n_seq_fields=0,
                       itemid_idx=0, domain_idx=2)
    jm = STAR(spec=spec, embed_dim=4, n_tower=n_tower, tower_dims=tower_dims,
              dropout=0.0, use_atten=False)

    D = tm.embed_output_dim
    params = {
        "embedding": {"table": n2j(t2n(tm.embedding.embedding_dict.weight))},
        "linear": {"kernel": n2j(t2n(tm.linear.fc.weight).T),
                   "bias": n2j(t2n(tm.linear.fc.bias))},
        "shared_bn_weight": n2j(t2n(tm.shared_bn_weight)),
        "shared_bn_bias": n2j(t2n(tm.shared_bn_bias)),
        "domain_norm": {
            "scale": n2j(np.stack([t2n(b.weight) for b in tm.domain_norm])),
            "bias": n2j(np.stack([t2n(b.bias) for b in tm.domain_norm]))},
    }
    stats = {"domain_norm": {
        "mean": n2j(np.stack([t2n(b.running_mean) for b in tm.domain_norm])),
        "var": n2j(np.stack([t2n(b.running_var) for b in tm.domain_norm]))}}
    dims = (D,) + tuple(tower_dims)
    for i in range(len(tower_dims)):
        params[f"domain_dnns_kernel_{i}"] = n2j(np.stack(
            [t2n(d.linears[i].weight).T for d in tm.domain_dnns]))
        params[f"domain_dnns_bias_{i}"] = n2j(np.stack(
            [t2n(d.linears[i].bias) for d in tm.domain_dnns]))
        params[f"shared_dnn_kernel_{i}"] = n2j(t2n(tm.shared_dnn.linears[i].weight).T)
        params[f"shared_dnn_bias_{i}"] = n2j(t2n(tm.shared_dnn.linears[i].bias))
        params[f"domain_dnns_bn_{i}"] = {
            "scale": n2j(np.stack([t2n(d.bn[i].weight) for d in tm.domain_dnns])),
            "bias": n2j(np.stack([t2n(d.bn[i].bias) for d in tm.domain_dnns]))}
        stats[f"domain_dnns_bn_{i}"] = {
            "mean": n2j(np.stack([t2n(d.bn[i].running_mean) for d in tm.domain_dnns])),
            "var": n2j(np.stack([t2n(d.bn[i].running_var) for d in tm.domain_dnns]))}
    params["domain_dnn_linears_kernel"] = n2j(np.stack(
        [t2n(m.weight).T for m in tm.domain_dnn_linears]))
    params["domain_dnn_linears_bias"] = n2j(np.stack(
        [t2n(m.bias) for m in tm.domain_dnn_linears]))
    params["shared_dnn_linear_kernel"] = n2j(t2n(tm.shared_dnn_linear.weight).T)
    params["shared_dnn_linear_bias"] = n2j(t2n(tm.shared_dnn_linear.bias))

    out = jm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)

    # train-mode parity: batch statistics + running-stat updates
    tm.train(True)
    with torch.no_grad():
        ref_tr = t2n(tm(torch.tensor(x)))
    out_tr, mut = jm.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(x.astype(np.int32)), train=True,
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(out_tr["prob"]), ref_tr, atol=2e-5)
    # per-tower running means updated to match each torch MDR_BatchNorm
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["domain_norm"]["mean"]),
        np.stack([t2n(b.running_mean) for b in tm.domain_norm]), atol=1e-5)


# -------------------------------------------------------------------- PLE
def test_ple_forward_parity():
    from model.ple import PLE as TorchPLE

    from aread_tpu.models.base import FeatureSpec
    from aread_tpu.models.ple import PLE

    rng = np.random.default_rng(11)
    one_hot_dims = [9, 5, 4]
    mh = {"multi_hot_flag": [False] * 3, "seq_maxlen": 5, "itemid_idx": 0,
          "method": "mean"}
    cfg = SimpleNamespace(use_dcn=False, use_atten=False)
    n_tower, n_spec, n_shared = 3, 2, 2
    expert_dims = ((16, 8), (6,))
    tower_dims = (6, 4)
    torch.manual_seed(2)
    tm = TorchPLE(np.array(one_hot_dims), 4, mh, n_tower, n_spec, n_shared,
                  expert_dims, tower_dims, dropout=0.0, config=cfg).eval()

    B = 10
    x = make_inputs(rng, one_hot_dims, B)
    with torch.no_grad():
        ref = t2n(tm(torch.tensor(x)))

    spec = FeatureSpec(one_hot_dims=tuple(one_hot_dims), n_seq_fields=0,
                       itemid_idx=0, domain_idx=2)
    jm = PLE(spec=spec, embed_dim=4, n_tower=n_tower,
             n_expert_specific=n_spec, n_expert_shared=n_shared,
             expert_dims=expert_dims, tower_dims=tower_dims, dropout=0.0,
             use_dcn=False, use_atten=False)

    params = {
        "embedding": {"table": n2j(t2n(tm.embedding.embedding_dict.weight))},
        "linear": {"kernel": n2j(t2n(tm.linear.fc.weight).T),
                   "bias": n2j(t2n(tm.linear.fc.bias))},
    }
    stats = {}
    for i, cgc in enumerate(tm.cgc_layers):
        spec_p, _ = stack_mlps(cgc.experts_specific, output_layer=False)
        shared_p, _ = stack_mlps(cgc.experts_shared, output_layer=False)
        gk, gb = stack_linears([g[0] for g in cgc.gates_specific])
        cgc_p = {"experts_specific": spec_p, "experts_shared": shared_p,
                 "gates_specific": {"kernel": gk, "bias": gb}}
        if cgc.cur_level < cgc.n_level:
            cgc_p["gate_shared"] = {
                "kernel": n2j(t2n(cgc.gate_shared[0].weight).T),
                "bias": n2j(t2n(cgc.gate_shared[0].bias))}
        params[f"cgc_{i}"] = cgc_p
    tow_p, tow_s = stack_mlps(tm.towers)
    params["towers"] = tow_p
    stats["towers"] = tow_s
    out = jm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(x.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["prob"]), ref, atol=1e-5)
