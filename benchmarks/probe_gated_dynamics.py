"""Weight-copy TRAINING-DYNAMICS parity probe for the gated family.

VERDICT r3 headline: mmoe/ple/pepnet/adasparse land a systematic
0.03-0.045 AUC below the reference's successful mode in the planted-signal
matrix (benchmarks/parity_signal.py), while deepfm/dcn/star/aread/hinet
agree. This probe bisects the shared code paths the way the verdict asks:
copy one reference torch model's INITIAL weights into our flax model, feed
BOTH sides the IDENTICAL single-domain batch sequence (same order, full
batches only, dropout optionally zeroed so no RNG stream differs), step
both with torch-Adam semantics (lr, betas=(0.9,0.99), eps=1e-8, wd=1e-8,
manual L2 reg in the loss — reference run.py:505,830-831), and compare:

  * per-step training loss trajectories (prints max |delta| per block);
  * periodic validation AUC from each side's own eval path;
  * final per-module parameter drift.

If the trajectories track to float tolerance, the train-step math is
equivalent and the matrix deficit must come from init/RNG/data-order
sensitivity (i.e. seed-level recipe variance, the reference's own collapse
bimodality being the extreme case). If they diverge, the first diverging
step/block localizes the bug.

Runs on CPU (torch has no TPU here; ours is forced to CPU in-process so
the probe never blocks the single-tenant TPU tunnel).

Run: python benchmarks/probe_gated_dynamics.py [--model mmoe] [--steps 600]
         [--dropout 0.0] [--atten 1] [--rows 24000] [--eval_every 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")  # torch reference models (read-only)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import torch
from sklearn.metrics import roc_auc_score

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aread_tpu.config import DOMAIN2GROUP, Config
from aread_tpu.models.base import FeatureSpec
from aread_tpu.train.trainer import Trainer, hybrid_init, split_variables

# field layout: userid, itemid, domain, then the remaining parity-harness
# categoricals (vocabularies from benchmarks/parity_signal.py)
import parity_signal  # noqa: E402  (sys.path has benchmarks/ via __file__? no)

N_DOMAIN = 30
FIELDS = ["userid", "itemid", "domain"] + sorted(
    k for k in parity_signal.VOCAB if k not in ("userid", "itemid"))
DOMAIN_IDX = 2


def gen_data(n_rows: int, seed: int = 7):
    """The parity harness's planted signal (parity_signal.generate), as
    arrays: logit = u[user] + sign[domain]*i[item] + w[c301]."""
    rng = np.random.default_rng(seed)
    vocab = dict(parity_signal.VOCAB)
    cols = {f: rng.integers(0, vocab[f], size=n_rows) for f in FIELDS
            if f != "domain"}
    w = 1.0 / (np.arange(1, N_DOMAIN + 1) ** 0.8)
    cols["domain"] = rng.choice(N_DOMAIN, size=n_rows, p=w / w.sum())
    u = 0.9 * rng.standard_normal(vocab["userid"])
    i = 0.9 * rng.standard_normal(vocab["itemid"])
    w301 = 0.5 * rng.standard_normal(vocab["301"])
    sign = np.where(rng.random(N_DOMAIN) < 0.5, 1.0, -1.0)
    logit = (u[cols["userid"]] + sign[cols["domain"]] * i[cols["itemid"]]
             + w301[cols["301"]])
    p = 1.0 / (1.0 + np.exp(-1.2 * logit))
    y = (rng.random(n_rows) < p).astype(np.float32)
    x = np.stack([cols[f] for f in FIELDS], axis=1).astype(np.int64)
    dims = tuple(vocab[f] if f != "domain" else N_DOMAIN for f in FIELDS)
    n_train = int(0.9 * n_rows)
    return (x[:n_train], y[:n_train]), (x[n_train:], y[n_train:]), dims


def domain_batches(x, y, d2g, bs, epochs, seed=11):
    """Identical single-domain FULL batches for both frameworks: per-domain
    shuffled index pools, ragged tails dropped, batch order shuffled."""
    rng = np.random.default_rng(seed)
    doms = x[:, DOMAIN_IDX]
    out = []
    for _ in range(epochs):
        chunks = []
        for d in range(N_DOMAIN):
            idx = np.flatnonzero(doms == d)
            rng.shuffle(idx)
            for s in range(0, len(idx) - bs + 1, bs):
                chunks.append(idx[s:s + bs])
        rng.shuffle(chunks)
        out.extend(chunks)
    return [(x[c], y[c], int(d2g[x[c][0, DOMAIN_IDX]])) for c in out]


# ------------------------------------------------------- weight copy utils
def t2n(t):
    return t.detach().cpu().numpy()


def n2j(a):
    # np.array(copy=True): t2n yields numpy VIEWS of torch storage and
    # jax's CPU backend zero-copies jnp.asarray — without the copy,
    # opt_t.step() would mutate our params in place mid-probe
    return jnp.asarray(np.array(a, dtype=np.float32, copy=True))


def stack_linears(torch_linears):
    ks = [t2n(m.weight).T for m in torch_linears]
    bs = [t2n(m.bias) for m in torch_linears if m.bias is not None]
    return n2j(np.stack(ks)), (n2j(np.stack(bs)) if bs else None)


def stack_mlps(torch_mlps):
    params, stats = {}, {}
    linears = [[m for m in mlp.layers if isinstance(m, torch.nn.Linear)]
               for mlp in torch_mlps]
    bns = [[m for m in mlp.layers if isinstance(m, torch.nn.BatchNorm1d)]
           for mlp in torch_mlps]
    n_hidden = len(bns[0]) if bns[0] else len(linears[0]) - 1
    for i in range(n_hidden):
        params[f"linear_{i}"] = {
            "kernel": n2j(np.stack([t2n(ls[i].weight).T for ls in linears])),
            "bias": n2j(np.stack([t2n(ls[i].bias) for ls in linears]))}
        if bns[0]:
            params[f"bn_{i}"] = {
                "scale": n2j(np.stack([t2n(b[i].weight) for b in bns])),
                "bias": n2j(np.stack([t2n(b[i].bias) for b in bns]))}
            stats[f"bn_{i}"] = {
                "mean": n2j(np.stack([t2n(b[i].running_mean) for b in bns])),
                "var": n2j(np.stack([t2n(b[i].running_var) for b in bns]))}
    if len(linears[0]) > n_hidden:
        params["out"] = {
            "kernel": n2j(np.stack([t2n(l[-1].weight).T for l in linears])),
            "bias": n2j(np.stack([t2n(l[-1].bias) for l in linears]))}
    return params, stats


def copy_atten(base):
    """Reference BaseModel.build_atten weights -> our AttentionTower params
    (layout per tests/test_torch_parity.py: in_proj [3E,E] -> [E,3E])."""
    p = {"atten_embedding": {"kernel": n2j(t2n(base.atten_embedding.weight).T),
                             "bias": n2j(t2n(base.atten_embedding.bias))},
         "atten_linear": {"kernel": n2j(t2n(base.atten_linear.weight).T)}}
    for i, attn in enumerate(base.self_attns):
        p[f"attn_{i}"] = {
            "in_proj_kernel": n2j(t2n(attn.in_proj_weight).T),
            "in_proj_bias": n2j(t2n(attn.in_proj_bias)),
            "out_proj": {"kernel": n2j(t2n(attn.out_proj.weight).T),
                         "bias": n2j(t2n(attn.out_proj.bias))}}
    if base.att_res:
        p["v_res"] = {"kernel": n2j(t2n(base.V_res_embedding.weight).T),
                      "bias": n2j(t2n(base.V_res_embedding.bias))}
    return p


def build_mmoe(dims, embed_dim, n_tower, dropout, use_atten, cfg_ours):
    """Returns (torch_model, our_model, params, batch_stats)."""
    from types import SimpleNamespace

    from model.mmoe import MMoE as TorchMMoE

    from aread_tpu.models.mmoe import MMoE

    mh = {"multi_hot_flag": [False] * len(dims), "seq_maxlen": 5,
          "itemid_idx": 1, "method": "mean"}
    tcfg = SimpleNamespace(use_dcn=False, use_atten=use_atten,
                           atten_embed_dim=64, att_layer_num=3,
                           att_head_num=2, att_res=True)
    tm = TorchMMoE(np.array(dims), embed_dim, mh, n_tower,
                   cfg_ours.mmoe_n_expert, cfg_ours.mmoe_expert_dims,
                   cfg_ours.mmoe_tower_dims, dropout=dropout, config=tcfg)
    spec = FeatureSpec(one_hot_dims=tuple(dims), n_seq_fields=0,
                       itemid_idx=1, domain_idx=DOMAIN_IDX)
    jm = MMoE(spec=spec, embed_dim=embed_dim, n_tower=n_tower,
              n_expert=cfg_ours.mmoe_n_expert,
              expert_dims=cfg_ours.mmoe_expert_dims,
              tower_dims=cfg_ours.mmoe_tower_dims, dropout=dropout,
              use_dcn=False, use_atten=use_atten)
    exp_p, exp_s = stack_mlps(tm.experts)
    tow_p, tow_s = stack_mlps(tm.towers)
    gate_k, gate_b = stack_linears([g[0] for g in tm.gates])
    params = {
        "embedding": {"table": n2j(t2n(tm.embedding.embedding_dict.weight))},
        "linear": {"kernel": n2j(t2n(tm.linear.fc.weight).T),
                   "bias": n2j(t2n(tm.linear.fc.bias))},
        "experts": exp_p,
        "gates": {"kernel": gate_k, "bias": gate_b},
        "towers": tow_p,
    }
    if use_atten:
        params["atten"] = copy_atten(tm)
    stats = {"experts": exp_s, "towers": tow_s}
    return tm, jm, params, stats


def build_pepnet(dims, embed_dim, n_tower, dropout, use_atten, cfg_ours):
    """PEPNet (use_ppnet) weight copy, per tests/test_torch_parity_models2.
    The reference TIES the PPNet dense layer AND its BatchNorm across
    towers (``[one_tower_layer] * n_tower``, pepnet.py:163); our BN affine
    is per-tower, so the torch values are tiled — the one structural
    difference whose training-dynamics effect this probe measures."""
    from types import SimpleNamespace

    from model.pepnet import PEPNet as TorchPEPNet

    from aread_tpu.models.pepnet import PEPNet

    mh = {"multi_hot_flag": [False] * len(dims), "seq_maxlen": 5,
          "itemid_idx": 1, "method": "mean"}
    tcfg = SimpleNamespace(use_dcn=False, use_atten=use_atten,
                           atten_embed_dim=64, att_layer_num=3,
                           att_head_num=2, att_res=True)
    tower_dims = tuple(cfg_ours.tower_dims)
    tm = TorchPEPNet(np.array(dims), embed_dim, mh, n_tower=n_tower,
                     tower_dims=tower_dims, gate_hidden_dim=64,
                     use_ppnet=True, domain_idx=DOMAIN_IDX, dropout=dropout,
                     config=tcfg)
    spec = FeatureSpec(one_hot_dims=tuple(dims), n_seq_fields=0,
                       itemid_idx=1, domain_idx=DOMAIN_IDX)
    jm = PEPNet(spec=spec, embed_dim=embed_dim, n_tower=n_tower,
                tower_dims=tower_dims, gate_hidden_dim=64, use_ppnet=True,
                dropout=dropout, use_dcn=False, use_atten=use_atten)

    def gate_params(g):
        # GateNN layout shifts with dropout>0 ([Linear, ReLU, Dropout,
        # Linear, Sigmoid] vs [Linear, ReLU, Linear, Sigmoid]) — pick the
        # Linears by type, not index
        lins = [m for m in g.gate if isinstance(m, torch.nn.Linear)]
        return {"fc1": {"kernel": n2j(t2n(lins[0].weight).T),
                        "bias": n2j(t2n(lins[0].bias))},
                "fc2": {"kernel": n2j(t2n(lins[1].weight).T),
                        "bias": n2j(t2n(lins[1].bias))}}

    params = {
        "embedding": {"table": n2j(t2n(tm.embedding.embedding_dict.weight))},
        "linear": {"kernel": n2j(t2n(tm.linear.fc.weight).T),
                   "bias": n2j(t2n(tm.linear.fc.bias))},
        "epnet": gate_params(tm.epnet),
    }
    pp, pp_stats = {}, {}
    for idx in range(len(tower_dims)):
        shared = tm.ppnet.tower_layers[idx][0]
        lin, bn = shared[0], shared[1]
        pp[f"kernel_{idx}"] = n2j(t2n(lin.weight).T)
        pp[f"bias_{idx}"] = n2j(t2n(lin.bias))
        pp[f"bn_{idx}"] = {"scale": n2j(t2n(bn.weight)),
                           "bias": n2j(t2n(bn.bias))}
        pp_stats[f"bn_{idx}"] = {
            "mean": n2j(np.tile(t2n(bn.running_mean), (n_tower, 1))),
            "var": n2j(np.tile(t2n(bn.running_var), (n_tower, 1)))}
        pp[f"gate_{idx}"] = gate_params(tm.ppnet.gate_layers[idx])
    params["ppnet"] = pp
    lk = n2j(np.stack([t2n(m.weight).T for m in tm.ppnet_linears]))
    params["ppnet_linears"] = {"kernel": lk}
    if use_atten:
        params["atten"] = copy_atten(tm)
    return tm, jm, params, {"ppnet": pp_stats}


def stack_mlps_nobn(torch_mlps):
    """Stack bn-free, output-layer-free MLPs (PLE's CGC experts,
    ple.py:87-93): every Linear is a hidden layer named linear_i —
    stack_mlps' 'last linear = out' heuristic does not apply."""
    linears = [[m for m in mlp.layers if isinstance(m, torch.nn.Linear)]
               for mlp in torch_mlps]
    return {f"linear_{i}": {
        "kernel": n2j(np.stack([t2n(ls[i].weight).T for ls in linears])),
        "bias": n2j(np.stack([t2n(ls[i].bias) for ls in linears]))}
        for i in range(len(linears[0]))}


def pack_ple(tm, use_atten):
    """Reference PLE weights -> our param/stats trees (model/ple.py:28-99
    -> aread_tpu/models/ple.py). Separated from build_ple so grad_check
    can re-pack with .data temporarily swapped to .grad (generic
    per-block gradient parity without a hand-written grad mapper)."""
    params = {
        "embedding": {"table": n2j(t2n(tm.embedding.embedding_dict.weight))},
        "linear": {"kernel": n2j(t2n(tm.linear.fc.weight).T),
                   "bias": n2j(t2n(tm.linear.fc.bias))},
    }
    stats = {}
    for i, cgc in enumerate(tm.cgc_layers):
        # torch expert order: experts_specific[task*n_spec + e] — identical
        # to our jnp.repeat layout (models/ple.py CGC)
        blk = {"experts_specific": stack_mlps_nobn(cgc.experts_specific),
               "experts_shared": stack_mlps_nobn(cgc.experts_shared)}
        gk, gb = stack_linears([g[0] for g in cgc.gates_specific])
        blk["gates_specific"] = {"kernel": gk, "bias": gb}
        if cgc.cur_level < cgc.n_level:
            blk["gate_shared"] = {
                "kernel": n2j(t2n(cgc.gate_shared[0].weight).T),
                "bias": n2j(t2n(cgc.gate_shared[0].bias))}
        params[f"cgc_{i}"] = blk
    tow_p, tow_s = stack_mlps(tm.towers)
    params["towers"] = tow_p
    stats["towers"] = tow_s
    if use_atten:
        params["atten"] = copy_atten(tm)
    return params, stats


def build_ple(dims, embed_dim, n_tower, dropout, use_atten, cfg_ours):
    """PLE weight copy (VERDICT r4 item 4 — the one gated model never
    probed; reference model/ple.py:76-128 CGC levels + shared gates)."""
    from types import SimpleNamespace

    from model.ple import PLE as TorchPLE

    from aread_tpu.models.ple import PLE

    mh = {"multi_hot_flag": [False] * len(dims), "seq_maxlen": 5,
          "itemid_idx": 1, "method": "mean"}
    tcfg = SimpleNamespace(use_dcn=False, use_atten=use_atten,
                           atten_embed_dim=64, att_layer_num=3,
                           att_head_num=2, att_res=True)
    expert_dims = tuple(tuple(d) for d in cfg_ours.ple_expert_dims)
    tm = TorchPLE(np.array(dims), embed_dim, mh, n_tower,
                  cfg_ours.ple_n_expert_specific,
                  cfg_ours.ple_n_expert_shared,
                  [list(d) for d in expert_dims],
                  list(cfg_ours.ple_tower_dims), dropout=dropout,
                  config=tcfg)
    spec = FeatureSpec(one_hot_dims=tuple(dims), n_seq_fields=0,
                       itemid_idx=1, domain_idx=DOMAIN_IDX)
    jm = PLE(spec=spec, embed_dim=embed_dim, n_tower=n_tower,
             n_expert_specific=cfg_ours.ple_n_expert_specific,
             n_expert_shared=cfg_ours.ple_n_expert_shared,
             expert_dims=expert_dims,
             tower_dims=tuple(cfg_ours.ple_tower_dims), dropout=dropout,
             use_dcn=False, use_atten=use_atten)
    params, stats = pack_ple(tm, use_atten)
    return tm, jm, params, stats


BUILDERS = {"mmoe": build_mmoe, "pepnet": build_pepnet, "ple": build_ple}
# packers usable for the generic swap-grads grad_check (pack reads .data,
# so swapping .data <-> .grad re-packs the GRADIENTS in our tree layout)
PACKERS = {"ple": pack_ple}


def grad_check(tm, jm, params, stats, bx, by, grp, reg_rules, packer=None,
               use_atten=True):
    """Step-0 gradient parity per top-level block: torch autograd vs jax.

    Relative error is ||g_ref - g_tpu|| / (||g_ref|| + 1e-12) per block.
    ``packer``: optional (tm, use_atten) -> (params, stats) weight packer
    (PACKERS) — the reference gradients are then obtained by temporarily
    swapping every parameter's .data with its .grad and re-running the
    SAME packer, so any model with a packer gets grad parity for free
    (no hand-written per-model gradient mapper)."""
    import jax.tree_util as jtu

    from aread_tpu.train.trainer import TABLE_L2, bce_with_logits, masked_mean

    tm.train()
    X, yb = torch.tensor(bx), torch.tensor(by)
    g = torch.full((len(bx), 1), grp, dtype=torch.int64)
    pred = tm(X)
    loss = torch.nn.BCELoss()(pred.gather(1, g).squeeze(1), yb) \
        + tm.get_regularization_loss(device="cpu")
    tm.zero_grad()
    loss.backward()

    def jloss(p):
        out, _ = jm.apply({"params": p, "batch_stats": stats},
                          jnp.asarray(bx.astype(np.int32)), train=True,
                          mask=jnp.ones(len(bx)), mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(1)})
        logit = out["logit"]
        if logit.ndim == 2:
            logit = logit[:, grp]
        from aread_tpu.models.base import regularization_loss
        # TRUE table L2 (not the stop-gradient report term): the real step
        # folds this gradient into the fused Adam update (hybrid_update
        # l2=TABLE_L2); torch autograd carries it in the loss — for an
        # apples-to-apples grad comparison it must be differentiable here
        return (masked_mean(bce_with_logits(logit, jnp.asarray(by)),
                            jnp.ones(len(bx)))
                + regularization_loss(p, reg_rules)
                + TABLE_L2 * jnp.sum(jnp.square(p["embedding"]["table"])))

    jg = jax.grad(jloss)(params)

    # mirror the weight-copy mapping for gradients
    def tg(t):
        return np.array(t2n(t.grad), dtype=np.float32, copy=True)

    if packer is not None:
        # generic path: re-pack with .data swapped to .grad
        saved = []
        with torch.no_grad():
            for p in tm.parameters():
                saved.append(p.data)
                p.data = (p.grad if p.grad is not None
                          else torch.zeros_like(p.data))
        try:
            ref_g, _ = packer(tm, use_atten)
        finally:
            with torch.no_grad():
                for p, d in zip(tm.parameters(), saved):
                    p.data = d
        print("\n== step-0 gradient parity (rel err per block) ==")
        worst = 0.0
        for blk in sorted(params):
            r_leaves = jtu.tree_leaves(ref_g[blk])
            j_leaves = jtu.tree_leaves(jg[blk])
            num = np.sqrt(sum(
                float(np.sum((np.asarray(a) - np.asarray(b)) ** 2))
                for a, b in zip(r_leaves, j_leaves)))
            den = np.sqrt(sum(float(np.sum(np.asarray(a) ** 2))
                              for a in r_leaves)) + 1e-12
            rel = num / den
            worst = max(worst, rel)
            print(f"  {blk:12s} rel {rel:.3e}  (||g_ref|| {den:.4f})")
        print(f"  worst block rel err: {worst:.3e}")
        tm.zero_grad()
        return worst

    ref_g = {"embedding": {"table": tg(tm.embedding.embedding_dict.weight)},
             "linear": {"kernel": tg(tm.linear.fc.weight).T,
                        "bias": tg(tm.linear.fc.bias)}}
    exp_lin = [[m for m in mlp.layers if isinstance(m, torch.nn.Linear)]
               for mlp in tm.experts]
    exp_bn = [[m for m in mlp.layers if isinstance(m, torch.nn.BatchNorm1d)]
              for mlp in tm.experts]
    tow_lin = [[m for m in mlp.layers if isinstance(m, torch.nn.Linear)]
               for mlp in tm.towers]
    tow_bn = [[m for m in mlp.layers if isinstance(m, torch.nn.BatchNorm1d)]
              for mlp in tm.towers]

    def pack(lin, bn, out_layer):
        d = {}
        n_hidden = len(bn[0])
        for i in range(n_hidden):
            d[f"linear_{i}"] = {
                "kernel": np.stack([tg(l[i].weight).T for l in lin]),
                "bias": np.stack([np.array(t2n(l[i].bias.grad), copy=True)
                                  for l in lin])}
            d[f"bn_{i}"] = {
                "scale": np.stack([np.array(t2n(b[i].weight.grad), copy=True)
                                   for b in bn]),
                "bias": np.stack([np.array(t2n(b[i].bias.grad), copy=True)
                                  for b in bn])}
        if out_layer:
            d["out"] = {
                "kernel": np.stack([tg(l[-1].weight).T for l in lin]),
                "bias": np.stack([np.array(t2n(l[-1].bias.grad), copy=True)
                                  for l in lin])}
        return d

    def tgl(m):  # kernel grad transposed for a single Linear
        return tg(m.weight).T

    ref_g["experts"] = pack(exp_lin, exp_bn, out_layer=False)
    ref_g["towers"] = pack(tow_lin, tow_bn, out_layer=True)
    ref_g["gates"] = {
        "kernel": np.stack([tgl(gm[0]) for gm in tm.gates]),
        "bias": np.stack([np.array(t2n(gm[0].bias.grad), copy=True)
                          for gm in tm.gates])}
    if "atten" in params:
        a = {"atten_embedding": {"kernel": tgl(tm.atten_embedding),
                                 "bias": np.array(t2n(tm.atten_embedding.bias.grad), copy=True)},
             "atten_linear": {"kernel": tgl(tm.atten_linear)}}
        for i, attn in enumerate(tm.self_attns):
            a[f"attn_{i}"] = {
                "in_proj_kernel": tg(attn.in_proj_weight).T,
                "in_proj_bias": np.array(t2n(attn.in_proj_bias.grad), copy=True),
                "out_proj": {"kernel": tgl(attn.out_proj),
                             "bias": np.array(t2n(attn.out_proj.bias.grad), copy=True)}}
        if tm.att_res:
            a["v_res"] = {"kernel": tgl(tm.V_res_embedding),
                          "bias": np.array(t2n(tm.V_res_embedding.bias.grad), copy=True)}
        ref_g["atten"] = a

    print("\n== step-0 gradient parity (rel err per block) ==")
    worst = 0.0
    for blk in sorted(params):
        r_leaves = jtu.tree_leaves(ref_g[blk])
        j_leaves = jtu.tree_leaves(jg[blk])
        num = np.sqrt(sum(float(np.sum((np.asarray(a) - np.asarray(b)) ** 2))
                          for a, b in zip(r_leaves, j_leaves)))
        den = np.sqrt(sum(float(np.sum(np.asarray(a) ** 2))
                          for a in r_leaves)) + 1e-12
        rel = num / den
        worst = max(worst, rel)
        print(f"  {blk:12s} rel {rel:.3e}  (||g_ref|| {den:.4f})")
    print(f"  worst block rel err: {worst:.3e}")
    tm.zero_grad()
    return worst


def torch_twin_control(build, dims, cfg, n_tower, dropout, atten, batches,
                       bs, lr, perturb=1e-6):
    """Chaos control: TWO torch replicas, one with a single weight nudged
    by ``perturb``, trained on the identical batch schedule. The per-step
    |loss_a - loss_b| trajectory is the system's intrinsic divergence rate
    — the yardstick the jax-vs-torch deltas must be judged against."""
    torch.manual_seed(0)
    tm_a, _, _, _ = build(dims, cfg.embed_dim, n_tower, dropout, atten, cfg)
    torch.manual_seed(0)
    tm_b, _, _, _ = build(dims, cfg.embed_dim, n_tower, dropout, atten, cfg)
    with torch.no_grad():
        # first >=2-d parameter (model-generic; was mmoe's experts[0])
        w = next(p for p in tm_b.parameters() if p.ndim >= 2)
        w.view(-1)[0] += perturb
    crit = torch.nn.BCELoss()
    opts = [torch.optim.Adam(m.parameters(), lr=lr, betas=(0.9, 0.99),
                             eps=1e-8, weight_decay=1e-8)
            for m in (tm_a, tm_b)]
    tm_a.train(), tm_b.train()
    print(f"\n== torch twin control (perturb {perturb:g}) ==")
    deltas = []
    for i, (bx, by, grp) in enumerate(batches):
        X, yb = torch.tensor(bx), torch.tensor(by)
        g = torch.full((len(bx), 1), grp, dtype=torch.int64)
        ls = []
        for m, o in zip((tm_a, tm_b), opts):
            pred = m(X)
            loss = crit(pred.gather(1, g).squeeze(1), yb) \
                + m.get_regularization_loss(device="cpu")
            m.zero_grad(); loss.backward(); o.step()
            ls.append(float(loss.item()))
        d = abs(ls[0] - ls[1])
        deltas.append(d)
        if i % 5 == 0 or d > 0.05:
            print(f"  step {i:4d}  a {ls[0]:.5f}  b {ls[1]:.5f}  |d| {d:.2e}")
    return deltas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mmoe", choices=sorted(BUILDERS))
    ap.add_argument("--rows", type=int, default=24000)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--atten", type=int, default=1)
    ap.add_argument("--eval_every", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--grad_check", action="store_true",
                    help="compare step-0 gradients per block, then exit")
    ap.add_argument("--twin", action="store_true",
                    help="torch-vs-perturbed-torch chaos control, then exit")
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    (tx, ty), (vx, vy), dims = gen_data(args.rows)
    d2g = np.asarray(DOMAIN2GROUP["aliccp"]["dcn_3groups_kl"])
    n_tower = 3

    cfg = Config(model=args.model, bs=args.bs, lr=args.lr, wd=1e-8,
                 embed_dim=8, dropout=args.dropout, use_dcn=False,
                 use_atten=bool(args.atten), sparse_table_grad=False,
                 # bit-exact torch-Adam moments: this probe compares loss
                 # trajectories at 1e-7, so the bf16m production default
                 # must not apply here
                 table_moments_dtype="float32",
                 device_data="0", platform="cpu")
    tm, jm, params, stats = BUILDERS[args.model](
        dims, cfg.embed_dim, n_tower, args.dropout, bool(args.atten), cfg)

    trainer = Trainer(jm, cfg, N_DOMAIN, domain2group=d2g)
    batches = domain_batches(tx, ty, d2g, args.bs,
                             epochs=1 + args.steps * args.bs // len(tx))
    batches = batches[:args.steps]

    if args.twin:
        torch_twin_control(BUILDERS[args.model], dims, cfg, n_tower,
                           args.dropout, bool(args.atten), batches,
                           args.bs, args.lr)
        return
    if args.grad_check:
        assert args.model == "mmoe" or args.model in PACKERS, (
            "grad_check needs the mmoe packing or a PACKERS entry")
        from aread_tpu.train.trainer import strip_table_rule
        bx, by, grp = batches[0]
        grad_check(tm, jm, params, stats, bx, by, grp,
                   strip_table_rule(type(jm).REG_RULES),
                   packer=PACKERS.get(args.model),
                   use_atten=bool(args.atten))
        return

    # --- ours: init shapes via the real path, then overwrite with the copy
    b0 = {"x": batches[0][0], "y": batches[0][1],
          "valid": np.ones(args.bs, np.float32),
          "group": np.full(args.bs, batches[0][2], np.int32)}
    p0, s0, _ = trainer.init(jax.random.PRNGKey(0), b0)
    chex_mismatch = [k for k in p0 if k not in params]
    assert not chex_mismatch, f"uncopied param blocks: {chex_mismatch}"
    import jax.tree_util as jtu
    jtu.tree_map(lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
        AssertionError(f"shape {a.shape} vs {b.shape}")), p0, params)
    state = {"batch_stats": stats} if "batch_stats" in s0 else {}
    opt_state = hybrid_init(trainer.optimizer, params,
                            moments_dtype=cfg.table_moments_dtype)
    step = trainer._build_train_step()

    # --- torch side: exact reference train dispatch (run.py:497-500,505)
    opt_t = torch.optim.Adam(tm.parameters(), lr=args.lr, betas=(0.9, 0.99),
                             eps=1e-8, weight_decay=1e-8)
    crit = torch.nn.BCELoss(reduction="mean")

    @jax.jit
    def eval_ours(params, state, x, group):
        out = jm.apply({"params": params, **state}, x, train=False)
        prob = out["prob"]
        if prob.ndim == 2:
            prob = jnp.take_along_axis(prob, group[:, None], axis=1)[:, 0]
        return prob

    def safe_auc(y, probs):
        """A collapsed run's loss explosion turns predictions NaN; report
        0.5 (the chance band) instead of crashing the probe."""
        probs = np.concatenate(probs)
        if not np.isfinite(probs).all():
            return 0.5
        return roc_auc_score(y, probs)

    def auc_ours(params, state):
        probs = []
        for s in range(0, len(vx), 4096):
            xs = jnp.asarray(vx[s:s + 4096].astype(np.int32))
            g = jnp.asarray(d2g[vx[s:s + 4096, DOMAIN_IDX]].astype(np.int32))
            probs.append(np.asarray(eval_ours(params, state, xs, g)))
        return safe_auc(vy, probs)

    def auc_torch():
        tm.eval()
        with torch.no_grad():
            probs = []
            for s in range(0, len(vx), 4096):
                pred = tm(torch.tensor(vx[s:s + 4096]))
                g = torch.tensor(d2g[vx[s:s + 4096, DOMAIN_IDX]].astype(np.int64))
                probs.append(pred.gather(1, g[:, None]).squeeze(1).numpy())
        tm.train()
        return safe_auc(vy, probs)

    tm.train()
    rng = jax.random.PRNGKey(123 + args.seed)
    max_dloss, report = 0.0, []
    t0 = time.time()
    print_every = max(25, args.steps // 20)
    for i, (bx, by, grp) in enumerate(batches):
        # torch step
        X = torch.tensor(bx)
        yb = torch.tensor(by)
        g = torch.full((args.bs, 1), grp, dtype=torch.int64)
        pred = tm(X)
        loss_t = crit(pred.gather(1, g).squeeze(1), yb) \
            + tm.get_regularization_loss(device="cpu")
        tm.zero_grad()
        loss_t.backward()
        opt_t.step()
        loss_t = float(loss_t.item())

        # ours step
        batch = {"x": jnp.asarray(bx.astype(np.int32)),
                 "y": jnp.asarray(by),
                 "valid": jnp.ones(args.bs, jnp.float32),
                 "group": jnp.full((args.bs,), grp, jnp.int32)}
        rng, srng = jax.random.split(rng)
        params, state, opt_state, loss_j = step(params, state, opt_state,
                                                batch, srng)
        loss_j = float(loss_j)
        d = abs(loss_t - loss_j)
        max_dloss = max(max_dloss, d)
        if i % print_every == 0 or (d > 0.05 and args.steps <= 200):
            print(f"step {i:4d}  ref {loss_t:.5f}  tpu {loss_j:.5f}  "
                  f"|d| {d:.2e}", flush=True)
        if (i + 1) % args.eval_every == 0:
            a_t, a_j = auc_torch(), auc_ours(params, state)
            report.append({"step": i + 1, "ref_auc": a_t, "tpu_auc": a_j,
                           "max_dloss": max_dloss})
            print(f"  == step {i+1}: valid AUC ref {a_t:.4f} "
                  f"tpu {a_j:.4f}  (max |dloss| so far {max_dloss:.2e}, "
                  f"{time.time()-t0:.0f}s)", flush=True)

    out = {"model": args.model, "dropout": args.dropout,
           "atten": bool(args.atten), "steps": len(batches),
           "seed": args.seed, "max_dloss": max_dloss, "evals": report}
    print(json.dumps(out))
    path = os.path.join(REPO, "benchmarks",
                        f"probe_dynamics_{args.model}_s{args.seed}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
