"""AREAD model + HEMP trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aread_tpu.config import Config
from aread_tpu.data.loader import DomainBatcher, make_synthetic_data
from aread_tpu.models.aread import AREAD, full_mask
from aread_tpu.train.hemp import AREADTrainer
from aread_tpu.utils.masks import create_single_full_mask, validate_mask

N_TOWER = (2, 4, 8)


def _model(spec, n_domain):
    return AREAD(spec=spec, embed_dim=8, n_tower=N_TOWER, n_domain=n_domain,
                 base_model="mmoe", expert_dims=(16, 8),
                 tower_dims=((8, 8), (8, 8), (8, 8)), mmoe_n_expert=2)


@pytest.fixture(scope="module")
def aread_setup():
    data = make_synthetic_data(n_rows=1024, n_domain=3, vocab=60, seed=1)
    model = _model(data.spec, data.n_domain)
    x = jnp.asarray(data.train_x[:16])
    variables = jax.jit(
        lambda r, xx: model.init({"params": r, "dropout": r}, xx, mode="wo_mask")
    )(jax.random.PRNGKey(0), x)
    return data, model, variables


def test_wo_mask_forward(aread_setup):
    data, model, variables = aread_setup
    x = jnp.asarray(data.train_x[:16])
    out = jax.jit(lambda v, xx: model.apply(v, xx, mode="wo_mask"))(variables, x)
    assert out["prob"].shape == (16,)
    assert out["leaf_prob"].shape == (16, N_TOWER[-1])
    assert len(out["gate_means"]) == len(N_TOWER) - 1
    assert out["gate_means"][0].shape == (N_TOWER[0], N_TOWER[1])
    # mean over all leaves (aread.py:186)
    np.testing.assert_allclose(np.asarray(out["prob"]),
                               np.asarray(out["leaf_prob"]).mean(1), rtol=1e-5)


def test_masked_forward_zeroes_inactive_leaves(aread_setup):
    data, model, variables = aread_setup
    x = jnp.asarray(data.train_x[:16])
    rng = np.random.default_rng(0)
    mask = [m.copy() for m in full_mask(N_TOWER)]
    mask[-1][:4, 0] = False  # deactivate first 4 leaves' outputs
    mask[-2][:, 0] = False   # and leaf 0's inputs
    mask = validate_mask(mask)
    dm = tuple(jnp.asarray(m) for m in mask)

    out = jax.jit(lambda v, xx, d: model.apply(v, xx, domain_mask=d,
                                               mode="domain_with_mask"))(variables, x, dm)
    active = np.asarray(out["leaf_active"])
    probs = np.asarray(out["leaf_prob"])
    expect = (probs * active[None]).sum(1) / active.sum()
    np.testing.assert_allclose(np.asarray(out["prob"]), expect, rtol=1e-5)


def test_masked_equals_womask_under_full_mask(aread_setup):
    """With an all-active mask, domain_with_mask must equal wo_mask apart
    from the group embedding (we null it by zeroing the group table)."""
    data, model, variables = aread_setup
    x = jnp.asarray(data.train_x[:16])
    params = dict(variables["params"])
    params["group_embedding"] = jnp.zeros_like(params["group_embedding"])
    v2 = {**variables, "params": params}
    dm = tuple(jnp.asarray(m) for m in full_mask(N_TOWER))
    out_full = model.apply(v2, x, domain_mask=dm, mode="domain_with_mask")
    out_wo = model.apply(v2, x, mode="wo_mask")
    np.testing.assert_allclose(np.asarray(out_full["prob"]),
                               np.asarray(out_wo["prob"]), rtol=1e-4)


def test_batch_with_mask_equals_per_domain(aread_setup):
    """Serving mode: per-example masks (mode='batch_with_mask') must match
    running each domain's slice through its own mask (domain_with_mask) —
    the equivalence that lets Predictor serve a mixed-domain request as
    ONE dispatch (reference eval loops per domain, run.py:718-727)."""
    data, model, variables = aread_setup
    x = jnp.asarray(data.train_x[:24])
    rng = np.random.default_rng(3)
    # three distinct random valid masks, one per domain
    masks = []
    for d in range(3):
        m = [mm.copy() for mm in full_mask(N_TOWER)]
        for li in range(1, len(m)):
            drop = rng.random(m[li].shape) < 0.4
            m[li] = m[li] & ~drop
        masks.append(validate_mask([np.asarray(mm) for mm in m]))
    dom = np.asarray(data.train_x[:24])[:, data.spec.domain_idx] % 3
    stacked = tuple(
        jnp.asarray(np.stack([np.asarray(masks[d][li], bool)
                              for d in range(3)]))[jnp.asarray(dom)]
        for li in range(len(masks[0])))
    out_b = jax.jit(lambda v, xx, dm: model.apply(
        v, xx, domain_mask=dm, mode="batch_with_mask"))(variables, x, stacked)
    assert out_b["prob"].shape == (24,)
    for d in range(3):
        idx = np.nonzero(dom == d)[0]
        if len(idx) == 0:
            continue
        dm = tuple(jnp.asarray(np.asarray(m, bool)) for m in masks[d])
        out_d = model.apply(variables, x[idx], domain_mask=dm,
                            mode="domain_with_mask")
        np.testing.assert_allclose(np.asarray(out_b["prob"])[idx],
                                   np.asarray(out_d["prob"]),
                                   rtol=1e-5, atol=1e-6)


def test_hemp_training_smoke():
    """One epoch of the full AREAD/HEMP flow on a tiny setup: warm-up,
    mask evolution, bagging steps, per-domain eval."""
    data = make_synthetic_data(n_rows=768, n_domain=3, vocab=60, seed=2)
    model = _model(data.spec, data.n_domain)
    cfg = Config(model="aread", bs=128, lr=1e-3, embed_dim=8,
                 warm_up_interval=1,       # -> 8 warm-up steps at bs=128
                 regroup_interval=1,       # -> regroup every 8 steps
                 regroup_update_step=2, regroup_eval_step=2,
                 candidate_mask_num=2, epoch=1)
    trainer = AREADTrainer(model, cfg, data.n_domain)
    result = trainer.fit(data, epochs=1, verbose=False)
    assert np.isfinite(result["history"][0]["train_loss"])
    assert "total_auc" in result["test"]
    # every domain received a mask with a live output path
    for d in range(data.n_domain):
        m = result["domain_mask"][d]
        assert m is not None and m[-1].any()


def test_final_mode_freezes_body(aread_setup):
    """'domain_mask_final' BCE gradients flow ONLY into the final gate
    (reference aread.py:245-261 computes the body under no_grad and detaches
    the gate input)."""
    data, model, variables = aread_setup
    x = jnp.asarray(data.train_x[:16])
    y = jnp.asarray(data.train_y[:16].astype(np.float32))
    dm = tuple(jnp.asarray(m) for m in full_mask(N_TOWER))
    # init with the final mode so final_gate params exist
    variables = jax.jit(
        lambda r, xx: model.init({"params": r, "dropout": r}, xx,
                                 domain_mask=tuple(np.asarray(m) for m in full_mask(N_TOWER)),
                                 mode="domain_mask_final")
    )(jax.random.PRNGKey(0), x)

    def bce(params):
        out = model.apply({"params": params, **{k: v for k, v in variables.items()
                                                if k != "params"}},
                          x, domain_mask=dm, mode="domain_mask_final", train=False)
        p = jnp.clip(out["prob"], 1e-7, 1 - 1e-7)
        return -jnp.mean(y * jnp.log(p) + (1 - y) * jnp.log1p(-p))

    grads = jax.jit(jax.grad(bce))(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        norm = float(jnp.abs(g).max())
        if "final_gate" in name:
            assert norm > 0, f"final_gate got zero grad: {name}"
        else:
            assert norm == 0, f"body param {name} got grad {norm}"


def test_hemp_final_gate_smoke():
    """fit(final_gate=True) runs the post-HEMP final-gate phase and tests
    through the trained gate (reference run.py:861-885)."""
    data = make_synthetic_data(n_rows=512, n_domain=3, vocab=60, seed=3)
    model = _model(data.spec, data.n_domain)
    cfg = Config(model="aread", bs=128, lr=1e-3, embed_dim=8,
                 warm_up_interval=1, regroup_interval=1,
                 regroup_update_step=1, regroup_eval_step=1,
                 candidate_mask_num=1, epoch=1, final_epoch=1)
    trainer = AREADTrainer(model, cfg, data.n_domain)
    result = trainer.fit(data, epochs=1, verbose=False, final_gate=True)
    phases = [h.get("phase") for h in result["history"]]
    assert "final_gate" in phases
    assert np.isfinite(result["test"]["total_auc"])


def test_final_phase_optimizer_freezes_body():
    """The final-gate TRAINING phase must leave every non-final_gate
    param BIT-unchanged (torch Adam skips gradless params; a full-tree
    dense-Adam update would walk the frozen body toward zero at
    ~final_lr/step through the decay term — the r5 2M-row run showed the
    collapse as valid mean_auc pinned at exactly 0.5)."""
    from aread_tpu.data.loader import DomainBatcher

    data = make_synthetic_data(n_rows=512, n_domain=3, vocab=60, seed=3)
    model = _model(data.spec, data.n_domain)
    cfg = Config(model="aread", bs=128, lr=1e-3, embed_dim=8,
                 warm_up_interval=1, regroup_interval=1,
                 regroup_update_step=1, regroup_eval_step=1,
                 candidate_mask_num=1, epoch=1, final_epoch=1)
    trainer = AREADTrainer(model, cfg, data.n_domain)
    batcher = DomainBatcher(data.train_x, data.train_y, cfg.bs,
                            data.spec.domain_idx, data.n_domain, seed=0)
    sample = batcher.next_batch(0)
    params, state, _ = trainer.init(jax.random.PRNGKey(0), sample)
    # fresh trainer: give every domain the all-edges mask (fit() would
    # have evolved these before the final phase)
    trainer.mask_state.domain_mask = [
        [np.asarray(m, bool) for m in full_mask(model.n_tower)]
        for _ in range(data.n_domain)]
    fns = trainer._build_fns()
    before = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), params)
    fstate = fns["final_opt"].init(params["final_gate"])
    params, state, fstate, _, floss = trainer.train_final_epoch(
        params, state, fstate, 0, batcher, jax.random.PRNGKey(1),
        verbose=False)
    assert np.isfinite(floss)
    for key in before:
        b_leaves = jax.tree_util.tree_leaves(before[key])
        a_leaves = jax.tree_util.tree_leaves(params[key])
        if key == "final_gate":
            assert any((np.asarray(a) != b).any()
                       for a, b in zip(a_leaves, b_leaves)), \
                "final gate never trained"
        else:
            for a, b in zip(a_leaves, b_leaves):
                np.testing.assert_array_equal(np.asarray(a), b,
                                              err_msg=f"body moved: {key}")


def test_hemp_device_data_matches_host_path():
    """AREAD/HEMP over the HBM-resident split (config.device_data='1':
    index-gathered batches, device fast-adapt/probe stacks) must be
    numerically identical to the host-staged path — shared index stream,
    same rng chain, same pad semantics (loader pad_batch/gather_batch)."""
    import dataclasses

    import jax

    data = make_synthetic_data(n_rows=640, n_domain=3, vocab=60, seed=4)
    base = Config(model="aread", bs=96, lr=1e-3, embed_dim=8,
                  warm_up_interval=1, regroup_interval=2,
                  regroup_update_step=2, regroup_eval_step=2,
                  candidate_mask_num=2, epoch=1)

    def run(mode):
        cfg = dataclasses.replace(base, device_data=mode)
        trainer = AREADTrainer(_model(data.spec, data.n_domain), cfg,
                               data.n_domain)
        return trainer.fit(data, epochs=1, verbose=False)

    host = run("0")
    dev = run("1")
    for a, b in zip(jax.tree_util.tree_leaves(host["params"]),
                    jax.tree_util.tree_leaves(dev["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for mh, md in zip(host["domain_mask"], dev["domain_mask"]):
        for lh, ld in zip(mh, md):
            np.testing.assert_array_equal(lh, ld)
    assert host["test"]["total_auc"] == pytest.approx(
        dev["test"]["total_auc"], abs=1e-6)
