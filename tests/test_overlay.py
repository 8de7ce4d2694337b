"""Overlay fast-adapt (ops/overlay_adam + train/hemp) — the HEMP
candidate-chain engine whose cost is independent of table size.

The contract: an overlay chain is the SAME dense-Adam chain as the
full-table-sweep replication of the reference's fresh
torch.optim.Adam(lr=update_lr, weight_decay=wd) fast-adaptation
(run.py:632-657) — working-set rows through the compact sweep, all other
rows through the closed decay-only drift recurrence — so pruned masks
must match exactly and probe losses to float round-off.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aread_tpu.config import Config
from aread_tpu.data.loader import make_synthetic_data
from aread_tpu.models.aread import AREAD, full_mask
from aread_tpu.train.hemp import AREADTrainer
from aread_tpu.train.trainer import TABLE_L2, split_variables

N_TOWER = (2, 4)
N_CAND = 2
S_FA = 3   # adapt steps per chain
S_PR = 2   # probe steps


def _setup(flat: bool = True):
    data = make_synthetic_data(n_rows=512, n_domain=3, vocab=60, seed=5)
    spec = data.spec.with_flat_table(8) if flat else data.spec
    cfg = Config(model="aread", bs=32, embed_dim=8,
                 table_dtype="float32", table_moments_dtype="float32",
                 regroup_update_step=S_FA, regroup_eval_step=S_PR,
                 candidate_mask_num=N_CAND, warm_up_interval=1,
                 regroup_interval=4)
    model = AREAD(spec=spec, embed_dim=8, n_tower=N_TOWER,
                  n_domain=data.n_domain, base_model="mmoe",
                  expert_dims=(16, 8), tower_dims=((8, 8), (8, 8)),
                  mmoe_n_expert=2)
    x0 = jnp.asarray(data.train_x[:32])
    variables = jax.jit(
        lambda r, xx: model.init({"params": r, "dropout": r}, xx,
                                 mode="wo_mask")
    )(jax.random.PRNGKey(0), x0)
    params, state = split_variables(variables)
    return data, cfg, model, params, state


def _stacks(data, rng):
    """Host-path candidate stacks: fa [N, S, bs, ...] with adapt ids drawn
    from the train split and probe ids SHIFTED so some probe rows fall
    outside every adapt batch (exercising the drift fallback)."""
    bs, F = 32, data.train_x.shape[1]
    dims = np.asarray(data.spec.one_hot_dims)

    def stack(n_steps, shift):
        xs = np.empty((N_CAND, n_steps, bs, F), np.int32)
        ys = np.empty((N_CAND, n_steps, bs), np.float32)
        for c in range(N_CAND):
            for s in range(n_steps):
                idx = rng.integers(0, len(data.train_x), size=bs)
                x = data.train_x[idx].astype(np.int64).copy()
                if shift:
                    # rotate every one-hot field's ids within its vocab
                    for f in range(min(len(dims), x.shape[1])):
                        x[:, f] = (x[:, f] + 7) % dims[f]
                xs[c, s] = x.astype(np.int32)
                ys[c, s] = data.train_y[idx]
        return {"x": jnp.asarray(xs), "y": jnp.asarray(ys),
                "valid": jnp.ones((N_CAND, n_steps, bs), jnp.float32)}

    return stack(S_FA, shift=False), stack(S_PR, shift=True)


def _masks0(model, n_cand):
    fm = full_mask(model.n_tower)
    rng = np.random.default_rng(2)
    per_cand = []
    for _ in range(n_cand):
        m = [mm.copy() for mm in fm]
        for li in range(1, len(m)):
            m[li] = m[li] & ~(rng.random(m[li].shape) < 0.3)
        from aread_tpu.utils.masks import validate_mask
        per_cand.append(validate_mask([np.asarray(x) for x in m]))
    return tuple(jnp.asarray(np.stack([np.asarray(per_cand[c][li], bool)
                                       for c in range(n_cand)]))
                 for li in range(len(fm)))


def test_overlay_matches_full_sweep():
    data, cfg, model, params, state = _setup(flat=True)
    tr_full = AREADTrainer(
        model, dataclasses.replace(cfg, hemp_fast_adapt="full"),
        data.n_domain)
    tr_ov = AREADTrainer(
        model, dataclasses.replace(cfg, hemp_fast_adapt="overlay"),
        data.n_domain)
    assert not tr_full.overlay_enabled() and tr_ov.overlay_enabled()
    fns_full = tr_full._build_fns()
    fns_ov = tr_ov._build_fns()

    rng = np.random.default_rng(7)
    fa, probe = _stacks(data, rng)
    masks0 = _masks0(model, N_CAND)
    keys = jax.random.split(jax.random.PRNGKey(11), N_CAND)

    m_full, l_full = fns_full["fast_adapt_many"](
        params, state, masks0, fa, probe, keys, False)
    drift_l2 = fns_ov["drift_l2"](params["embedding"]["table"])
    m_ov, l_ov = fns_ov["fast_adapt_many_ov"](
        params, state, masks0, fa, probe, keys, drift_l2)

    # pruned masks: exactly equal (pruning sees identical gate means)
    for lf, lo in zip(m_full, m_ov):
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(lo))
    # probe losses: same chain to FP noise. Bitwise equality is NOT
    # attainable between the two paths: they are different XLA programs
    # (the lookup override changes fusion around the gather), whose 1-ULP
    # gradient differences Adam's g/(|g|+eps) normalization amplifies by
    # ~lr/|g| per step (measured: |full[ws]-wvals| = 1 ULP after step 1,
    # probe-loss drift ~3e-5 after a 3-step chain; the same epsilon any
    # XLA fusion change introduces on the full path itself)
    np.testing.assert_allclose(np.asarray(l_ov), np.asarray(l_full),
                               rtol=2e-4, atol=2e-5)


def test_overlay_probe_losses_are_mask_sensitive():
    """Candidates with different masks must produce different probe
    losses through the overlay engine (guards against the override
    accidentally bypassing the adapted values)."""
    data, cfg, model, params, state = _setup(flat=True)
    tr = AREADTrainer(
        model, dataclasses.replace(cfg, hemp_fast_adapt="overlay"),
        data.n_domain)
    fns = tr._build_fns()
    rng = np.random.default_rng(9)
    fa, probe = _stacks(data, rng)
    masks0 = _masks0(model, N_CAND)
    keys = jax.random.split(jax.random.PRNGKey(3), N_CAND)
    drift_l2 = fns["drift_l2"](params["embedding"]["table"])
    _, losses = fns["fast_adapt_many_ov"](
        params, state, masks0, fa, probe, keys, drift_l2)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert abs(losses[0].mean() - losses[1].mean()) > 1e-9


def test_auto_mode_respects_measured_crossover():
    """'auto' must keep the full sweep below the measured overlay/full
    crossover (Amazon vocab included) and switch to overlay past it."""
    data, cfg, model, params, state = _setup(flat=True)
    tr = AREADTrainer(model, cfg, data.n_domain)  # default auto, tiny vocab
    assert not tr.overlay_enabled()
    big = AREADTrainer(model, cfg, data.n_domain)
    big.OVERLAY_AUTO_MIN_ELEMS = 1  # pretend the table is past crossover
    assert big.overlay_enabled()
    # mesh runs never auto-select overlay
    tr_mesh = AREADTrainer(model, cfg, data.n_domain, mesh=object())
    tr_mesh.OVERLAY_AUTO_MIN_ELEMS = 1
    assert not tr_mesh.overlay_enabled()
    # misconfiguration fails fast at CONSTRUCTION, not at the first
    # regroup a warm-up epoch in
    with pytest.raises(ValueError):
        AREADTrainer(model,
                     dataclasses.replace(cfg, hemp_fast_adapt="overlay"),
                     data.n_domain, mesh=object())
    with pytest.raises(ValueError):
        AREADTrainer(model,
                     dataclasses.replace(cfg, hemp_fast_adapt="typo"),
                     data.n_domain)


def test_batch_with_mask_is_eval_only():
    """train=True under per-example masks would update BN running stats
    ungated (tower_gate undefined per-example) — must refuse."""
    data, cfg, model, params, state = _setup(flat=True)
    from aread_tpu.models.aread import full_mask
    fm = full_mask(N_TOWER)
    x = jnp.asarray(data.train_x[:8])
    dm = tuple(jnp.asarray(np.asarray(m, bool))[None].repeat(8, 0)
               for m in fm)
    with pytest.raises(AssertionError):
        model.apply({"params": params, **state}, x, domain_mask=dm,
                    mode="batch_with_mask", train=True,
                    mutable=list(state.keys()),
                    rngs={"dropout": jax.random.PRNGKey(0)})


def test_compact_grad_and_working_set():
    from aread_tpu.ops import overlay_adam as oa
    from aread_tpu.ops.sparse_adam import dedup_rows

    data, _, model, params, _ = _setup(flat=True)
    spec = model.spec
    rpf = 128 // 8
    xs = jnp.asarray(data.train_x[:2 * 16].reshape(2, 16, -1))
    ws = oa.build_working_set(spec, rpf, xs)
    ws_np = np.asarray(ws)
    assert (np.diff(ws_np) >= 0).all()
    # every batch id's flat row is present
    ids = np.asarray(oa._table_ids(spec, xs.reshape(-1, xs.shape[-1])))
    assert np.isin(np.unique(ids // rpf), ws_np).all()

    # compact_grad equals a dense scatter-densify restricted to ws
    K = 64
    rng = np.random.default_rng(0)
    n_rows = int(np.sum(spec.one_hot_dims))
    tids = np.sort(rng.choice(ids.reshape(-1), size=K, replace=False))
    g = rng.normal(size=(K, 8)).astype(np.float32)
    uids, gsum = dedup_rows(jnp.asarray(tids, jnp.int32),
                            jnp.asarray(g), n_rows)
    cg = np.asarray(oa.compact_grad(ws, uids, gsum, rpf))
    uids_np, gsum_np = np.asarray(uids), np.asarray(gsum)
    dense = np.zeros((n_rows // rpf, 128), np.float32)
    for k in range(K):
        if uids_np[k] >= n_rows:
            continue
        f, lane = uids_np[k] // rpf, uids_np[k] % rpf
        dense[f, lane * 8:(lane + 1) * 8] += gsum_np[k]
    np.testing.assert_allclose(cg, dense[ws_np], rtol=1e-6, atol=0)


def test_drift_equals_explicit_zero_grad_chain():
    from aread_tpu.ops import overlay_adam as oa
    from aread_tpu.ops.pallas.fused_adam import reference_adam_update

    rng = np.random.default_rng(1)
    w0 = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
    lr, wd, l2 = 1e-2, 1e-8, TABLE_L2
    w, m, v = w0, jnp.zeros_like(w0), jnp.zeros_like(w0)
    for t in range(1, 4):
        w, m, v = reference_adam_update(
            w, m, v, jnp.zeros_like(w), jnp.asarray(t, jnp.int32),
            lr=lr, weight_decay=wd, l2=l2)
    np.testing.assert_array_equal(
        np.asarray(oa.drift_rows(w0, 3, lr, wd, l2)), np.asarray(w))
    # the drift is NOT a no-op: decay*w normalizes to ~lr-scale steps
    assert float(jnp.abs(oa.drift_rows(w0, 3, lr, wd, l2) - w0).max()) > \
        0.5 * lr
