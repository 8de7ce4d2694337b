"""Multi-device tests on the forced 8-CPU mesh: row-sharded embedding
lookup correctness (fwd + bwd) and a sharded data-parallel train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from aread_tpu.config import Config
from aread_tpu.data.loader import GlobalBatcher
from aread_tpu.models.deepfm import DeepFM
from aread_tpu.parallel.embed_shard import (a2a_lookup,
                                            a2a_required_capacity,
                                            lookup_reference, pad_table_rows,
                                            sharded_lookup)
from aread_tpu.parallel.mesh import make_mesh, param_shardings
from aread_tpu.parallel.train_step import make_sharded_train_step, shard_params
from aread_tpu.train.trainer import Trainer, make_optimizer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def test_sharded_lookup_matches_reference():
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, size=(16, 5)), jnp.int32)
    table_p = pad_table_rows(table, mesh.shape["model"])
    got = sharded_lookup(table_p, ids, mesh)
    want = lookup_reference(table, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_sharded_lookup_gradient_is_scatter_add():
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 32, size=(8, 3)), jnp.int32)

    def loss_sharded(t):
        return jnp.sum(sharded_lookup(t, ids, mesh) ** 2)

    def loss_ref(t):
        return jnp.sum(lookup_reference(t, ids) ** 2)

    g_sharded = jax.grad(loss_sharded)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), rtol=1e-5)


def test_a2a_lookup_matches_reference_bit_identical():
    """Dedup + all-to-all exchange (VERDICT r1 item 2): forward must be
    bit-identical to the unsharded gather, at the always-exact capacity and
    at the measured (host-checked) capacity."""
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, size=(16, 5)), jnp.int32)
    want = np.asarray(lookup_reference(table, ids))
    got = a2a_lookup(table, ids, mesh)  # capacity=None -> always exact
    np.testing.assert_array_equal(np.asarray(got), want)
    cap = a2a_required_capacity(np.asarray(ids), 64, 2, n_data=4)
    assert cap < ids.size // 4  # dedup+bucketing beat the naive bound
    got2 = a2a_lookup(table, ids, mesh, capacity=cap)
    np.testing.assert_array_equal(np.asarray(got2), want)


def test_a2a_lookup_gradient_is_scatter_add():
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)
    # heavy duplication — exercises the dedup scatter-add transpose
    ids = jnp.asarray(rng.integers(0, 8, size=(8, 3)), jnp.int32)
    cap = a2a_required_capacity(np.asarray(ids), 32, 2, n_data=4)

    def loss_a2a(t):
        return jnp.sum(jnp.sin(a2a_lookup(t, ids, mesh, capacity=cap)) * 2.0)

    def loss_ref(t):
        return jnp.sum(jnp.sin(lookup_reference(t, ids)) * 2.0)

    g1 = jax.grad(loss_a2a)(table)
    g2 = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)


def test_a2a_lookup_under_jit_with_shardings():
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, size=(16, 5)), jnp.int32)
    ts = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ish = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    f = jax.jit(lambda t, i: a2a_lookup(t, i, mesh, capacity=12))
    want = np.asarray(lookup_reference(table, ids))
    cap = a2a_required_capacity(np.asarray(ids), 64, 2, n_data=4)
    assert cap <= 12
    np.testing.assert_array_equal(np.asarray(f(ts, ish)), want)


def test_a2a_lookup_overflow_poisons_with_nan():
    """Ids past the static bucket capacity NaN-poison the output (loud
    failure contract): an undersized capacity must never silently train on
    zero rows with dropped gradients — the trainers' finite checks trip
    instead. Callers bound capacity host-side via a2a_required_capacity."""
    mesh = make_mesh(data=4, model=2)
    table = jnp.ones((64, 4), jnp.float32)
    ids = jnp.asarray(np.arange(80).reshape(16, 5) % 64, jnp.int32)
    out = np.asarray(a2a_lookup(table, ids, mesh, capacity=1))
    assert np.isnan(out).any()
    # a sufficient capacity stays clean on the same ids
    cap = a2a_required_capacity(np.asarray(ids), 64, 2, n_data=4)
    ok = np.asarray(a2a_lookup(table, ids, mesh, capacity=cap))
    assert np.isfinite(ok).all()


def test_check_a2a_capacity_fails_fast(synthetic_data):
    """Trainer.fit with an undersized --a2a_capacity raises an actionable
    error on the first batch instead of NaN-poisoning step 1."""
    import dataclasses

    data = synthetic_data
    data = dataclasses.replace(data, spec=data.spec.pad_vocab(2))
    mesh = make_mesh(data=4, model=2)
    cfg = Config(bs=256, embed_dim=8, embed_lookup="a2a", a2a_capacity=1)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
    trainer = Trainer(model, cfg, data.n_domain, mesh=mesh)
    with pytest.raises(ValueError, match="a2a_capacity"):
        trainer.fit(data, epochs=1, verbose=False)


def test_a2a_sharded_step_matches_gspmd_step(synthetic_data):
    """The a2a lookup is selectable in the sharded train step and yields the
    same loss/params as the GSPMD-gather step."""
    data = synthetic_data
    cfg = Config(bs=256, lr=1e-3, embed_dim=8, dropout=0.0)
    spec = data.spec.pad_vocab(2)
    model = DeepFM(spec=spec, embed_dim=8, mlp_dims=(16,), dropout=0.0)
    trainer = Trainer(model, cfg, data.n_domain)
    batcher = GlobalBatcher(data.train_x, data.train_y, 256,
                            data.spec.domain_idx, shuffle=False)
    batch = next(iter(batcher))
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0), batch)

    mesh = make_mesh(data=4, model=2)
    optimizer = make_optimizer(cfg.lr, cfg.wd)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    results = {}
    for lookup in ("gspmd", "a2a"):
        sp, _ = shard_params(copy(params), mesh)
        step, place_batch = make_sharded_train_step(
            model, optimizer, mesh, type(model).REG_RULES, False,
            embed_lookup=lookup, a2a_capacity=None)
        so = optimizer.init(sp)
        results[lookup] = step(sp, state, so, place_batch(batch),
                               jax.random.PRNGKey(9))
    p1, _, _, loss1 = results["gspmd"]
    p2, _, _, loss2 = results["a2a"]
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2.2e-3)


def test_dp_sharded_step_matches_single_device(synthetic_data):
    """One train step on the (4 data x 2 model) mesh must match the
    unsharded step numerically (same params, same batch, no dropout)."""
    data = synthetic_data
    cfg = Config(bs=256, lr=1e-3, embed_dim=8, dropout=0.0)
    spec = data.spec.pad_vocab(2)  # table rows divisible by model axis
    model = DeepFM(spec=spec, embed_dim=8, mlp_dims=(16,), dropout=0.0)
    trainer = Trainer(model, cfg, data.n_domain)
    batcher = GlobalBatcher(data.train_x, data.train_y, 256,
                            data.spec.domain_idx, shuffle=False)
    batch = next(iter(batcher))
    params, state, opt_state = trainer.init(jax.random.PRNGKey(0), batch)

    # single-device step (donates its inputs — pass copies so the sharded
    # path below can reuse the originals)
    step1 = trainer._build_train_step()
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    p1, s1, o1, loss1 = step1(copy(params), copy(state), copy(opt_state),
                              jb, jax.random.PRNGKey(9))

    # sharded step
    mesh = make_mesh(data=4, model=2)
    optimizer = make_optimizer(cfg.lr, cfg.wd)
    sp, shardings = shard_params(params, mesh)
    sharded_step, place_batch = make_sharded_train_step(
        model, optimizer, mesh, type(model).REG_RULES, False)
    so = optimizer.init(sp)
    p2, s2, o2, loss2 = sharded_step(sp, state, so, place_batch(batch),
                                     jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    # After one Adam step the update is ~sign(grad)*lr, so f32 reduction-
    # order differences across shards can flip near-zero gradient signs;
    # compare at the step-size scale (2*lr) rather than elementwise-exact.
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2.2e-3)


def test_param_shardings_shard_only_table(synthetic_data):
    data = synthetic_data
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
    x = jnp.asarray(data.train_x[:4])
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0),
                                     "dropout": jax.random.PRNGKey(0)}, x)
    mesh = make_mesh(data=4, model=2)
    sh = param_shardings(variables["params"], mesh)
    assert sh["embedding"]["table"].spec == P("model", None)
    assert sh["linear"]["kernel"].spec == P()


def test_mesh_trainer_end_to_end(synthetic_data):
    """Full Trainer.fit on the (4 data x 2 model) mesh: the same jitted
    steps run SPMD via placement alone (batches data-sharded, table
    row-sharded)."""
    data = synthetic_data
    import dataclasses
    data = dataclasses.replace(data, spec=data.spec.pad_vocab(2))
    cfg = Config(bs=256, lr=1e-2, embed_dim=8, epoch=2)
    mesh = make_mesh(data=4, model=2)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
    trainer = Trainer(model, cfg, data.n_domain, mesh=mesh)
    result = trainer.fit(data, epochs=2, verbose=False)
    assert np.isfinite(result["history"][-1]["train_loss"])
    assert 0.0 <= result["test"]["total_auc"] <= 1.0
    # the table stayed row-sharded through training
    table = result["params"]["embedding"]["table"]
    assert len(table.sharding.device_set) == 8


def test_trainer_fit_with_a2a_lookup(synthetic_data):
    """config.embed_lookup='a2a' is production-selectable: a full
    Trainer.fit on the mesh with the a2a exchange matches the GSPMD-gather
    fit's losses (exact capacity -> identical math)."""
    import dataclasses
    data = synthetic_data
    data = dataclasses.replace(data, spec=data.spec.pad_vocab(2))
    mesh = make_mesh(data=4, model=2)

    def fit(lookup):
        cfg = Config(bs=256, lr=1e-2, embed_dim=8, epoch=1, dropout=0.0,
                     embed_lookup=lookup)
        model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,),
                       dropout=0.0)
        trainer = Trainer(model, cfg, data.n_domain, mesh=mesh)
        return trainer.fit(data, epochs=1, verbose=False)

    r1, r2 = fit("gspmd"), fit("a2a")
    np.testing.assert_allclose(r1["history"][-1]["train_loss"],
                               r2["history"][-1]["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(r1["test"]["total_auc"],
                               r2["test"]["total_auc"], atol=1e-6)


def test_trainer_a2a_requires_mesh():
    from aread_tpu.data.loader import make_synthetic_data

    data = make_synthetic_data(n_rows=64, n_domain=2, seed=0)
    cfg = Config(bs=32, embed_dim=8, embed_lookup="a2a")
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
    trainer = Trainer(model, cfg, data.n_domain)  # no mesh
    with pytest.raises(ValueError, match="mesh"):
        trainer._build_step_core()


def test_aread_trainer_honors_embed_lookup(synthetic_data):
    """--embed_lookup applies to --model aread too (it was silently
    ignored by AREADTrainer before): an a2a fit under the mesh matches the
    GSPMD fit's losses, and an invalid value fails loudly."""
    import dataclasses

    from aread_tpu.models.aread import AREAD
    from aread_tpu.train.hemp import AREADTrainer

    data = synthetic_data
    data = dataclasses.replace(data, spec=data.spec.pad_vocab(2))
    mesh = make_mesh(data=4, model=2)

    def fit(lookup):
        cfg = Config(bs=256, embed_dim=8, epoch=1, warm_up_interval=1,
                     regroup_interval=1, candidate_mask_num=1,
                     regroup_update_step=1, regroup_eval_step=1, dropout=0.0,
                     embed_lookup=lookup)
        model = AREAD(spec=data.spec, embed_dim=8, n_tower=(2, 4),
                      n_domain=data.n_domain, base_model="mmoe",
                      expert_dims=(16, 8), tower_dims=((8, 6), (6, 4)),
                      mmoe_n_expert=2, dropout=0.0)
        trainer = AREADTrainer(model, cfg, data.n_domain, mesh=mesh)
        return trainer.fit(data, epochs=1, verbose=False)

    r1, r2 = fit("gspmd"), fit("a2a")
    np.testing.assert_allclose(r1["history"][-1]["train_loss"],
                               r2["history"][-1]["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(r1["test"]["total_auc"],
                               r2["test"]["total_auc"], atol=1e-6)

    from aread_tpu.train.hemp import AREADTrainer as AT
    cfg_bad = Config(bs=64, embed_dim=8, embed_lookup="nope")
    model = AREAD(spec=data.spec, embed_dim=8, n_tower=(2, 4),
                  n_domain=data.n_domain, base_model="mmoe",
                  expert_dims=(16, 8), tower_dims=((8, 6), (6, 4)),
                  mmoe_n_expert=2)
    t = AT(model, cfg_bad, data.n_domain, mesh=mesh)
    with pytest.raises(ValueError, match="embed_lookup"):
        t._build_fns()


def test_hemp_evolution_under_mesh_matches_unsharded(synthetic_data):
    """HEMP mask evolution on the (4,2) mesh (VERDICT r1 item 7): the same
    snapshot + candidate schedule evolved with a row-sharded table must
    select the SAME masks and report the same probe losses as the
    unsharded evolution."""
    import dataclasses

    from aread_tpu.data.loader import DomainBatcher
    from aread_tpu.models.aread import AREAD
    from aread_tpu.train.hemp import AREADTrainer

    data = synthetic_data
    data = dataclasses.replace(data, spec=data.spec.pad_vocab(2))
    cfg = Config(bs=64, embed_dim=8, candidate_mask_num=2,
                 regroup_update_step=2, regroup_eval_step=2, seed=7)
    model = AREAD(spec=data.spec, embed_dim=8, n_tower=(2, 4),
                  n_domain=data.n_domain, base_model="mmoe",
                  expert_dims=(16, 8), tower_dims=((8, 6), (6, 4)),
                  mmoe_n_expert=2)

    def evolve(mesh):
        t = AREADTrainer(model, cfg, data.n_domain, mesh=mesh)
        tb = DomainBatcher(data.train_x, data.train_y.astype(np.float32),
                           cfg.bs, data.spec.domain_idx, data.n_domain,
                           seed=5)
        ab = DomainBatcher(data.train_x, data.train_y.astype(np.float32),
                           cfg.bs, data.spec.domain_idx, data.n_domain,
                           seed=6)
        batch = tb.next_batch(0)
        tb2 = DomainBatcher(data.train_x, data.train_y.astype(np.float32),
                            cfg.bs, data.spec.domain_idx, data.n_domain,
                            seed=5)  # fresh cursors for the evolution
        params, state, _ = t.init(jax.random.PRNGKey(0), batch)
        t._mask_evolution(params, state, tb2, ab, jax.random.PRNGKey(1),
                          verbose=False)
        masks = [[np.asarray(m) for m in dm] for dm in t.mask_state.domain_mask]
        return masks, t.mask_state

    masks1, _ = evolve(None)
    masks2, _ = evolve(make_mesh(data=4, model=2))
    for d, (m1, m2) in enumerate(zip(masks1, masks2)):
        for li, (a, b) in enumerate(zip(m1, m2)):
            np.testing.assert_array_equal(a, b, err_msg=f"domain {d} level {li}")


def test_mesh_aread_trainer_end_to_end(synthetic_data):
    """AREAD + HEMP fit over the mesh (scan chunks, mask evolution,
    masked eval all under SPMD placement)."""
    import dataclasses

    from aread_tpu.models.aread import AREAD
    from aread_tpu.train.hemp import AREADTrainer

    data = synthetic_data
    data = dataclasses.replace(data, spec=data.spec.pad_vocab(2))
    cfg = Config(bs=256, embed_dim=8, epoch=1, warm_up_interval=1,
                 regroup_interval=1, candidate_mask_num=1,
                 regroup_update_step=1, regroup_eval_step=1)
    mesh = make_mesh(data=4, model=2)
    model = AREAD(spec=data.spec, embed_dim=8, n_tower=(2, 4),
                  n_domain=data.n_domain, base_model="mmoe",
                  expert_dims=(16, 8), tower_dims=((8, 6), (6, 4)),
                  mmoe_n_expert=2)
    trainer = AREADTrainer(model, cfg, data.n_domain, mesh=mesh)
    result = trainer.fit(data, epochs=1, verbose=False)
    assert np.isfinite(result["history"][-1]["train_loss"])
    assert 0.0 <= result["test"]["total_auc"] <= 1.0


def test_lookup_ids_flat_storage_matches_gather(synthetic_data):
    """Capacity math must use the ids the ACTIVE storage mode gathers
    (ADVICE r2): under flat storage the lookup dedups fids // rpf against
    the [n_rows/rpf, 128] table, so the flat-row requirement is <= the
    logical estimate and lives in a different row space."""
    import dataclasses

    from aread_tpu.parallel.embed_shard import lookup_ids

    spec_flat = synthetic_data.spec.with_flat_table(8)
    spec_log = dataclasses.replace(spec_flat, flat_table=False)
    x = synthetic_data.train_x[:256]
    ids_f, n_f = lookup_ids(spec_flat, 8, x)
    ids_l, n_l = lookup_ids(spec_log, 8, x)
    rpf = 128 // 8
    assert n_f == n_l // rpf
    np.testing.assert_array_equal(ids_f, ids_l // rpf)
    need_f = a2a_required_capacity(ids_f, n_f, 2, n_data=4)
    need_l = a2a_required_capacity(ids_l, n_l, 2, n_data=4)
    assert need_f <= need_l


def test_resolve_a2a_capacity_modes(synthetic_data):
    """0 = auto (measured x headroom, multiple of 8), >0 = validated
    manual bound, -1 = always-exact passthrough, no-op without a2a."""
    from aread_tpu.parallel.embed_shard import (lookup_ids,
                                                resolve_a2a_capacity)

    data = synthetic_data
    mesh = make_mesh(data=4, model=2)
    spec = data.spec.pad_vocab(2)
    pools = [(data.train_x, 256)]

    cfg = Config(bs=256, embed_dim=8, embed_lookup="a2a", a2a_capacity=0)
    auto = resolve_a2a_capacity(cfg, mesh, spec, 8, pools)
    ids, n_rows = lookup_ids(spec, 8, data.train_x[:256])
    need = a2a_required_capacity(ids, n_rows, 2, n_data=4)
    assert auto > 0 and auto % 8 == 0 and auto >= need

    cfg.a2a_capacity = auto
    assert resolve_a2a_capacity(cfg, mesh, spec, 8, pools) == auto
    cfg.a2a_capacity = -1
    assert resolve_a2a_capacity(cfg, mesh, spec, 8, pools) == -1
    cfg.a2a_capacity = 1
    with pytest.raises(ValueError, match="a2a_capacity"):
        resolve_a2a_capacity(cfg, mesh, spec, 8, pools)
    cfg = Config(embed_lookup="gspmd", a2a_capacity=7)
    assert resolve_a2a_capacity(cfg, mesh, spec, 8, pools) == 7


def test_trainer_fit_a2a_auto_capacity(synthetic_data):
    """Trainer.fit with embed_lookup='a2a' and the default a2a_capacity=0
    auto-calibrates the bound (VERDICT r2 item 8: no manual capacity knob)
    and trains clean."""
    import dataclasses

    data = synthetic_data
    data = dataclasses.replace(data, spec=data.spec.pad_vocab(2))
    mesh = make_mesh(data=4, model=2)
    cfg = Config(bs=256, embed_dim=8, embed_lookup="a2a")
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
    trainer = Trainer(model, cfg, data.n_domain, mesh=mesh)
    res = trainer.fit(data, epochs=1, verbose=False)
    assert cfg.a2a_capacity > 0 and cfg.a2a_capacity % 8 == 0
    assert np.isfinite(res["test"]["total_loss"])


def test_raise_if_nonfinite_guard():
    """A NaN epoch loss raises loudly (ADVICE r2: without it, NaN metrics
    quietly early-stop a poisoned run) and names the a2a bound when one
    is active."""
    from aread_tpu.train.trainer import raise_if_nonfinite

    cfg = Config(embed_lookup="a2a", a2a_capacity=64)
    raise_if_nonfinite(0.5, 0, cfg)  # finite: no-op
    with pytest.raises(FloatingPointError, match="a2a_capacity"):
        raise_if_nonfinite(float("nan"), 0, cfg)
    with pytest.raises(FloatingPointError, match="lr too high"):
        raise_if_nonfinite(float("inf"), 1, Config())
