"""Sparse-table-gradient path: must be bit-identical to the dense path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aread_tpu.ops.pallas.fused_adam import reference_adam_update
from aread_tpu.ops.sparse_adam import dedup_rows, sparse_table_adam


def test_dedup_rows_sums_duplicates():
    ids = jnp.asarray([5, 2, 5, 7, 2, 5], jnp.int32)
    g = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    uids, gsum = dedup_rows(ids, g, n_rows=10)
    got = {int(u): gsum[i].tolist() for i, u in enumerate(np.asarray(uids))
           if int(u) < 10}
    assert got[2] == [(2 + 8), (3 + 9)]
    assert got[5] == [(0 + 4 + 10), (1 + 5 + 11)]
    assert got[7] == [6.0, 7.0]
    # padding entries carry the sentinel
    assert sorted(int(u) for u in np.asarray(uids))[-3:] == [10, 10, 10]


def test_sparse_adam_equals_dense():
    rng = np.random.default_rng(0)
    n_rows, D, K = 200, 8, 64
    w = jnp.asarray(rng.normal(size=(n_rows, D)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(n_rows, D)) * 0.1, jnp.float32)
    v = jnp.asarray(np.abs(rng.normal(size=(n_rows, D))) * 0.01, jnp.float32)
    ids = jnp.asarray(rng.integers(0, n_rows, K), jnp.int32)
    gv = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    dense_g = jnp.zeros((n_rows, D), jnp.float32).at[ids].add(gv)
    t = jnp.asarray(3, jnp.int32)
    kw = dict(lr=1e-3, b1=0.9, b2=0.99, eps=1e-8, weight_decay=1e-8, l2=1e-5)

    dw, dm, dv = reference_adam_update(w, m, v, dense_g, t, **kw)
    sw, sm, sv = jax.jit(lambda *a: sparse_table_adam(*a, **kw))(w, m, v, ids, gv, t)
    np.testing.assert_allclose(np.asarray(sw), np.asarray(dw), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(dm), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(dv), rtol=0, atol=1e-6)


def test_trainer_sparse_step_matches_dense():
    """One full train step with sparse_table_grad on vs off from identical
    init: params must match to float32 tolerance."""
    from aread_tpu.config import Config
    from aread_tpu.data.loader import make_synthetic_data, GlobalBatcher
    from aread_tpu.models.deepfm import DeepFM
    from aread_tpu.train.trainer import Trainer

    data = make_synthetic_data(n_rows=512, n_domain=3, vocab=60, seed=7)

    def one_step(sparse):
        model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16, 8))
        cfg = Config(model="deepfm", bs=128, embed_dim=8, epoch=1,
                     dropout=0.0, sparse_table_grad=sparse)
        tr = Trainer(model, cfg, data.n_domain)
        batcher = GlobalBatcher(data.train_x, data.train_y, cfg.bs,
                                data.spec.domain_idx, tr.domain2group,
                                seed=cfg.seed)
        batch = next(iter(batcher))
        params, state, opt_state = tr.init(jax.random.PRNGKey(0), batch)
        step = tr._build_train_step()
        jb = tr._place(batch)
        params, state, opt_state, loss = step(params, state, opt_state, jb,
                                              jax.random.PRNGKey(1))
        return params, float(loss)

    p_dense, l_dense = one_step(False)
    p_sparse, l_sparse = one_step(True)
    assert abs(l_dense - l_sparse) < 1e-6
    flat_s = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(p_sparse)[0]}
    for k, vd in jax.tree_util.tree_flatten_with_path(p_dense)[0]:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(flat_s[ks]), np.asarray(vd),
                                   rtol=0, atol=2e-6, err_msg=ks)


def test_pallas_sparse_kernel_matches_dense():
    """The Pallas sparse-Adam kernel (interpret mode on CPU) must equal the
    dense reference update bit-for-bit, including sentinel padding rows and
    a table size that is not a multiple of the kernel block."""
    from aread_tpu.ops.pallas.sparse_adam_kernel import (
        BLOCK_F, supports, sparse_adam_kernel_update)

    rng = np.random.default_rng(1)
    # rows_per_flat = 16 at D=8; choose a flat count straddling blocks with
    # a ragged (non-multiple-of-BLOCK_F) tail
    n_rows, D, K = (BLOCK_F + 513) * 16, 8, 256
    assert supports(n_rows, D)
    w = jnp.asarray(rng.normal(size=(n_rows, D)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(n_rows, D)) * 0.1, jnp.float32)
    v = jnp.asarray(np.abs(rng.normal(size=(n_rows, D))) * 0.01, jnp.float32)
    ids = jnp.asarray(rng.integers(0, n_rows, K), jnp.int32)
    # include ids in the ragged last block
    ids = ids.at[:8].set(jnp.arange(n_rows - 8, n_rows, dtype=jnp.int32))
    gv = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    t = jnp.asarray(5, jnp.int32)
    kw = dict(lr=1e-3, b1=0.9, b2=0.99, eps=1e-8, weight_decay=1e-8, l2=1e-5)

    dense_g = jnp.zeros((n_rows, D), jnp.float32).at[ids].add(gv)
    dw, dm, dv = reference_adam_update(w, m, v, dense_g, t, **kw)

    uids, gsum = dedup_rows(ids, gv, n_rows)
    sw, sm, sv = sparse_adam_kernel_update(w, m, v, uids, gsum, t,
                                           interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(sw), np.asarray(dw), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(dm), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(dv), rtol=0, atol=1e-6)

    # flat [n_rows*D/128, 128] storage must give the identical result
    flat = lambda a: a.reshape(-1, 128)
    fw, fm, fv = sparse_adam_kernel_update(flat(w), flat(m), flat(v), uids,
                                           gsum, t, table_shape=(n_rows, D),
                                           interpret=True, **kw)
    assert fw.shape == (n_rows * D // 128, 128)
    np.testing.assert_array_equal(np.asarray(fw), np.asarray(flat(sw)))
    np.testing.assert_array_equal(np.asarray(fm), np.asarray(flat(sm)))
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(flat(sv)))


def test_sparse_table_adam_flat_layout():
    """Dispatcher with flat-layout w/m/v + table_shape equals the packed
    call (CPU falls back to the XLA path; reshapes are free there)."""
    rng = np.random.default_rng(4)
    n_rows, D, K = 512, 8, 96  # 512*8 % 128 == 0
    w = jnp.asarray(rng.normal(size=(n_rows, D)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(n_rows, D)) * 0.1, jnp.float32)
    v = jnp.asarray(np.abs(rng.normal(size=(n_rows, D))) * 0.01, jnp.float32)
    ids = jnp.asarray(rng.integers(0, n_rows, K), jnp.int32)
    gv = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    t = jnp.asarray(2, jnp.int32)
    kw = dict(lr=1e-3, weight_decay=1e-8, l2=1e-5)

    pw, pm, pv = sparse_table_adam(w, m, v, ids, gv, t, **kw)
    flat = lambda a: a.reshape(-1, 128)
    fw, fm, fv = sparse_table_adam(flat(w), flat(m), flat(v), ids, gv, t,
                                   table_shape=(n_rows, D), **kw)
    assert fw.shape == flat(w).shape
    np.testing.assert_array_equal(np.asarray(fw), np.asarray(flat(pw)))
    np.testing.assert_array_equal(np.asarray(fm), np.asarray(flat(pm)))
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(flat(pv)))


def test_flat_storage_embedding_matches_packed():
    """FeaturesEmbedding with flat_storage gathers the same vectors as the
    packed layout when fed the reshaped table (row r of the packed table
    lives at flat[r//rpf, (r%rpf)*E:]), including clip + multi-hot pooling
    and the sparse-grad perturb tap."""
    from aread_tpu.ops.embedding import FeaturesEmbedding

    rng = np.random.default_rng(5)
    dims, E = (64, 7, 9, 48), 8  # total 128 rows -> n_flat = 8
    kwargs = dict(one_hot_dims=dims, embed_dim=E,
                  multi_hot_flag=(False,) * 4 + (True,) * 10,
                  itemid_idx=0, seq_maxlen=5, method="mean")
    packed = FeaturesEmbedding(**kwargs)
    flatm = FeaturesEmbedding(flat_storage=True, **kwargs)

    table = jnp.asarray(rng.normal(size=(128, E)), jnp.float32)
    B = 16
    x = np.concatenate(
        [rng.integers(0, d, size=(B, 1)) for d in dims]
        + [rng.integers(0, dims[0], size=(B, 10))], axis=1).astype(np.int32)
    x = jnp.asarray(x)

    out_p = packed.apply({"params": {"table": table}}, x)
    out_f = flatm.apply({"params": {"table": table.reshape(-1, 128)}}, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=0, atol=1e-6)

    # grads w.r.t. the perturb tap (the sparse data gradient) match too
    def tap_grad(mod, tab):
        def f(pert):
            return jnp.sum(mod.apply({"params": {"table": tab},
                                      "perturbations": pert}, x) ** 2)
        pert0 = {"rows": jnp.zeros(x.shape + (E,), jnp.float32)}
        return jax.grad(f)(pert0)["rows"]

    gp = tap_grad(packed, table)
    gf = tap_grad(flatm, table.reshape(-1, 128))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gp),
                               rtol=0, atol=1e-6)


def test_trainer_sparse_flat_step_matches_dense():
    """Full train step with sparse_table_grad + flat_table storage vs the
    dense packed step from identical init: same loss, same table values."""
    from aread_tpu.config import Config
    from aread_tpu.data.loader import make_synthetic_data, GlobalBatcher
    from aread_tpu.models.deepfm import DeepFM
    from aread_tpu.train.trainer import Trainer

    data = make_synthetic_data(n_rows=512, n_domain=3, vocab=60, seed=7)
    E = 8

    def one_step(spec, sparse):
        model = DeepFM(spec=spec, embed_dim=E, mlp_dims=(16, 8))
        cfg = Config(model="deepfm", bs=128, embed_dim=E, epoch=1,
                     dropout=0.0, sparse_table_grad=sparse)
        tr = Trainer(model, cfg, data.n_domain)
        batcher = GlobalBatcher(data.train_x, data.train_y, cfg.bs,
                                data.spec.domain_idx, tr.domain2group,
                                seed=cfg.seed)
        batch = next(iter(batcher))
        params, state, opt_state = tr.init(jax.random.PRNGKey(0), batch)
        step = tr._build_train_step()
        jb = tr._place(batch)
        params, state, opt_state, loss = step(params, state, opt_state, jb,
                                              jax.random.PRNGKey(1))
        return params, float(loss)

    flat_spec = data.spec.with_flat_table(E)
    assert flat_spec.flat_table
    p_flat, l_flat = one_step(flat_spec, True)
    # same padded vocab, packed storage, dense grads — the ground truth
    p_dense, l_dense = one_step(dataclasses.replace(flat_spec,
                                                    flat_table=False), False)
    assert abs(l_flat - l_dense) < 1e-6
    tf = np.asarray(p_flat["embedding"]["table"])
    td = np.asarray(p_dense["embedding"]["table"])
    assert tf.shape[1] == 128
    np.testing.assert_allclose(tf.reshape(td.shape), td, rtol=0, atol=2e-6)


def test_bfloat16_compute_dtype_step_runs():
    """compute_dtype='bfloat16' (bf16 MXU matmul precision, fp32 storage)
    trains without error and stays numerically close to fp32 on one step
    (identical on CPU, where matmul precision is a no-op)."""
    from aread_tpu.config import Config
    from aread_tpu.data.loader import make_synthetic_data, GlobalBatcher
    from aread_tpu.models.deepfm import DeepFM
    from aread_tpu.train.trainer import Trainer

    data = make_synthetic_data(n_rows=256, n_domain=3, vocab=50, seed=9)

    def one(dtype):
        model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
        cfg = Config(model="deepfm", bs=128, embed_dim=8, dropout=0.0,
                     compute_dtype=dtype)
        tr = Trainer(model, cfg, data.n_domain)
        batcher = GlobalBatcher(data.train_x, data.train_y, cfg.bs,
                                data.spec.domain_idx, tr.domain2group,
                                seed=cfg.seed)
        batch = next(iter(batcher))
        params, state, opt_state = tr.init(jax.random.PRNGKey(0), batch)
        step = tr._build_train_step()
        _, _, _, loss = step(params, state, opt_state, tr._place(batch),
                             jax.random.PRNGKey(1))
        return float(loss)

    l32 = one("float32")
    lbf = one("bfloat16")
    assert abs(l32 - lbf) / max(abs(l32), 1e-6) < 5e-2


def test_pallas_kernel_bf16x3_split_is_exact():
    """The kernel's 3-way bf16 gradient split must reassemble fp32 values
    bit-exactly across magnitudes (the one-hot selection never sums two
    distinct entries per lane, so dot(hi)+dot(mid)+dot(lo) == value)."""
    from aread_tpu.ops.pallas.sparse_adam_kernel import sparse_adam_kernel_update

    rng = np.random.default_rng(7)
    n_rows, D, K = 4096, 32, 64  # one block
    w = jnp.asarray(rng.normal(size=(n_rows, D)), jnp.float32)
    m = jnp.zeros((n_rows, D)); v = jnp.zeros((n_rows, D))
    ids = jnp.asarray(rng.choice(n_rows, K, replace=False), jnp.int32)
    # gradients spanning 30 orders of magnitude + denormal-adjacent values
    mags = np.float32(10.0) ** rng.integers(-20, 10, size=(K, D))
    gv = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32) * mags)
    t = jnp.asarray(1, jnp.int32)
    kw = dict(lr=1e-3, b1=0.9, b2=0.99, eps=1e-8, weight_decay=0.0, l2=0.0)

    from aread_tpu.ops.pallas.fused_adam import reference_adam_update
    dense_g = jnp.zeros((n_rows, D), jnp.float32).at[ids].add(gv)
    dw, dm, dv = reference_adam_update(w, m, v, dense_g, t, **kw)
    uids, gsum = dedup_rows(ids, gv, n_rows)
    sw, sm, sv = sparse_adam_kernel_update(w, m, v, uids, gsum, t,
                                           interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(sm), np.asarray(dm))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(dv))
    np.testing.assert_array_equal(np.asarray(sw), np.asarray(dw))


def test_bf16_moments_kernel_matches_xla_path():
    """config.table_moments_dtype='bfloat16': moments stored bf16, compute
    f32. The Pallas kernel and the XLA fallback must agree bit-for-bit
    (same expression, same rounding points), and must track the fp32-
    moments ground truth closely."""
    from aread_tpu.ops.pallas.sparse_adam_kernel import (
        BLOCK_F, sparse_adam_kernel_update)
    from aread_tpu.ops.sparse_adam import _xla_sparse_adam

    rng = np.random.default_rng(7)
    n_rows, D, K = (BLOCK_F + 17) * 16, 8, 128
    w = jnp.asarray(rng.normal(size=(n_rows, D)), jnp.float32)
    m32 = jnp.asarray(rng.normal(size=(n_rows, D)) * 0.1, jnp.float32)
    v32 = jnp.asarray(np.abs(rng.normal(size=(n_rows, D))) * 0.01, jnp.float32)
    m16, v16 = m32.astype(jnp.bfloat16), v32.astype(jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, n_rows, K), jnp.int32)
    gv = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    t = jnp.asarray(3, jnp.int32)
    kw = dict(lr=1e-3, b1=0.9, b2=0.99, eps=1e-8, weight_decay=1e-8, l2=1e-5)

    uids, gsum = dedup_rows(ids, gv, n_rows)
    kw_out = sparse_adam_kernel_update(w, m16, v16, uids, gsum, t,
                                       interpret=True, **kw)
    xla_out = _xla_sparse_adam(w, m16, v16, uids, gsum, t, **kw)
    assert kw_out[1].dtype == jnp.bfloat16 and kw_out[2].dtype == jnp.bfloat16
    for a, b in zip(kw_out, xla_out):
        assert a.dtype == b.dtype
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0, atol=2e-6)

    # same ballpark as the fp32-moments ground truth: inputs were pre-
    # rounded to bf16 (~0.4% relative), and Adam's normalized update can
    # amplify that toward its lr-bounded magnitude — this guards against
    # gross compute-dtype errors, not rounding
    ref = _xla_sparse_adam(w, m32, v32, uids, gsum, t, **kw)
    np.testing.assert_allclose(np.asarray(kw_out[0]), np.asarray(ref[0]),
                               rtol=0, atol=1e-3)


def test_bf16_moments_hybrid_init_and_step():
    """hybrid_init(moments_dtype='bfloat16') threads through a sparse
    hybrid step without dtype drift."""
    from aread_tpu.data.loader import make_synthetic_data
    from aread_tpu.train.trainer import (embedding_flat_ids, hybrid_init,
                                         hybrid_update_sparse,
                                         make_optimizer, perturbation_zeros,
                                         split_table)
    from aread_tpu.models.deepfm import DeepFM

    data = make_synthetic_data(n_rows=128, n_domain=2, vocab=48, seed=9)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
    x = jnp.asarray(data.train_x[:16])
    y = jnp.asarray(data.train_y[:16].astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, x)
    params = variables["params"]
    opt = make_optimizer(1e-3)
    opt_state = hybrid_init(opt, params, moments_dtype="bfloat16")
    assert opt_state["m"].dtype == jnp.bfloat16

    ids = embedding_flat_ids(data.spec, x)
    rows = jnp.ones(x.shape + (8,), jnp.float32) * 0.01
    table, rest = split_table(params)
    g_rest = jax.tree.map(jnp.zeros_like, rest)
    n_rows = int(np.sum(data.spec.one_hot_dims))
    new_params, new_opt_state = hybrid_update_sparse(
        opt, 1e-3, 1e-8, params, g_rest, ids, rows, opt_state,
        table_shape=(n_rows, 8))
    assert new_opt_state["m"].dtype == jnp.bfloat16
    assert new_opt_state["v"].dtype == jnp.bfloat16
    # touched rows moved
    t0, _ = split_table(params)
    t1, _ = split_table(new_params)
    assert not np.array_equal(np.asarray(t0), np.asarray(t1))


def test_steps_fit_kernel_is_per_step():
    """A chunk whose every STEP fits must pass even when the union of all
    steps' ids would overflow a block (the bug this fixed: chunk-pooled
    checks reported 'unfit' for every realistic scan chunk)."""
    from aread_tpu.ops.pallas.sparse_adam_kernel import (BLOCK_F, LANES,
                                                         PAD_W)
    from aread_tpu.ops.sparse_adam import rows_fit_kernel, steps_fit_kernel

    d = 8
    rpf = LANES // d
    n_rows = BLOCK_F * rpf * 2  # 2 blocks
    # each step touches PAD_W distinct flat rows of block 0 (exactly at
    # the limit); different rows per step so the union overflows
    S = 4
    ids = np.stack([
        (np.arange(PAD_W) * rpf + s * PAD_W * rpf) % (BLOCK_F * rpf)
        for s in range(S)])
    assert steps_fit_kernel(ids, n_rows, d)          # per-step: fits
    assert not rows_fit_kernel(ids, n_rows, d)       # union: overflows

    # one overflowing step fails the whole chunk
    bad = (np.arange(PAD_W + 1) * rpf)[None]
    assert not steps_fit_kernel(bad, n_rows, d)


def test_fit_checks_agree_with_pack_meta_overflow():
    """The host prechecks must never pass a batch the kernel's PAD_W
    window cannot hold: pack_meta counts unique TABLE rows per block (the
    deduped uids each take a window entry, several per 128-lane flat
    row), so contiguous small-vocab ids overflow far before the distinct
    flat-row count does (the bug this guards against)."""
    from aread_tpu.ops.pallas.sparse_adam_kernel import PAD_W, pack_meta
    from aread_tpu.ops.sparse_adam import (dedup_rows, rows_fit_kernel,
                                           steps_fit_kernel)

    d = 8  # rpf = 16
    rpf = 128 // d
    n_rows = 4096 * rpf * 2

    def device_overflow(ids):
        uids, gsum = dedup_rows(jnp.asarray(ids, jnp.int32),
                                jnp.zeros((len(ids), d)), n_rows)
        return bool(pack_meta(uids, gsum, n_rows, d)[3])

    # contiguous table rows: only PAD_W//rpf+ flat rows but > PAD_W
    # window entries -> device overflows, host must agree
    contiguous = np.arange(PAD_W + 8)
    assert device_overflow(contiguous)
    assert not rows_fit_kernel(contiguous, n_rows, d)
    assert not steps_fit_kernel(contiguous[None], n_rows, d)

    # spread rows (one per flat row): fits on both sides
    spread = np.arange(PAD_W - 8) * rpf
    assert not device_overflow(spread)
    assert rows_fit_kernel(spread, n_rows, d)
    assert steps_fit_kernel(spread[None], n_rows, d)


def test_kernel_want_l2_matches_sum_of_squares():
    """want_l2: the kernel's in-sweep accumulator must return the
    pre-update sum(w**2) (the trainer's loss-report term), with the
    ragged last block's padding rows masked out, and must not perturb
    the (w, m, v) outputs."""
    from aread_tpu.ops.pallas.sparse_adam_kernel import (
        BLOCK_F, sparse_adam_kernel_update, supports)

    rng = np.random.default_rng(4)
    n_rows, D, K = (BLOCK_F + 513) * 16, 8, 128
    assert supports(n_rows, D)
    w = jnp.asarray(rng.normal(size=(n_rows, D)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(n_rows, D)) * 0.1, jnp.float32)
    v = jnp.asarray(np.abs(rng.normal(size=(n_rows, D))) * 0.01, jnp.float32)
    ids = jnp.asarray(rng.integers(0, n_rows, K), jnp.int32)
    gv = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    t = jnp.asarray(2, jnp.int32)
    kw = dict(lr=1e-3, b1=0.9, b2=0.99, eps=1e-8, weight_decay=1e-8, l2=1e-5)

    uids, gsum = dedup_rows(ids, gv, n_rows)
    sw, sm, sv = sparse_adam_kernel_update(w, m, v, uids, gsum, t,
                                           interpret=True, **kw)
    lw, lm, lv, l2 = sparse_adam_kernel_update(w, m, v, uids, gsum, t,
                                               interpret=True, want_l2=True,
                                               **kw)
    np.testing.assert_array_equal(np.asarray(lw), np.asarray(sw))
    np.testing.assert_array_equal(np.asarray(lm), np.asarray(sm))
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(sv))
    want = float(jnp.sum(jnp.square(w)))
    assert float(l2) == pytest.approx(want, rel=1e-6)


def test_dispatch_want_l2_on_fallback_paths():
    """want_l2 through sparse_table_adam's non-kernel paths (CPU XLA path
    and lazy mode): 4th output equals sum(w_pre**2)."""
    rng = np.random.default_rng(5)
    n_rows, D, K = 96, 8, 32
    w = jnp.asarray(rng.normal(size=(n_rows, D)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(n_rows, D)) * 0.1, jnp.float32)
    v = jnp.asarray(np.abs(rng.normal(size=(n_rows, D))) * 0.01, jnp.float32)
    ids = jnp.asarray(rng.integers(0, n_rows, K), jnp.int32)
    gv = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    t = jnp.asarray(1, jnp.int32)
    kw = dict(lr=1e-3, weight_decay=1e-8, l2=1e-5)
    want = float(jnp.sum(jnp.square(w)))
    for lazy in (False, True):
        out = sparse_table_adam(w, m, v, ids, gv, t, lazy=lazy,
                                want_l2=True, **kw)
        assert len(out) == 4
        assert float(out[3]) == pytest.approx(want, rel=1e-6)
        ref = sparse_table_adam(w, m, v, ids, gv, t, lazy=lazy, **kw)
        for a, b in zip(out[:3], ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
