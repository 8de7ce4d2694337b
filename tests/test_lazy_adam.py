"""Lazy sparse-Adam (torch.optim.SparseAdam semantics): only touched rows
update; untouched rows and moments are bit-unchanged. Opt-in deviation from
the reference's dense Adam (see ops/sparse_adam.sparse_adam_dispatch)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from aread_tpu.ops.sparse_adam import dedup_rows, sparse_table_adam

N_ROWS, D = 512, 32


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def _torch_sparse_adam_steps(w0, ids_steps, grads_steps, lr, b1, b2, eps):
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.SparseAdam([p], lr=lr, betas=(b1, b2), eps=eps)
    for ids, g in zip(ids_steps, grads_steps):
        opt.zero_grad()
        i = torch.tensor(ids, dtype=torch.int64).unsqueeze(0)
        sp = torch.sparse_coo_tensor(i, torch.tensor(g), p.shape).coalesce()
        p.grad = sp
        opt.step()
    return p.detach().numpy()


def test_lazy_matches_torch_sparse_adam_multistep():
    rng = np.random.default_rng(0)
    w0 = _rand(rng, N_ROWS, D)
    ids_steps = [rng.integers(0, N_ROWS, size=64) for _ in range(4)]
    grads_steps = [_rand(rng, 64, D) for _ in range(4)]
    want = _torch_sparse_adam_steps(w0, ids_steps, grads_steps,
                                    lr=1e-2, b1=0.9, b2=0.99, eps=1e-8)

    w = jnp.asarray(w0)
    m = jnp.zeros_like(w)
    v = jnp.zeros_like(w)
    for t, (ids, g) in enumerate(zip(ids_steps, grads_steps), start=1):
        w, m, v = sparse_table_adam(
            w, m, v, jnp.asarray(ids, jnp.int32), jnp.asarray(g),
            jnp.asarray(t), lr=1e-2, b1=0.9, b2=0.99, eps=1e-8,
            weight_decay=0.0, l2=0.0, lazy=True)
    np.testing.assert_allclose(np.asarray(w), want, rtol=2e-5, atol=2e-6)


def test_lazy_untouched_rows_bit_unchanged():
    rng = np.random.default_rng(1)
    w0, m0, v0 = _rand(rng, N_ROWS, D), _rand(rng, N_ROWS, D), \
        np.abs(_rand(rng, N_ROWS, D))
    ids = np.array([3, 3, 77, 200], np.int32)
    g = _rand(rng, 4, D)
    w, m, v = sparse_table_adam(
        jnp.asarray(w0), jnp.asarray(m0), jnp.asarray(v0),
        jnp.asarray(ids), jnp.asarray(g), jnp.asarray(1),
        lr=1e-2, weight_decay=1e-8, l2=1e-5, lazy=True)
    touched = {3, 77, 200}
    untouched = sorted(set(range(N_ROWS)) - touched)
    np.testing.assert_array_equal(np.asarray(w)[untouched], w0[untouched])
    np.testing.assert_array_equal(np.asarray(m)[untouched], m0[untouched])
    np.testing.assert_array_equal(np.asarray(v)[untouched], v0[untouched])
    for r in touched:
        assert not np.array_equal(np.asarray(w)[r], w0[r])


def test_lazy_flat_storage_matches_plain():
    """Lane-packed flat view produces exactly the plain-layout result —
    including when touched rows share a 128-lane flat row with untouched
    neighbours (R = 128//D rows per flat row)."""
    rng = np.random.default_rng(2)
    w0, m0, v0 = _rand(rng, N_ROWS, D), _rand(rng, N_ROWS, D), \
        np.abs(_rand(rng, N_ROWS, D))
    # ids 8 and 9 share flat row 2 (R=4); 8/10/11 untouched neighbours vary
    ids = np.array([9, 8, 100, 101, 103, 7], np.int32)
    g = _rand(rng, 6, D)

    plain = sparse_table_adam(
        jnp.asarray(w0), jnp.asarray(m0), jnp.asarray(v0),
        jnp.asarray(ids), jnp.asarray(g), jnp.asarray(3),
        lr=1e-3, weight_decay=1e-8, l2=1e-5, lazy=True)

    flat = sparse_table_adam(
        jnp.asarray(w0.reshape(-1, 128)), jnp.asarray(m0.reshape(-1, 128)),
        jnp.asarray(v0.reshape(-1, 128)),
        jnp.asarray(ids), jnp.asarray(g), jnp.asarray(3),
        lr=1e-3, weight_decay=1e-8, l2=1e-5, lazy=True,
        table_shape=(N_ROWS, D))

    for a, b in zip(plain, flat):
        np.testing.assert_array_equal(np.asarray(a),
                                      np.asarray(b).reshape(N_ROWS, D))


def test_lazy_dedups_duplicate_ids_like_coalesce():
    """Duplicate ids sum their gradients before the update (torch sparse
    coalesce behavior), rather than applying two sequential updates."""
    rng = np.random.default_rng(3)
    w0 = _rand(rng, N_ROWS, D)
    g = _rand(rng, 2, D)
    ids2 = np.array([5, 5], np.int32)
    out2 = sparse_table_adam(
        jnp.asarray(w0), jnp.zeros((N_ROWS, D)), jnp.zeros((N_ROWS, D)),
        jnp.asarray(ids2), jnp.asarray(g), jnp.asarray(1),
        lr=1e-2, weight_decay=0.0, l2=0.0, lazy=True)
    out1 = sparse_table_adam(
        jnp.asarray(w0), jnp.zeros((N_ROWS, D)), jnp.zeros((N_ROWS, D)),
        jnp.asarray(np.array([5], np.int32)),
        jnp.asarray((g[0] + g[1])[None]), jnp.asarray(1),
        lr=1e-2, weight_decay=0.0, l2=0.0, lazy=True)
    np.testing.assert_allclose(np.asarray(out2[0])[5], np.asarray(out1[0])[5],
                               rtol=1e-6)


def test_lazy_sharded_matches_single_device():
    """Lazy mode under the row-sharded shard_map path (model axis > 1)."""
    from aread_tpu.parallel.mesh import make_mesh
    from aread_tpu.parallel.sharded_adam import sharded_sparse_table_adam

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs multiple devices")
    rng = np.random.default_rng(4)
    w0, m0, v0 = _rand(rng, N_ROWS, D), _rand(rng, N_ROWS, D), \
        np.abs(_rand(rng, N_ROWS, D))
    ids = rng.integers(0, N_ROWS, size=32).astype(np.int32)
    g = _rand(rng, 32, D)
    kw = dict(lr=1e-2, weight_decay=1e-8, l2=1e-5, lazy=True)

    want = sparse_table_adam(
        jnp.asarray(w0), jnp.asarray(m0), jnp.asarray(v0),
        jnp.asarray(ids), jnp.asarray(g), jnp.asarray(2), **kw)

    mesh = make_mesh(data=1, model=2)
    got = sharded_sparse_table_adam(
        jnp.asarray(w0.reshape(-1, 128)), jnp.asarray(m0.reshape(-1, 128)),
        jnp.asarray(v0.reshape(-1, 128)),
        jnp.asarray(ids), jnp.asarray(g), jnp.asarray(2), mesh=mesh,
        table_shape=(N_ROWS, D), **kw)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(b).reshape(N_ROWS, D),
                                   rtol=1e-6, atol=1e-7)
