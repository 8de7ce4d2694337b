"""Sharded sparse-gradient table Adam (parallel/sharded_adam.py): per-shard
update under shard_map must equal the unsharded update.

Tolerance note: XLA may contract a*b+c into an FMA differently for the
sharded vs unsharded programs (xla_allow_excess_precision), so equality is
asserted to 1 ULP (rtol=1e-6), not bitwise."""

import jax
import jax.numpy as jnp
import numpy as np

from aread_tpu.ops.sparse_adam import sparse_table_adam
from aread_tpu.parallel.mesh import make_mesh, table_sharding
from aread_tpu.parallel.sharded_adam import sharded_sparse_table_adam


def _setup(n_rows, D, K, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(n_rows, D)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(n_rows, D)) * 0.1, jnp.float32)
    v = jnp.asarray(np.abs(rng.normal(size=(n_rows, D))) * 0.01, jnp.float32)
    ids = jnp.asarray(rng.integers(0, n_rows, K), jnp.int32)
    g = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    return w, m, v, ids, g


def test_sharded_equals_unsharded_packed():
    n_rows, D, K = 512, 8, 160
    w, m, v, ids, g = _setup(n_rows, D, K)
    t = jnp.asarray(4, jnp.int32)
    kw = dict(lr=1e-3, weight_decay=1e-8, l2=1e-5)

    want = sparse_table_adam(w, m, v, ids, g, t, **kw)

    mesh = make_mesh(data=2, model=4)
    sh = table_sharding(mesh)
    ws, ms, vs = (jax.device_put(a, sh) for a in (w, m, v))
    got = jax.jit(lambda *a: sharded_sparse_table_adam(
        *a, mesh=mesh, table_shape=(n_rows, D), **kw))(ws, ms, vs, ids, g, t)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_sharded_equals_unsharded_flat():
    n_rows, D, K = 1024, 16, 96  # rpf=8, NF=128, 8-way shard -> 16 flat rows
    w, m, v, ids, g = _setup(n_rows, D, K, seed=3)
    t = jnp.asarray(1, jnp.int32)
    kw = dict(lr=1e-2, weight_decay=1e-8, l2=0.0)

    want = sparse_table_adam(w.reshape(-1, 128), m.reshape(-1, 128),
                             v.reshape(-1, 128), ids, g, t,
                             table_shape=(n_rows, D), **kw)

    mesh = make_mesh(data=1, model=8)
    sh = table_sharding(mesh)
    flat = lambda a: jax.device_put(a.reshape(-1, 128), sh)
    got = jax.jit(lambda *a: sharded_sparse_table_adam(
        *a, mesh=mesh, table_shape=(n_rows, D), **kw))(
            flat(w), flat(m), flat(v), ids, g, t)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_edge_ids_cross_shard_boundaries():
    """Ids exactly at shard boundaries land on the right shard."""
    n_rows, D = 256, 8
    mesh = make_mesh(data=1, model=4)  # 64 table rows per shard
    boundary_ids = jnp.asarray([0, 63, 64, 127, 128, 191, 192, 255], jnp.int32)
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.normal(size=(8, D)), jnp.float32)
    w = jnp.zeros((n_rows, D)); m = jnp.zeros((n_rows, D)); v = jnp.zeros((n_rows, D))
    t = jnp.asarray(1, jnp.int32)
    kw = dict(lr=1e-3, weight_decay=0.0, l2=0.0)

    want = sparse_table_adam(w, m, v, boundary_ids, g, t, **kw)
    sh = table_sharding(mesh)
    got = jax.jit(lambda *a: sharded_sparse_table_adam(
        *a, mesh=mesh, table_shape=(n_rows, D), **kw))(
            jax.device_put(w, sh), jax.device_put(m, sh),
            jax.device_put(v, sh), boundary_ids, g, t)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
    # rows with zero grad and zero decay stay exactly zero; touched rows move
    moved = np.abs(np.asarray(got[0])).sum(axis=1) > 0
    assert set(np.nonzero(moved)[0]) == set(np.asarray(boundary_ids))
