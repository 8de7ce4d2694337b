"""HEMP mask machinery tests (generate/validate/prune semantics of
reference aread.py:432-605)."""

import numpy as np
import pytest

from aread_tpu.utils.masks import (HempMaskState, count_active_edge,
                                   create_single_full_mask, edge_num,
                                   gate_threshold, has_output, mask_shapes,
                                   validate_mask)

N_TOWER = (3, 6, 12)


def test_edge_num_matches_reference_formula():
    # aread.py:54: n0 + sum(n_{l-1}*n_l) + n_last
    assert edge_num(N_TOWER) == 3 + 3 * 6 + 6 * 12 + 12


def test_validate_mask_adds_io_edges():
    rng = np.random.default_rng(0)
    mask = create_single_full_mask(N_TOWER, 0, rng)
    mask[1][0, 2] = True  # tower 0 (level0) -> tower 2 (level1)
    mask[2][2, 5] = True  # level1 tower 2 -> level2 tower 5
    valid = validate_mask(mask)
    assert valid[0][0, 0]          # input edge added for live level-0 tower
    assert valid[-1][5, 0]         # output edge added for live leaf
    assert has_output(valid)


def test_validate_mask_removes_dangling():
    rng = np.random.default_rng(0)
    mask = create_single_full_mask(N_TOWER, 0, rng)
    mask[1][0, 1] = True  # level-1 tower 1 has input but no output
    valid = validate_mask(mask)
    assert not valid[1][:, 1].any()  # severed
    assert not has_output(valid)


def test_generate_rand_always_has_output():
    st = HempMaskState(N_TOWER, n_domain=4, seed=0)
    for _ in range(5):
        m = st.generate_mask("rand", d=0, init_active_percent=0.5)
        assert has_output(m)
        shapes = [mm.shape for mm in m]
        assert shapes == mask_shapes(N_TOWER)


def test_mask_max_gate_uses_gate_values():
    st = HempMaskState(N_TOWER, n_domain=2, seed=0)
    # synthetic gate records: level1 gates [3,6], level2 gates [6,12]
    rng = np.random.default_rng(1)
    for _ in range(3):
        st.record_gates(0, [rng.random((3, 6)).astype(np.float32) * 0.2,
                            rng.random((6, 12)).astype(np.float32) * 0.2])
    m = st.generate_mask("mask_max_gate", d=0, init_active_percent=0.7,
                         random_modify_sigma=0.1)
    assert has_output(m)


def test_mask_max_gate_empty_accumulator_falls_back_to_rand():
    """A domain with no warm-up gate records must still get a valid mask
    (reference falls back to the 'rand' path, aread.py:504-507)."""
    st = HempMaskState(N_TOWER, n_domain=1, seed=0)
    m = st.generate_mask("mask_max_gate", d=0, init_active_percent=0.7,
                         random_modify_sigma=0.2)
    assert has_output(m)


def test_prune_reverts_if_output_dies():
    st = HempMaskState(N_TOWER, n_domain=1, seed=0)
    full = create_single_full_mask(N_TOWER, 1, np.random.default_rng(0))
    # all gate values equal -> quantile threshold kills nothing at ratio 0
    st.record_tmp_gates([np.full((3, 6), 0.5, np.float32),
                         np.full((6, 12), 0.5, np.float32)], full)
    pruned = st.prun_single_mask(0, full, prun_ratio=0.05)
    assert has_output(pruned)


def test_update_all_mask_selects_lowest_loss():
    st = HempMaskState(N_TOWER, n_domain=1, seed=0)
    rng = np.random.default_rng(0)
    m_good = create_single_full_mask(N_TOWER, 1, rng)
    m_bad = create_single_full_mask(N_TOWER, 1, rng)
    m_bad[0][0, 0] = False  # distinguishable
    st.candidate_domain_mask[0] = [m_bad, m_good]
    st.add_eval_loss(0.9, 0, 0)
    st.add_eval_loss(0.1, 0, 1)
    st.update_all_mask()
    assert st.domain_mask[0][0][0, 0]  # picked m_good (index 1)


def test_gate_threshold_quantile():
    mv = [np.zeros((1, 3)), np.array([[0.1, 0.2, 0.3]] * 3, np.float32).reshape(3, 3),
          np.zeros((3, 1))]
    thr = gate_threshold(mv, active_percent=1.0 / 3)
    # quantile(1 - 1/3) over [0.1 .. 0.3]*3
    assert 0.1 < thr <= 0.3


def test_cluster_domain_masks_assigns_clusters():
    """Cluster-based mask init (reference create_domain_mask,
    aread.py:607-638): 8 domains, n_tower=(2,4) — merges (0,1),(2,3),
    (4,5),(6,7) give the 4-cluster level, then (8,9),(10,11) the 2-cluster
    level."""
    from aread_tpu.utils.masks import cluster_domain_masks, has_output

    n_tower = (2, 4)
    z = np.array([[0, 1, 0.1, 2], [2, 3, 0.1, 2], [4, 5, 0.1, 2],
                  [6, 7, 0.1, 2], [8, 9, 0.2, 4], [10, 11, 0.2, 4]],
                 dtype=float)
    masks, t2c = cluster_domain_masks(z, n_tower, n_domain=8)
    assert len(masks) == 8
    # level-1 towers own consecutive pairs, level-0 towers own quadruples
    assert sorted(map(sorted, t2c[1])) == [[0, 1], [2, 3], [4, 5], [6, 7]]
    assert sorted(map(sorted, t2c[0])) == [[0, 1, 2, 3], [4, 5, 6, 7]]
    for d in range(8):
        m = masks[d]
        assert has_output(m)
        # domain d's level-1 tower (its pair cluster) must have live output
        leaf = next(t for t, c in enumerate(t2c[1]) if d in c)
        assert m[2][leaf, 0]
        # and its level-0 tower must feed it (the reference opens ALL
        # outgoing edges of an owned tower, aread.py:633-634)
        root = next(t for t, c in enumerate(t2c[0]) if d in c)
        assert m[0][0, root]
        assert m[1][root, leaf]
        assert m[1][root].all()
        # foreign level-0 towers stay dark: no outgoing, hence no input edge
        for t, c in enumerate(t2c[0]):
            if d not in c:
                assert not m[1][t].any() and not m[0][0, t]


def test_cluster_domain_masks_via_state():
    from aread_tpu.utils.masks import HempMaskState

    z = np.array([[0, 1, 0.1, 2], [2, 3, 0.1, 2], [4, 5, 0.1, 2],
                  [6, 7, 0.1, 2], [8, 9, 0.2, 4], [10, 11, 0.2, 4]],
                 dtype=float)
    st = HempMaskState((2, 4), n_domain=8, seed=0)
    t2c = st.init_cluster_masks(z)
    assert all(st.domain_mask[d] is not None for d in range(8))
    assert len(t2c) == 2


def test_cluster_domain_masks_short_linkage_raises():
    from aread_tpu.utils.masks import cluster_domain_masks

    with np.testing.assert_raises(ValueError):
        cluster_domain_masks(np.zeros((1, 4)), (2, 4), n_domain=8)


def test_validate_mask_jax_matches_host():
    import jax.numpy as jnp
    from aread_tpu.utils.masks import validate_mask, validate_mask_jax

    rng = np.random.default_rng(5)
    for _ in range(20):
        mask = [rng.random(s) < 0.4 for s in mask_shapes((3, 6, 12))]
        host = validate_mask(mask)
        dev = validate_mask_jax(tuple(jnp.asarray(m) for m in mask))
        for h, d in zip(host, dev):
            np.testing.assert_array_equal(h, np.asarray(d))


def test_prune_mask_jax_matches_host():
    import jax.numpy as jnp
    from aread_tpu.utils.masks import HempMaskState, prune_mask_jax

    rng = np.random.default_rng(6)
    n_tower = (3, 6, 12)
    shapes = mask_shapes(n_tower)
    for trial in range(20):
        mask = [np.ones(s, bool) for s in shapes]
        for m in mask[1:-1]:
            m &= rng.random(m.shape) < 0.8
        # gates masked like the forward: positive on active edges
        gates = [np.where(mask[li + 1],
                          rng.random(mask[li + 1].shape).astype(np.float32)
                          + 1e-3, 0.0).astype(np.float32)
                 for li in range(len(n_tower) - 1)]
        ms = HempMaskState(n_tower, 1, seed=trial)
        ms.record_tmp_gates(gates, mask)
        host = ms.prun_single_mask(0, mask, prun_ratio=0.05)
        dev = prune_mask_jax(tuple(jnp.asarray(m) for m in mask),
                             tuple(jnp.asarray(g) for g in gates),
                             prun_ratio=0.05)
        for h, d in zip(host, dev):
            np.testing.assert_array_equal(np.asarray(h), np.asarray(d))


def test_prune_mask_jax_reverts_when_output_dies():
    import jax.numpy as jnp
    from aread_tpu.utils.masks import prune_mask_jax

    n_tower = (2, 4)
    shapes = mask_shapes(n_tower)
    mask = [np.ones(s, bool) for s in shapes]
    # all gates equal -> threshold == value -> kept; zero gates -> revert
    gates = [np.zeros(mask[li + 1].shape, np.float32)
             for li in range(len(n_tower) - 1)]
    dev = prune_mask_jax(tuple(jnp.asarray(m) for m in mask),
                         tuple(jnp.asarray(g) for g in gates))
    for m, d in zip(mask, dev):
        np.testing.assert_array_equal(m, np.asarray(d))
