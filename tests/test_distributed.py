"""Host-coordinated domain-grouped input pipeline (parallel/distributed.py):
single-domain batches are a GLOBAL property (SURVEY §7 hard part 7) — all
hosts must agree on the schedule without communicating."""

import numpy as np

from aread_tpu.parallel.distributed import HostShardedDomainBatcher


def make_xy(n=640, n_domain=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 50, size=(n, 6)).astype(np.int32)
    x[:, 2] = rng.integers(0, n_domain, size=n)  # domain col
    y = rng.integers(0, 2, size=n).astype(np.float32)
    return x, y


def hosts(pc, **kw):
    x, y = make_xy()
    return [HostShardedDomainBatcher(x, y, global_bs=64, domain_idx=2,
                                     n_domain=4, process_index=pi,
                                     process_count=pc, seed=7, **kw)
            for pi in range(pc)]


def test_same_domain_sequence_on_every_host():
    bs = hosts(4)
    seqs = [b.domain_batch_seq for b in bs]
    assert all(s == seqs[0] for s in seqs)
    for b in bs:
        b.shuffle_seq()
    seqs2 = [b.domain_batch_seq for b in bs]
    assert all(s == seqs2[0] for s in seqs2)
    assert seqs2[0] != seqs[0]  # epoch reshuffle actually changed it
    # ceil(n_d / global_bs) entries per domain (run.py:337)
    x, _ = make_xy()
    for d in range(4):
        nd = int((x[:, 2] == d).sum())
        assert seqs[0].count(d) == -(-nd // 64)


def test_host_slices_compose_to_global_batch():
    """Concatenating the pc=4 hosts' slices in process order equals the
    pc=1 (single-host) global batch, step after step and across wraps."""
    ref = hosts(1)[0]
    parts = hosts(4)
    for step, d in enumerate(ref.domain_batch_seq * 2):  # *2 forces wraps
        want = ref.next_batch(d)
        got = [b.next_batch(d) for b in parts]
        for key in ("x", "y", "valid", "domain"):
            np.testing.assert_array_equal(
                np.concatenate([g[key] for g in got]), want[key],
                err_msg=f"step {step} domain {d} key {key}")


def test_valid_padding_on_ragged_tail():
    b = hosts(2)[1]  # second host sees the tail padding first
    x, _ = make_xy()
    d = int(np.argmin([(x[:, 2] == dd).sum() for dd in range(4)]))
    nd = int((x[:, 2] == d).sum())
    total_valid = 0
    n_batches = -(-nd // 64)
    bs0, bs1 = hosts(2)
    for _ in range(n_batches):
        v0 = bs0.next_batch(d)["valid"].sum()
        v1 = bs1.next_batch(d)["valid"].sum()
        total_valid += v0 + v1
    assert total_valid == nd  # every row exactly once per wrap


def test_device_batch_assembles_global_arrays():
    import jax
    from aread_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, model=1)
    b = HostShardedDomainBatcher(*make_xy(), global_bs=64, domain_idx=2,
                                 n_domain=4, process_index=0,
                                 process_count=1, seed=7)
    out = b.device_batch(0, mesh)
    assert out["x"].shape == (64, 6)
    assert out["domain"].shape == (64,)
