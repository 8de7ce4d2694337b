"""Multi-host runtime: jax.distributed init + the host-coordinated
domain-grouped input pipeline.

The reference is single-process (SURVEY §2.7); these are the TPU-native
pieces that make its *domain-grouped* training (every batch single-domain,
run.py:310-353) correct across hosts:

  * ``initialize()`` — thin jax.distributed.initialize wrapper, no-op when
    single-host (so the same entry point runs everywhere);
  * ``HostShardedDomainBatcher`` — single-domain batches are a GLOBAL
    property: every host must feed the SAME domain at the same step or the
    pjit-ed step's gather_group/mask math diverges. Every host derives the
    identical shuffled domain sequence and identical per-domain row
    permutations from the shared seed (counter-based numpy Philox keyed on
    (seed, epoch/domain, wrap) — zero cross-host communication), then
    materializes only ITS contiguous slice of every global batch. Feeding
    the slices to ``jax.make_array_from_process_local_data`` with a
    P('data') batch sharding reassembles exactly the single-host batch.

Storage model: the parsed tensors are host-replicated (every host can
index any row). At this workload's scale (Amazon-25: ~17.9M rows x 17
int32 cols ~= 1.2 GB, SURVEY §6) replicating the mmap'd cache
(data/loader._read_arrays) per host is the standard recsys input layout —
rows stream from page cache on demand; no shard-assignment protocol or
row exchange is needed, and per-batch work is O(local_bs).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize, skipped when single-host.

    Args fall back to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) / cloud auto-detection."""
    import jax

    num = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1 and coordinator_address is None \
            and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return  # single-host: nothing to initialize
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def _perm(n: int, *key_parts: int) -> np.ndarray:
    """Shared-seed permutation of [0, n): identical on every host for the
    same key parts (counter-based Philox — no state to synchronize; the
    parts fold into Philox's 128-bit key with a Fibonacci-hash chain,
    deterministic across processes and runs)."""
    acc, mix = 0, 0
    for p in key_parts:
        acc = (acc * 0x9E3779B97F4A7C15 + (int(p) & (2**64 - 1)) + 1) % 2**64
        mix = (mix ^ acc) * 0xBF58476D1CE4E5B9 % 2**64
    rng = np.random.Generator(np.random.Philox(key=[acc, mix]))
    return rng.permutation(n)


class HostShardedDomainBatcher:
    """Per-host slice of the globally-coordinated domain-grouped stream.

    Mirrors data.loader.DomainBatcher's semantics at GLOBAL batch
    granularity (shuffled ``domain_batch_seq`` with ceil(n_d / global_bs)
    entries per domain, run.py:337; cyclic per-domain cursors with
    reshuffle-on-wrap, run.py:551-575), with every random draw keyed on
    (seed, structural counters) so all hosts compute the same schedule
    independently. Each host returns global-batch positions
    [pi*local_bs, (pi+1)*local_bs) — concatenating all hosts' slices in
    process order IS the single-host DomainBatcher batch (asserted in
    tests/test_distributed.py)."""

    def __init__(self, x: np.ndarray, y: np.ndarray, global_bs: int,
                 domain_idx: int, n_domain: int,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 shuffle: bool = True, seed: int = 0):
        if process_index is None or process_count is None:
            import jax
            process_index = jax.process_index()
            process_count = jax.process_count()
        assert global_bs % process_count == 0, (global_bs, process_count)
        self.x, self.y = x, y
        self.global_bs = global_bs
        self.local_bs = global_bs // process_count
        self.pi, self.pc = process_index, process_count
        self.domain_idx, self.n_domain = domain_idx, n_domain
        self.shuffle = shuffle
        self.seed = seed
        domains = x[:, domain_idx]
        self.domain_indices: List[np.ndarray] = [
            np.nonzero(domains == d)[0] for d in range(n_domain)]
        self._epoch = 0
        self._wraps = [0] * n_domain
        self._cursors = [0] * n_domain
        self.domain_batch_seq = self._make_seq()

    # ---- schedule (identical on every host) ----
    def _make_seq(self) -> List[int]:
        seq: List[int] = []
        for d in range(self.n_domain):
            seq.extend([d] * int(np.ceil(len(self.domain_indices[d])
                                         / self.global_bs)))
        if not self.shuffle:
            return seq
        order = _perm(len(seq), self.seed, 0xD0, self._epoch)
        return [seq[i] for i in order]

    def shuffle_seq(self):
        """New epoch: reshuffle the domain sequence (run.py:609)."""
        self._epoch += 1
        self.domain_batch_seq = self._make_seq()

    # ---- batches ----
    def next_batch(self, d: int) -> Dict[str, np.ndarray]:
        """This host's slice of the next global batch of domain d: the
        global cursor advances by global_bs over the shared permutation of
        the domain's rows, wrapping with a reshuffle; rows beyond the
        domain's end pad with valid=0 (static shapes for XLA)."""
        idxs = self.domain_indices[d]
        n = len(idxs)
        if n == 0:
            raise ValueError(f"domain {d} has no rows")
        if self._cursors[d] >= n:
            self._wraps[d] += 1
            self._cursors[d] = 0
        lo = self._cursors[d]
        self._cursors[d] = lo + self.global_bs
        if self.shuffle:
            order = _perm(n, self.seed, 1 + d, self._wraps[d])
        else:
            order = np.arange(n)
        # this host's positions within the global batch
        plo = lo + self.pi * self.local_bs
        sel = order[plo:min(plo + self.local_bs, n)]
        rows = idxs[sel]

        xb = np.zeros((self.local_bs,) + self.x.shape[1:], self.x.dtype)
        yb = np.zeros((self.local_bs,), self.y.dtype)
        validb = np.zeros((self.local_bs,), np.float32)
        k = len(rows)
        xb[:k] = self.x[rows]
        yb[:k] = self.y[rows]
        validb[:k] = 1.0
        return {"x": xb, "y": yb, "valid": validb,
                "domain": np.full((self.local_bs,), d, np.int32)}

    def device_batch(self, d: int, mesh, extra_keys=()):
        """next_batch assembled into global jax.Arrays sharded P('data')
        over the mesh (jax.make_array_from_process_local_data): the global
        [global_bs, ...] batch whose shards are each host's slice."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        local = self.next_batch(d)
        sharding = NamedSharding(mesh, P("data"))
        out = {}
        for key, arr in local.items():
            gshape = (self.global_bs,) + arr.shape[1:]
            out[key] = jax.make_array_from_process_local_data(
                sharding, arr, gshape)
        return out
