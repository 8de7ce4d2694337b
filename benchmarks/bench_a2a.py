"""Sharded embedding lookup comparison: GSPMD gather vs psum-gather vs the
dedup + all-to-all exchange (parallel/embed_shard.a2a_lookup).

Real multi-chip ICI is unavailable on this box (one tunneled TPU), so two
honest proxies on the forced 8-CPU mesh, Amazon-shaped
(table 1,520,000 x 32 packed to [380k, 128], bs 1024, 17 flat ids/row):

  1. per-device COLLECTIVE BYTES parsed from each path's optimized HLO —
     backend-independent: the bytes a collective moves are decided at
     partitioning time, and ICI cost is proportional to them;
  2. wall time per lookup on the CPU mesh (weak proxy; CPU collectives are
     memcpy-bound, but catastrophic regressions still show).

Run: python benchmarks/bench_a2a.py  (CPU only, ~2-4 min of compiles)
Writes one JSON line per path.
"""

from __future__ import annotations

import json
import os as _os
import re
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def collective_bytes(hlo_text: str) -> dict:
    """Per-replica collective buffer bytes from an optimized HLO dump.

    Parses each collective instruction's OUTPUT type (scalar or tuple) and
    sums element bytes. Returns {op: buffer_bytes}. Wire cost differs per
    op: ring all-reduce moves ~2x its buffer across links; all-to-all
    moves (groupsize-1)/groupsize of its buffer.
    """
    sizes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
             "u8": 1, "f64": 8, "s64": 8, "u64": 8}
    out = {}
    line_pat = re.compile(
        r"=\s*(.*?)\s*(all-to-all|all-reduce|all-gather|reduce-scatter|"
        r"collective-permute)(?:\.\d+)?\(")
    ty_pat = re.compile(r"(\w+)\[([\d,]*)\]")
    for line in hlo_text.splitlines():
        m = line_pat.search(line)
        if not m:
            continue
        outs, op = m.groups()
        total = 0
        for dtype, shape in ty_pat.findall(outs):
            if dtype not in sizes:
                continue
            n = 1
            for d in shape.split(","):
                if d:
                    n *= int(d)
            total += n * sizes[dtype]
        if total:
            out[op] = out.get(op, 0) + total
    return out


def main():
    import os

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aread_tpu.parallel.embed_shard import (a2a_lookup,
                                                a2a_required_capacity,
                                                lookup_reference,
                                                sharded_lookup)
    from aread_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=2)
    # Amazon-shaped, lane-packed flat table: 1.52M x 32 -> [380k, 128]
    rows, width = 380_000, 128
    bs, f = 1024, 17
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((rows, width)), jnp.float32)
    # realistic id duplication: itemid near-unique, small-vocab fields and
    # a single-domain batch collapse onto few rows
    ids_np = np.concatenate(
        [rng.integers(0, 342_000, size=(bs, 1)),         # itemid / 4
         rng.integers(342_000, 342_100, size=(bs, 6)),   # small fields
         rng.integers(0, 342_000, size=(bs, 10))],       # history seqs
        axis=1).astype(np.int32)
    ids = jnp.asarray(ids_np)
    tsh = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ish = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    cap = a2a_required_capacity(ids_np, rows, 2, n_data=4)

    paths = {
        "gspmd_gather": lambda t, i: lookup_reference(t, i),
        "psum_gather": lambda t, i: sharded_lookup(t, i, mesh),
        "a2a_exchange": lambda t, i: a2a_lookup(t, i, mesh, capacity=cap),
    }
    out_sh = NamedSharding(mesh, P("data", None, None))
    want = None
    for name, fn in paths.items():
        jf = jax.jit(fn, out_shardings=out_sh)
        lowered = jf.lower(tsh, ish)
        hlo = lowered.compile().as_text()
        coll = collective_bytes(hlo)
        got = jf(tsh, ish)
        got.block_until_ready()
        if want is None:
            want = np.asarray(got)
        else:
            np.testing.assert_array_equal(np.asarray(got), want)
        t0 = time.perf_counter()
        n_it = 20
        for _ in range(n_it):
            got = jf(tsh, ish)
        got.block_until_ready()
        dt = (time.perf_counter() - t0) / n_it
        # wire bytes per device: ring all-reduce ~2x buffer; all-to-all /
        # all-gather / reduce-scatter ~(g-1)/g x buffer (g=2 model shards)
        wire = (coll.get("all-reduce", 0) * 2
                + sum(v for k, v in coll.items() if k != "all-reduce") * 0.5)
        print(json.dumps({
            "path": name, "wall_ms_cpu_mesh": round(dt * 1e3, 2),
            "collective_buffer_bytes": coll,
            "est_wire_mb_per_device": round(wire / 2**20, 3),
            "a2a_capacity": cap if name == "a2a_exchange" else None,
        }), flush=True)


if __name__ == "__main__":
    main()
