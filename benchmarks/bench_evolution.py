"""End-to-end HEMP mask-evolution cost: overlay vs full fast-adapt
engines at production shapes (the honest crossover measurement behind
config.hemp_fast_adapt='auto' / AREADTrainer.OVERLAY_AUTO_MIN_ELEMS).

One production-cadence regroup = n_domain x candidate_mask_num candidate
chains x (regroup_update_step adapt + regroup_eval_step probe) steps, all
in one device dispatch. Vocab is scaled by AREAD_TPU_BENCH_EVO_SCALE
(default 1.0 = Amazon itemid vocab 1,368,287) to trace the crossover.

Run: python benchmarks/bench_evolution.py        (~4 min / scale)
     AREAD_TPU_BENCH_EVO_SCALE=2 python benchmarks/bench_evolution.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    from aread_tpu.utils.device_cleanup import install
    install()
    from aread_tpu.utils.jit_cache import enable
    enable()
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from aread_tpu.config import Config
    from aread_tpu.data.loader import DomainBatcher
    from aread_tpu.models import build_model
    from aread_tpu.train.hemp import AREADTrainer

    scale = float(os.environ.get("AREAD_TPU_BENCH_EVO_SCALE", "1"))
    bs, embed_dim, n_domain = 1024, 32, 25
    from aread_tpu.models.base import FeatureSpec
    spec = FeatureSpec(
        one_hot_dims=(int(1368287 * scale), 7, 25, 40, 11,
                      int(150000 * scale), 12),
        n_seq_fields=2, itemid_idx=0, domain_idx=2, seq_maxlen=5)
    n_rows = int(np.sum(spec.one_hot_dims))
    print(f"scale={scale} table elements = {n_rows * embed_dim:,}",
          flush=True)

    # enough rows that every domain can fill its adapt/probe batches
    N = 400_000
    rng = np.random.default_rng(0)
    cols = [rng.integers(0, d, size=(N, 1)) for d in spec.one_hot_dims]
    seqs = rng.integers(0, spec.one_hot_dims[0], size=(N, 10))
    x = np.concatenate(cols + [seqs], axis=1).astype(np.int32)
    y = rng.integers(0, 2, size=N).astype(np.float32)

    results = {}
    for engine in ("full", "overlay"):
        cfg = Config(model="aread", dataset_name="amazon", bs=bs,
                     embed_dim=embed_dim, epoch=1, warm_up_interval=1,
                     regroup_interval=2000, candidate_mask_num=10,
                     regroup_update_step=5, regroup_eval_step=5,
                     hemp_fast_adapt=engine)
        model = build_model(cfg, spec, n_domain)
        tr = AREADTrainer(model, cfg, n_domain)
        assert tr.overlay_enabled() == (engine == "overlay")
        tb = DomainBatcher(x, y, bs, spec.domain_idx, n_domain, seed=0)
        ab = DomainBatcher(x, y, bs, spec.domain_idx, n_domain, seed=1)
        tr.stage_device_data(x, y, x, y)
        k = jax.random.PRNGKey(0)
        params, state, _ = tr.init(k, tb.next_batch(0))
        walls = []
        for rep in range(3):  # rep 0 = compile
            t0 = time.perf_counter()
            params, state, k = tr._mask_evolution(params, state, tb, ab, k,
                                                  verbose=False)
            walls.append(round(time.perf_counter() - t0, 2))
        n_cand = max(1, int(tr.candidate_mask_num))
        results[engine] = {"walls_s": walls, "warm_s": min(walls[1:]),
                           "chains": n_domain * n_cand}
        print(f"{engine}: compile {walls[0]}s, warm {walls[1:]}s "
              f"({n_domain * n_cand}ish chains of 5+5)", flush=True)
        del params, state, tr
    results["scale"] = scale
    results["table_elements"] = n_rows * embed_dim
    print(json.dumps(results))
    out = os.path.join(REPO, "benchmarks", "bench_evolution.json")
    hist = []
    if os.path.exists(out):
        with open(out) as f:
            hist = json.load(f)
    hist.append(results)
    with open(out, "w") as f:
        json.dump(hist, f, indent=1)


if __name__ == "__main__":
    main()
