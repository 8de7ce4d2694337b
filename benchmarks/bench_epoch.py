"""End-to-end EPOCH throughput at Amazon scale (17.9M rows, vocab 1.37M).

Unlike bench.py (the hot-step microbench), this measures a full training
epoch through the production trainer paths, including input handling:

  * generic trainer (MMoE, multi-tower + group gather) over the
    device-resident epoch path (config.device_data): the split is placed
    in HBM once; each epoch is ONE lax.scan dispatch whose only per-epoch
    transfer is the [n_steps, bs] int32 permutation, preceded by the
    on-device whole-epoch kernel-window precheck;
  * the same epoch through the host-staged scan-chunk path
    (device_data='0') for comparison;
  * AREAD + HEMP over the domain-grouped batcher (a reduced split so a
    full epoch with one mask-evolution regroup finishes in minutes),
    reporting end-to-end examples/s including host mask logic.

Row count defaults to AMAZON_N (env AREAD_TPU_BENCH_EPOCH_ROWS) — the
reference's Amazon split is ~17.9M train rows (SURVEY.md §6). Results are
recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


AMAZON_N = int(os.environ.get("AREAD_TPU_BENCH_EPOCH_ROWS", 17_900_000))
AREAD_N = int(os.environ.get("AREAD_TPU_BENCH_EPOCH_AREAD_ROWS", 2_000_000))


def synth(n_rows: int, spec, seed: int = 0):
    """Uniform ids at the Amazon layout (labels random — this measures
    throughput, not quality)."""
    rng = np.random.default_rng(seed)
    cols = [rng.integers(0, d, size=(n_rows, 1), dtype=np.int32)
            for d in spec.one_hot_dims]
    seqs = rng.integers(0, spec.one_hot_dims[spec.itemid_idx],
                        size=(n_rows, spec.n_seq_fields * spec.seq_maxlen),
                        dtype=np.int32)
    x = np.concatenate(cols + [seqs], axis=1)
    y = rng.integers(0, 2, size=n_rows).astype(np.int8)
    return x, y


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    from aread_tpu.utils.jit_cache import enable as enable_jit_cache
    enable_jit_cache()
    import jax.numpy as jnp

    from aread_tpu.config import Config, DOMAIN2GROUP
    from aread_tpu.data.loader import DomainBatcher, GlobalBatcher
    from aread_tpu.models import build_model
    from aread_tpu.models.base import FeatureSpec
    from aread_tpu.train.trainer import Trainer, split_variables

    bs, embed_dim = 1024, 32
    spec = FeatureSpec(
        one_hot_dims=(1368287, 7, 25, 40, 11, 150000, 12),
        n_seq_fields=2, itemid_idx=0, domain_idx=2,
        seq_maxlen=5).with_flat_table(embed_dim)
    n_domain = 25
    d2g = np.array(DOMAIN2GROUP["amazon"]["dcn_3groups_kl"])

    results = {}
    # ---------------- generic trainer (MMoE), device-resident epoch
    if not os.environ.get("AREAD_TPU_BENCH_EPOCH_SKIP_MMOE"):
        cfg = Config(model="mmoe", dataset_name="amazon", bs=bs,
                     embed_dim=embed_dim, epoch=1)
        model = build_model(cfg, spec, n_domain)
        trainer = Trainer(model, cfg, n_domain, domain2group=d2g)

        print(f"synthesizing {AMAZON_N:,} rows ...", flush=True)
        x, y = synth(AMAZON_N, spec)
        print(f"split: {x.nbytes / 2**30:.2f} GiB", flush=True)

        rng = jax.random.PRNGKey(0)
        batcher = GlobalBatcher(x, y, bs, spec.domain_idx, d2g, seed=0)
        first = next(iter(GlobalBatcher(x[:bs], y[:bs], bs, spec.domain_idx,
                                        d2g, shuffle=False)))
        params, state, opt_state = trainer.init(rng, first)

        for label, fn in (
            ("mmoe_epoch_device", trainer.train_epoch_device),
            ("mmoe_epoch_host", trainer.train_epoch),
        ):
            # warm-up epoch compiles; second epoch measures
            for phase in ("compile", "measure"):
                t0 = time.perf_counter()
                params, state, opt_state, rng, loss = fn(
                    params, state, opt_state, batcher, rng)
                loss = float(loss)  # sync (tunnel returns early otherwise)
                dt = time.perf_counter() - t0
                eps = AMAZON_N / dt
                print(f"{label} [{phase}]: {dt:.1f}s  {eps:,.0f} ex/s  "
                      f"loss={loss:.4f}", flush=True)
            results[label] = round(eps, 1)
            if os.environ.get("AREAD_TPU_BENCH_EPOCH_SKIP_HOST"):
                break

        # ------------ eval-path throughput (VERDICT r3 item 5): the
        # reference's eval half of the epoch loop (run.py:712-763) at the
        # same 17.9M-row scale, through BOTH our eval modes — the
        # device-resident streaming-histogram AUC (only [n_domain, bins]
        # histograms cross the tunnel) and the host-fetch sklearn-exact
        # path. End-to-end wall: includes host->device batch transfers
        # and the final AUC computation.
        if not os.environ.get("AREAD_TPU_BENCH_EPOCH_SKIP_EVAL"):
            dcw = np.full(n_domain, 1.0 / n_domain)
            for label, streaming in (("mmoe_eval_streaming_exs", True),
                                     ("mmoe_eval_host_exs", False)):
                cfg.streaming_eval = streaming
                trainer._eval_step = trainer._eval_accum_step = None
                for phase in ("compile", "measure"):
                    t0 = time.perf_counter()
                    res = trainer.evaluate(params, state, x, y, dcw)
                    dt = time.perf_counter() - t0
                    eps = AMAZON_N / dt
                    print(f"{label} [{phase}]: {dt:.1f}s  {eps:,.0f} ex/s  "
                          f"auc={res['total_auc']:.4f}", flush=True)
                results[label] = round(eps, 1)

        del x, y, batcher
        trainer._device_data = None
    if os.environ.get("AREAD_TPU_BENCH_EPOCH_SKIP_AREAD"):
        print(json.dumps(results))
        return

    # ---------------- AREAD + HEMP end-to-end epoch (reduced rows)
    from aread_tpu.train.hemp import AREADTrainer

    # default: ~2 regroups on the reduced split. For the FULL Amazon-scale
    # AREAD row (AREAD_TPU_BENCH_EPOCH_AREAD_ROWS=17900000, VERDICT r4
    # item 3) set AREAD_TPU_BENCH_EPOCH_REGROUP=2000 — the reference's
    # production cadence (main.py regroup_interval default) — and
    # AREAD_TPU_BENCH_EPOCH_CANDIDATES=10 (its candidate_mask_num).
    regroup = int(os.environ.get("AREAD_TPU_BENCH_EPOCH_REGROUP",
                                 int(AREAD_N / 1024 / 2)))
    n_cand = int(os.environ.get("AREAD_TPU_BENCH_EPOCH_CANDIDATES", 3))
    acfg = Config(model="aread", dataset_name="amazon", bs=bs,
                  embed_dim=embed_dim, epoch=1,
                  warm_up_interval=32,
                  regroup_interval=regroup,
                  candidate_mask_num=n_cand, regroup_update_step=5,
                  regroup_eval_step=5)
    amodel = build_model(acfg, spec, n_domain)
    atrainer = AREADTrainer(amodel, acfg, n_domain)
    ax, ay = synth(AREAD_N, spec, seed=1)
    # domain sizes follow the synthetic uniform draw; DomainBatcher pads
    train_b = DomainBatcher(ax, ay, bs, spec.domain_idx, n_domain, seed=0)
    aug_b = DomainBatcher(ax, ay, bs, spec.domain_idx, n_domain, seed=1)
    # the production fit() stages this; train_epoch is driven directly
    # here, so stage explicitly — without it the HOST-staged path runs
    staged = atrainer.stage_device_data(ax, ay, ax, ay)
    print(f"aread device-resident split: {staged}", flush=True)
    rng = jax.random.PRNGKey(1)
    sample = train_b.next_batch(0)
    aparams, astate, aopt = atrainer.init(rng, sample)

    t0 = time.perf_counter()
    aparams, astate, aopt, rng, aloss = atrainer.train_epoch(
        aparams, astate, aopt, 0, train_b, aug_b, rng, verbose=True)
    print(f"aread_hemp epoch 0 (compiles + warm-up): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    # epoch 1 is the steady state: everything compiled, no warm-up.
    # NOTE the step timer is NOT a valid measure on the device-resident
    # path (dispatches are async and nothing blocks until the evolution
    # or epoch-end fetches) — wall time over the epoch is the honest
    # end-to-end number, with the mask-evolution share reported alongside
    train_b.shuffle_seq()
    t0 = time.perf_counter()
    aparams, astate, aopt, rng, aloss = atrainer.train_epoch(
        aparams, astate, aopt, 1, train_b, aug_b, rng, verbose=True)
    aloss = float(aloss)
    dt = time.perf_counter() - t0
    print(f"aread_hemp_epoch: wall {dt:.1f}s = {AREAD_N/dt:,.0f} ex/s "
          f"end to end (incl. HEMP mask evolutions), loss={aloss:.4f}",
          flush=True)
    results["aread_hemp_epoch_wall_exs"] = round(AREAD_N / dt, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
