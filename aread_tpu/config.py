"""Typed configuration.

Keeps the reference's knob names (main.py:14-38, config.py) so runs are
directly comparable: lr, bs, epoch, embed_dim, wd, early_stop, update_lr,
aug_ratio, warm_up_interval, regroup_interval, regroup_update_step,
regroup_eval_step, candidate_mask_num, random_modify_sigma,
init_active_percent, group_strategy, seq_maxlen, itemid_all.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

# Static dataset constants pinned by the reference config.py
ITEMID_ALL = 1368287  # config.py:7 — amazon item vocab incl. pad row
SEQ_MAXLEN = 5  # config.py:8

DOMAIN_SIZE: Dict[str, Tuple[int, ...]] = {  # config.py:59-65
    "amazon": (69360, 282546, 776105, 3001846, 88496, 449031, 2859592, 1893,
               1437340, 16454, 601698, 1802, 2416380, 197170, 202176, 6931,
               317131, 132650, 602500, 585227, 845268, 1107407, 997451,
               623565, 44843),
    "aliccp": (2695782, 1433175, 925817, 584726, 461755, 358265, 166869,
               113621, 78692, 65313, 54483, 45808, 40975, 37939, 34079,
               31703, 29551, 27084, 25027, 23464, 21764, 19857, 18390,
               16712, 15852, 14914, 13653, 12265, 11179, 9760),
}

DOMAIN2GROUP: Dict[str, Dict[str, Tuple[int, ...]]] = {  # config.py:67-74
    "amazon": {
        "dcn_3groups_kl": (0, 1, 0, 2, 2, 1, 1, 1, 1, 2, 1, 1, 1, 0, 2, 1, 1,
                           1, 1, 0, 1, 1, 1, 1, 1),
    },
    "aliccp": {
        "dcn_3groups_kl": (1, 0, 1, 0, 0, 0, 0, 0, 0, 2, 1, 0, 0, 0, 1, 2, 1,
                           0, 0, 0, 2, 0, 0, 2, 2, 2, 1, 1, 1, 1),
    },
}

DOMAIN_POSITIVE_LABEL = (  # config.py:17-19 (amazon)
    35801, 144419, 390519, 1505239, 46542, 205831, 1315090, 964, 701666,
    10261, 320500, 914, 1232366, 103986, 91991, 3097, 163525, 68118, 309269,
    288912, 433660, 554954, 522193, 319880, 20878)


@dataclasses.dataclass
class Config:
    """Run configuration (reference main.py argparse + config.py globals)."""

    model: str = "aread"
    dataset_name: str = "aliccp"
    base_model: str = "mmoe"
    seed: int = 2000
    lr: float = 1e-3
    bs: int = 1024
    epoch: int = 10
    embed_dim: int = 32
    wd: float = 1e-8
    early_stop: int = 2
    seq_maxlen: int = SEQ_MAXLEN
    itemid_all: int = ITEMID_ALL
    group_strategy: str = "dcn_3groups_kl"
    domain_filter: Optional[Sequence[int]] = None
    is_evaluate_multi_domain: bool = True
    prepare2train_month: int = 12

    # AREAD / HEMP (main.py:29-37)
    update_lr: float = 1e-2
    aug_ratio: float = 0.1
    warm_up_interval: int = 100
    regroup_interval: int = 2000
    regroup_update_step: int = 5
    regroup_eval_step: int = 5
    candidate_mask_num: int = 10
    random_modify_sigma: float = 0.2
    init_active_percent: float = 0.7

    # model hyper-params (config.py:21-57)
    mlp_dims: Tuple[int, ...] = (256, 128, 64)
    tower_dims: Tuple[int, ...] = (256, 128, 64, 32)
    use_atten: bool = True
    atten_embed_dim: int = 64
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True
    use_dcn: bool = True
    n_cross_layers: int = 3
    mmoe_n_expert: int = 4
    mmoe_expert_dims: Tuple[int, ...] = (256, 128, 64)
    mmoe_tower_dims: Tuple[int, ...] = (64, 32)
    ple_n_expert_specific: int = 2
    ple_n_expert_shared: int = 2
    ple_expert_dims: Tuple[Tuple[int, ...], ...] = ((256, 128), (64,))
    ple_tower_dims: Tuple[int, ...] = (64, 32)
    sei_dims: Tuple[int, ...] = (64, 32)
    dlm_iters: int = 3
    # replicate the reference's eval-time DLM center EMA updates
    # (adl.py:61-77 mutates under no_grad during eval batches); default
    # keeps eval pure — flag exists to measure the deviation's AUC effect
    adl_eval_dlm_update: bool = False
    aread_tower_dims: Tuple[Tuple[int, ...], ...] = ((64, 32), (32, 16), (16, 8))
    dropout: float = 0.2

    # MAMDR (reference reads these but never defines them — run.py:984,991;
    # we define working defaults so the MAMDR path is actually runnable)
    mamdr_meta_lr: float = 0.1
    mamdr_aux_sample_num: int = 2

    # AREAD final-gate phase (reference train_aread_final run.py:688-710 and
    # the commented-out flow run.py:861-885 read config.final_lr, which the
    # reference never defines; we define a working default)
    final_lr: float = 1e-3
    final_epoch: int = 10
    aread_final: bool = False  # run the final-gate phase after HEMP

    # paths
    data_path: str = "dataset"
    save_path: str = "save"
    # warm-start params/state (and AREAD domain masks) from the saved
    # best checkpoint before training (reference config.py:10,
    # run.py:835-840)
    is_increment: bool = False
    # elastic recovery: write a full resumable checkpoint (params / opt
    # state / HEMP masks+schedule / RNG key / epoch) on every improvement
    # — the reference's per-improvement torch.save (run.py:459-484) — and
    # auto-resume from it when one exists
    elastic: bool = False
    # JSONL metric sink directory (utils/runlog.py — the working
    # equivalent of the reference's wandb.log calls); None/empty = off
    log_dir: str = ""
    # force a jax platform in-process ('cpu', 'tpu', ...; '' = backend
    # default). The CLI needs this because the image pre-imports jax with
    # a pinned platform, so JAX_PLATFORMS in a subprocess env is ignored.
    platform: str = ""

    # TPU-native knobs (new)
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # 'adam': bit-exact reference dense-Adam semantics (every table row's
    # moments decay each step; ops/sparse_adam two-phase + Pallas kernel).
    # 'lazy_adam': torch.optim.SparseAdam / TF lazy-Adam semantics — only
    # the rows gathered this step update, O(batch) instead of O(table)
    # optimizer traffic; a documented deviation from the reference.
    table_optimizer: str = "adam"
    # optional global-norm gradient clipping (0 = off, the reference's
    # behavior). Beyond-reference stability knob: the r4 root-cause study
    # (PARITY.md) showed the shared lr=1e-2 gated-family recipe blows up
    # in BOTH frameworks; clipping keeps the high-lr mode trainable.
    grad_clip_norm: float = 0.0
    # dynamic domain->group regrouping for multi-tower models, applied
    # between epochs (train/regroup.py — the reachable realization of the
    # reference's DEAD regroup_all_domain, run.py:514-550: there
    # train_loss_domain_group is allocated at run.py:73 but never
    # populated and nothing calls the method). Comma-separated mode list:
    # 'towerfirst' | 'besttower', optionally prefixed by 'served' (e.g.
    # 'served,towerfirst'). The loss matrix is the per-(tower, domain)
    # valid-split BCE of ALL tower heads (the reference never defined
    # where its matrix came from; valid-split losses are the measurable
    # choice). 'off' (default) = the reference's effective behavior.
    dynamic_regroup: str = "off"
    # HEMP candidate fast-adaptation engine (train/hemp.py,
    # ops/overlay_adam.py). 'full': every candidate chain step runs the
    # full-table sparse-Adam sweep — the direct replication of the
    # reference's fresh dense torch Adam (run.py:632-657). 'overlay': the
    # chain updates only a compact working-set copy (the union of its
    # adapt batches' rows, with exact dense-Adam semantics including
    # momentum/decay for set rows untouched on a given step) and probe
    # lookups replay the closed decay-only drift recurrence for rows
    # outside the set — the same chain to float round-off, with cost
    # independent of table size. MEASURED CROSSOVER (end-to-end warm
    # regroups, benchmarks/bench_evolution.py, r5): full-sweep evolution
    # scales with the table (4.1 s at Amazon vocab, 8.4 s at 4x, 14.3 s
    # at 8x) while overlay stays FLAT at ~9.8 s -> crossover ~240M table
    # elements (~5x Amazon; overlay also compiles 2-4x faster there).
    # 'auto' (default): overlay on single-device sparse-grad runs whose
    # table exceeds that crossover (AREADTrainer.OVERLAY_AUTO_MIN_ELEMS),
    # full otherwise — so Amazon/AliCCP production runs keep the sweep
    # and giant-vocab deployments get O(batch) evolutions automatically.
    hemp_fast_adapt: str = "auto"  # 'auto' | 'overlay' | 'full'
    # storage dtype of the table Adam moments (m, v). 'bfloat16' halves
    # their share of the per-step table sweep (24 -> 16 bytes/element-pass;
    # compute stays fp32). DEFAULT since r4: +19% train throughput (369k
    # vs 310k ex/s, bench.py) with IDENTICAL quality at the 2M-row scale
    # run (test mean_auc 0.7189 bf16m vs 0.7187 exact,
    # benchmarks/scale_signal_bf16m.json; defaults decision in
    # BASELINE.md). 'float32' restores bit-exact torch-Adam moments for
    # loss-curve-level parity work (e.g. benchmarks/probe_gated_dynamics).
    table_moments_dtype: str = "bfloat16"  # 'bfloat16' | 'float32'
    # storage dtype of the fused embedding TABLE itself. 'bfloat16' halves
    # the table's read+write share of the sparse-Adam sweep (the last
    # single-chip throughput lever: 389 of 777 MB/step at the bf16m
    # default) plus the forward gather traffic. All optimizer compute
    # stays f32 in-register and the write back is STOCHASTICALLY rounded
    # (ops/rounding.py — per-step Adam deltas sit below the bf16 quantum
    # of N(0,1) embeddings, so round-to-nearest would freeze updates; SR
    # keeps E[w] exact). Forward casts gathered rows to f32.
    # DEFAULT since r5: bench 482k vs 420k ex/s (+15%) in the same run,
    # with IDENTICAL 2M-row quality (AREAD+HEMP test mean_auc 0.7633 =
    # the bf16m default's 0.7633; wo_mask 0.7192 vs 0.7189 —
    # benchmarks/scale_signal_bf16t.json, defaults decision in
    # BASELINE.md). 'float32' restores the reference's exact monolithic-
    # table semantics for parity work.
    table_dtype: str = "bfloat16"  # 'bfloat16' | 'float32'
    # include the stop_gradient table-L2 term in REPORTED losses so they
    # match the reference's printed losses (run.py:505). It never affects
    # gradients (the table L2 gradient folds into the fused Adam). On the
    # sparse-Adam Pallas kernel path the VALUE accumulates inside the
    # optimizer's table sweep at zero extra HBM traffic; other paths pay
    # one full-table read (~0.21 ms/step at Amazon scale).
    loss_report_table_l2: bool = True
    # JAX PRNG implementation for dropout masks. 'rbg' is the TPU-native
    # generator (~0.3 ms/step faster than 'threefry' at bs=1024) and the
    # default: only the dropout bit-stream changes, never the
    # distribution — run-to-run metric variance is the parity criterion
    # (BASELINE.md). 'threefry' restores JAX's reproducible-across-
    # backends default stream.
    prng_impl: str = "rbg"  # 'rbg' | 'threefry'
    mesh_data: int = 1  # data-parallel axis size
    mesh_model: int = 1  # model-parallel (embedding row-shard) axis size
    sparse_table_grad: bool = True  # sparse embedding-table gradients:
    # grads taken w.r.t. the gathered rows (flax perturb tap) + 2-phase
    # sparse Adam — bit-identical to dense torch-Adam, skips the dense
    # [n_rows, E] cotangent (ops/sparse_adam.py)
    # device-resident training data: the train split is transferred to HBM
    # ONCE and each epoch runs as a single on-device lax.scan that gathers
    # its batches by a device-resident permutation — no per-chunk host
    # staging/stacking, no per-chunk transfers (only the [n_batches, bs]
    # int32 permutation crosses the tunnel per epoch). Numerically
    # identical to the host-staged path (same shuffle stream, same RNG
    # chain, same padded-batch semantics). 'auto' enables it on single-
    # host runs when the split fits the HBM budget; '1'/'0' force.
    device_data: str = "auto"  # 'auto' | '1' | '0'
    streaming_eval: bool = False  # device-resident histogram AUC (scales
    # across the mesh; only [n_domain, auc_bins] histograms reach the host)
    auc_bins: int = 16384
    # failure detection (parallel/health.py): watchdog deadline per train
    # epoch, seconds; 0 = off. A breach is logged when it fires and raises
    # HealthError when the epoch eventually returns (slow-but-completing
    # epochs). A PERMANENTLY hung epoch (dead host, stuck collective)
    # never returns to Python — set epoch_timeout_kill for those: the
    # watchdog hard-exits the process (code 42) so an orchestrator can
    # reschedule; pair with --elastic for restart-and-resume.
    # Sharded-embedding gather under a mesh: 'gspmd' lets XLA partition
    # the plain gather (robust default); 'a2a' routes it through the
    # explicit dedup + all-to-all exchange (parallel/embed_shard.
    # a2a_lookup — measured 5.4x less ICI traffic at Amazon shapes,
    # BASELINE.md). a2a_capacity is its static per-owner bucket bound:
    # 0 (default) = AUTO — the trainers calibrate it from sample batches
    # with 1.25x headroom before tracing (embed_shard.
    # resolve_a2a_capacity); >0 = manual bound (validated, fail-fast);
    # -1 = always-exact local id count (no traffic win).
    embed_lookup: str = "gspmd"
    a2a_capacity: int = 0
    epoch_timeout_s: float = 0.0
    epoch_timeout_kill: bool = False
    # the FIRST epoch after process start includes jit compiles (20-40 s
    # per trace over the TPU tunnel) and the first device_put (minutes,
    # CLAUDE.md) — a deadline tuned to steady-state epochs would spuriously
    # fire there, and with epoch_timeout_kill + --elastic could become a
    # kill/restart loop that never finishes epoch 0. The first wrapped
    # epoch of each process gets timeout * this grace multiplier.
    epoch_timeout_first_mult: float = 5.0

    def domain2group(self) -> Optional[Tuple[int, ...]]:
        """Precomputed domain->group map (reference config.py:67-74), or
        None when the DATASET has no precomputed grouping (cloudtheme —
        the reference crashes there, run.py:43-45 KeyError; callers fall
        back to a modulo grouping over n_tower groups). An unknown
        group_strategy on a dataset that HAS groupings still fails fast
        (a typo must not silently train with the fallback grouping)."""
        groups = DOMAIN2GROUP.get(self.dataset_name)
        if groups is None:
            return None
        return groups[self.group_strategy]

    @property
    def n_tower(self) -> int:
        d2g = self.domain2group()
        # 3 = the reference's group count for both precomputed datasets
        return 3 if d2g is None else max(d2g) + 1
