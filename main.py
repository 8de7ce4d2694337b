"""CLI entry point, mirroring the reference's main.py flags
(main.py:14-38) on top of the TPU-native stack.

  python main.py --model aread --dataset_name aliccp \
      --data_path /root/reference/dataset ...

Flow (reference main.py:64-76): load config -> (preprocessed CSV must
exist; the bundled 3k-row samples work out of the box) -> train + eval.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import random

import numpy as np

from aread_tpu.config import Config


def load_config() -> Config:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="aread")
    parser.add_argument("--dataset_name", default="aliccp")
    parser.add_argument("--base_model", default="mmoe")
    parser.add_argument("--seed", type=int, default=2000)
    parser.add_argument("--is_set_seed", type=int, default=1,
                        help="0: derive a unique seed from the argument "
                             "set instead of --seed (reference "
                             "main.py:40-44)")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--bs", type=int, default=1024)
    parser.add_argument("--epoch", type=int, default=10)
    parser.add_argument("--embed_dim", type=int, default=32)
    parser.add_argument("--prepare2train_month", type=int, default=12)
    parser.add_argument("--domain_filter", default=None)
    parser.add_argument("--group_strategy", default="dcn_3groups_kl")
    # AREAD / HEMP
    parser.add_argument("--update_lr", type=float, default=1e-2)
    parser.add_argument("--aug_ratio", type=float, default=0.1)
    parser.add_argument("--warm_up_interval", type=int, default=100)
    parser.add_argument("--regroup_interval", type=int, default=2000)
    parser.add_argument("--regroup_update_step", type=int, default=5)
    parser.add_argument("--regroup_eval_step", type=int, default=5)
    parser.add_argument("--candidate_mask_num", type=int, default=10)
    parser.add_argument("--random_modify_sigma", type=float, default=0.2)
    parser.add_argument("--init_active_percent", type=float, default=0.7)
    parser.add_argument("--aread_final", action="store_true",
                        help="train the leaf final gate after HEMP "
                             "(reference run.py:861-885)")
    parser.add_argument("--final_lr", type=float, default=1e-3)
    parser.add_argument("--final_epoch", type=int, default=10)
    # infra
    parser.add_argument("--data_path", default="dataset")
    parser.add_argument("--save_path", default="save")
    parser.add_argument("--is_increment", action="store_true",
                        help="warm-start from the saved best checkpoint "
                             "(reference config.py:10, run.py:835-840)")
    parser.add_argument("--elastic", action="store_true",
                        help="crash-safe training: save a full resumable "
                             "checkpoint (params/opt state/HEMP masks+"
                             "schedule/RNG/epoch) on every improvement and "
                             "auto-resume from it if present (the "
                             "reference's per-improvement torch.save, "
                             "run.py:459-484, plus recovery)")
    parser.add_argument("--log_dir", default="",
                        help="JSONL metric sink dir (the working equivalent "
                             "of the reference's wandb.log calls); empty = off")
    parser.add_argument("--platform", default="",
                        help="force a jax platform (e.g. 'cpu') in-process; "
                             "empty = leave the default backend. Needed "
                             "because this image pre-imports jax with a "
                             "pinned platform, so JAX_PLATFORMS in the "
                             "environment is ignored by subprocesses")
    parser.add_argument("--mesh_data", type=int, default=1)
    parser.add_argument("--mesh_model", type=int, default=1)
    parser.add_argument("--table_optimizer", default="adam",
                        choices=["adam", "lazy_adam"],
                        help="'adam' = reference dense-Adam semantics "
                             "(exact); 'lazy_adam' = torch SparseAdam "
                             "semantics, only touched rows update "
                             "(O(batch) optimizer traffic)")
    parser.add_argument("--loss_report_table_l2", type=int, default=1,
                        help="include the (gradient-free) table L2 term in "
                             "reported losses for reference loss parity "
                             "(free on the sparse-Adam kernel path; one "
                             "full-table read elsewhere)")
    parser.add_argument("--prng_impl", default="rbg",
                        choices=["rbg", "threefry"],
                        help="dropout PRNG; rbg (TPU-native, default) is "
                             "~0.3 ms/step faster, threefry restores JAX's "
                             "cross-backend-reproducible stream")
    parser.add_argument("--table_moments_dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="storage dtype of the table Adam moments; "
                             "bfloat16 (default; +19%% ex/s, identical "
                             "2M-row AUC — BASELINE.md) cuts the "
                             "optimizer's sweep traffic, compute stays "
                             "f32; float32 = bit-exact torch Adam")
    parser.add_argument("--table_dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="storage dtype of the embedding table itself; "
                             "bfloat16 (default; +15%% ex/s, identical "
                             "2M-row AUC — BASELINE.md) halves its "
                             "optimizer-sweep and gather traffic "
                             "(stochastic-rounded writes, f32 compute); "
                             "float32 = reference-exact")
    parser.add_argument("--use_dcn", type=int, default=1,
                        help="side CrossNetwork tower in multi-tower models "
                             "(reference config.py:35; its default-on path "
                             "crashes in the reference, layer.py:54)")
    parser.add_argument("--use_atten", type=int, default=1,
                        help="side AutoInt attention tower "
                             "(reference config.py:28)")
    parser.add_argument("--grad_clip_norm", type=float, default=0.0,
                        help="global-norm gradient clipping (0 = off, the "
                             "reference's behavior); stabilizes the "
                             "high-lr recipes whose blow-ups the r4 "
                             "root-cause study documents (PARITY.md)")
    parser.add_argument("--dynamic_regroup", default="off",
                        help="between-epoch domain->group regrouping for "
                             "multi-tower models from per-(tower,domain) "
                             "valid BCE (reachable realization of the "
                             "reference's dead regroup_all_domain, "
                             "run.py:514-537). Comma-separated modes: "
                             "'towerfirst' | 'besttower', optional "
                             "'served' prefix (e.g. 'served,towerfirst'); "
                             "'off' disables (reference behavior)")
    parser.add_argument("--hemp_fast_adapt", default="auto",
                        choices=["auto", "overlay", "full"],
                        help="HEMP candidate fast-adapt engine: 'overlay' "
                             "runs each chain on a compact working-set "
                             "copy with exact dense-Adam semantics "
                             "(evolution cost independent of vocab size, "
                             "ops/overlay_adam.py); 'full' sweeps the "
                             "whole table per chain step (the direct "
                             "reference replication); 'auto' (default) "
                             "picks by the measured crossover — full up "
                             "to ~5x Amazon vocab where the streamed "
                             "bf16 sweep is cheaper, overlay beyond "
                             "(240M table elements; BASELINE.md)")
    parser.add_argument("--adl_eval_dlm_update", action="store_true",
                        help="ADL: replicate the reference's eval-time DLM "
                             "center EMA updates (adl.py:61-77); default "
                             "keeps eval pure (documented deviation)")
    parser.add_argument("--device_data", default="auto",
                        choices=("auto", "1", "0"),
                        help="device-resident train split: one on-device "
                             "scan per epoch, no per-chunk host staging "
                             "(auto: on when the split fits the HBM budget)")
    parser.add_argument("--streaming_eval", action="store_true",
                        help="device-resident histogram AUC eval (only "
                             "[n_domain, auc_bins] histograms reach host)")
    parser.add_argument("--auc_bins", type=int, default=16384)
    parser.add_argument("--embed_lookup", default="gspmd",
                        choices=("gspmd", "a2a"),
                        help="sharded-embedding gather under a mesh: XLA-"
                             "partitioned gather, or the explicit dedup + "
                             "all-to-all exchange (5.4x less ICI traffic "
                             "at Amazon shapes; BASELINE.md)")
    parser.add_argument("--a2a_capacity", type=int, default=0,
                        help="static per-owner id-bucket bound for "
                             "--embed_lookup a2a (0 = auto-calibrated "
                             "from sample batches with 1.25x headroom; "
                             ">0 = manual, validated; -1 = always-exact)")
    parser.add_argument("--epoch_timeout_s", type=float, default=0.0,
                        help="failure detection: watchdog deadline per "
                             "train epoch (0 = off). Logs at the deadline "
                             "and raises once the epoch returns; for "
                             "PERMANENTLY hung epochs add "
                             "--epoch_timeout_kill; pair with --elastic")
    parser.add_argument("--epoch_timeout_kill", action="store_true",
                        help="hard-exit (code 42) when the epoch watchdog "
                             "fires — the only way out of a hung "
                             "collective that never returns to Python; an "
                             "orchestrator then reschedules and --elastic "
                             "resumes")
    args = parser.parse_args()

    if args.is_set_seed == 0:
        # unique seed derived from the full argument set (main.py:40-44;
        # hashlib instead of hash() so it is stable across processes —
        # python randomizes str hashes per run)
        import hashlib
        digest = hashlib.sha1(repr(sorted(vars(args).items())).encode())
        args.seed = int(digest.hexdigest(), 16) % 10000
        print("set args.seed:", args.seed)

    cfg_fields = {f.name for f in dataclasses.fields(Config)}
    kwargs = {k: v for k, v in vars(args).items() if k in cfg_fields}
    if isinstance(kwargs.get("domain_filter"), str):
        # "[0,1,2]" -> [0, 1, 2] (reference run.py:148-149 literal_evals)
        import ast
        kwargs["domain_filter"] = ast.literal_eval(kwargs["domain_filter"])
    cfg = Config(**kwargs)
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)
    return cfg


def preprocess_csv_path(cfg: Config) -> str:
    """Build the canonical CSV from raw dumps when missing (the reference
    runs DataPreprocessing.main on every invocation and skips when the
    preprocessed CSV exists, preprocess.py:476-478); returns its path."""
    from aread_tpu.data.pipeline import run_preprocessing

    return run_preprocessing(cfg.dataset_name, cfg.data_path,
                             prepare2train_month=cfg.prepare2train_month,
                             seed=cfg.seed)


def main():
    cfg = load_config()
    import jax
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    from aread_tpu.utils.device_cleanup import install as install_device_cleanup
    install_device_cleanup()  # free HBM at exit — a leaked session blocks
    # the next process's TPU claim for minutes (see device_cleanup.py)
    from aread_tpu.utils.jit_cache import enable as enable_jit_cache
    enable_jit_cache()
    from aread_tpu.data.loader import load_split_data
    from aread_tpu.models import build_model
    from aread_tpu.models.aread import AREAD
    from aread_tpu.train.hemp import AREADTrainer
    from aread_tpu.train.trainer import Trainer

    path = preprocess_csv_path(cfg)
    is_aread = "aread" in cfg.model
    aug_path = path.replace(".csv", f"_aug{cfg.aug_ratio}.csv") if is_aread else None
    if aug_path is not None and not os.path.exists(aug_path):
        # generate the counterfactually augmented file (the reference
        # produces it during preprocessing, preprocess.py:368-474); the
        # dataset dir may be read-only, so write under save_path
        import pandas as pd
        from aread_tpu.data.augment import make_augmentation
        out_dir = os.path.join(cfg.save_path, cfg.dataset_name)
        os.makedirs(out_dir, exist_ok=True)
        gen_path = os.path.join(out_dir, os.path.basename(aug_path))
        if not os.path.exists(gen_path):
            df = pd.read_csv(path)
            aug_df = make_augmentation(df, cfg.dataset_name, cfg.aug_ratio,
                                       rng=np.random.default_rng(cfg.seed))
            aug_df.to_csv(gen_path, index=False)
            print(f"generated augmentation: {gen_path} "
                  f"({len(aug_df) - len(df)} augmented rows)")
        aug_path = gen_path
    itemid_all = cfg.itemid_all if cfg.dataset_name == "amazon" else None
    data = load_split_data(path, cfg.dataset_name, cfg.seq_maxlen,
                           itemid_all=itemid_all, aug_path=aug_path,
                           domain_filter=cfg.domain_filter)

    print(f"model:{cfg.model}, lr:{cfg.lr}, bs:{cfg.bs}, embed_dim:"
          f"{cfg.embed_dim}, epoch:{cfg.epoch}, seed:{cfg.seed}, "
          f"dataset:{cfg.dataset_name}, n_domain:{data.n_domain}")

    mesh = None
    if cfg.mesh_data * cfg.mesh_model > 1:
        import dataclasses as _dc
        from aread_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=cfg.mesh_data, model=cfg.mesh_model)
        assert cfg.bs % cfg.mesh_data == 0, "bs must divide the data axis"
        # table rows must divide the model axis for row-sharding
        data = _dc.replace(data, spec=data.spec.pad_vocab(cfg.mesh_model))
        print(f"mesh: data={cfg.mesh_data} model={cfg.mesh_model}")

    # is_increment: warm-start from the saved best checkpoint (reference
    # config.py:10, run.py:835-840 — there it reloads model+optimizer from
    # the previous index; here params/state + AREAD masks, fresh optimizer)
    warm_start = None
    ckpt_path = os.path.join(cfg.save_path, cfg.dataset_name, f"{cfg.model}_best")
    if cfg.is_increment and os.path.exists(os.path.join(ckpt_path, "meta.json")):
        from aread_tpu.train.checkpoint import load_checkpoint
        warm_start = load_checkpoint(ckpt_path, n_domain=data.n_domain)
        print(f"warm-start from {ckpt_path} (epoch {warm_start.get('epoch')})")

    elastic_dir = (os.path.join(cfg.save_path, cfg.dataset_name,
                                f"{cfg.model}_elastic")
                   if cfg.elastic else None)
    if is_aread and "wo" not in cfg.model:
        model = build_model(cfg, data.spec, data.n_domain)
        trainer = AREADTrainer(model, cfg, data.n_domain, mesh=mesh)
        result = trainer.fit(data, warm_start=warm_start, ckpt_dir=elastic_dir)
    elif cfg.model == "mamdr":
        # Reptile meta-training (the reference defines MamdrRun but never
        # wires it to main.py — here it is reachable)
        from aread_tpu.train.mamdr import MamdrTrainer
        model = build_model(cfg, data.spec, data.n_domain)
        trainer = MamdrTrainer(model, cfg, data.n_domain, mesh=mesh)
        result = trainer.fit(data, warm_start=warm_start)
    else:
        from aread_tpu.train.trainer import MULTI_TOWER_MODELS
        d2g = cfg.domain2group()
        if d2g is not None:
            d2g = np.array(d2g)
        elif cfg.model in MULTI_TOWER_MODELS:
            # no precomputed grouping for this dataset (cloudtheme):
            # modulo grouping over the reference's 3 groups. Deviation: the
            # reference crashes here (run.py:43-45 KeyError) — multi-tower
            # models need SOME domain->group map to gather tower columns
            n_groups = min(cfg.n_tower, data.n_domain)
            d2g = np.arange(data.n_domain) % n_groups
            print(f"no precomputed domain2group for {cfg.dataset_name}: "
                  f"using modulo-{n_groups} grouping")
        model = build_model(cfg, data.spec, data.n_domain)
        trainer = Trainer(model, cfg, data.n_domain, domain2group=d2g, mesh=mesh)
        result = trainer.fit(data, warm_start=warm_start, ckpt_dir=elastic_dir)

    # persist the best model (reference run.py:459-484 saves per
    # improvement; one final save keeps the same restart capability)
    from aread_tpu.train.checkpoint import save_checkpoint
    ckpt_dir = os.path.join(cfg.save_path, cfg.dataset_name)
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt_path = os.path.join(ckpt_dir, f"{cfg.model}_best")
    save_checkpoint(ckpt_path, result["params"], result["state"],
                    opt_state={}, epoch=len(result["history"]),
                    best_result={k: v for k, v in result["test"].items()
                                 if not isinstance(v, dict)},
                    domain_mask=result.get("domain_mask"),
                    spec=data.spec, run_config=cfg, n_domain=data.n_domain)
    print(f"checkpoint saved: {ckpt_path}")

    print("test:", {k: v for k, v in result["test"].items()
                    if not isinstance(v, dict)})
    if "mean_auc" in result["test"]:
        print(f"test mean_auc: {result['test']['mean_auc']:.4f}")


if __name__ == "__main__":
    main()
