"""Scale self-consistency for the flagship (VERDICT r2 item 5): a 2M-row
planted-signal run the reference cannot follow (203 ex/s on this box ->
~5.5 h/epoch; ours trains it in seconds/epoch on one v5e chip).

Checks, on the SAME planted domain-dependent signal as parity_signal.py but
at 2M rows with 50k users / 100k items (~20 views per item):

  (a) mean_auc (the north-star weighted per-domain AUC, run.py:787-808)
      improves across epochs and early stopping (patience 2,
      run.py:459-484) engages before the epoch budget;
  (b) AREAD+HEMP final test mean_auc >= AREAD-wo_mask (the warm-up-only
      ablation, reference model 'aread_womask') — HEMP mask evolution must
      HELP, not just run, at a scale where evolutions fire at production
      cadence (~4 per epoch at regroup_interval 400, bs 1024).

Run:  python benchmarks/scale_signal.py [--rows 2000000] [--epoch 10]
          [--models aread,aread_womask] [--seeds 2000]
Writes benchmarks/scale_signal.json; numbers recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import parity_signal
from parity_auc import _literal, run_graceful

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WS = "/tmp/scale_signal_ws"
VOCAB_OVERRIDES = {"userid": 50000, "itemid": 100000}


def run_ours(model, seed, epoch, timeout, extra=()):
    argv = [sys.executable, os.path.join(REPO, "main.py"),
            "--model", model, "--dataset_name", "aliccp",
            "--seed", str(seed), "--epoch", str(epoch), *extra,
            "--bs", "1024", "--embed_dim", "8", "--lr", "1e-2",
            "--data_path", os.path.join(WS, "data"),
            "--save_path", os.path.join(WS, "save_tpu"),
            # HEMP at production cadence on 2M rows (~1.6k steps/epoch):
            # warm-up 32 steps, evolution every 400 steps, 5 candidates
            "--warm_up_interval", "32", "--regroup_interval", "400",
            "--candidate_mask_num", "5",
            "--regroup_update_step", "5", "--regroup_eval_step", "5"]
    t0 = time.time()
    # run_graceful: a timeout SIGTERMs the TPU child (HBM freed by the
    # device_cleanup handler) instead of subprocess.run's SIGKILL, which
    # blocks the next single-tenant claim for 15-20 min (CLAUDE.md)
    out = run_graceful(argv, timeout, cwd=REPO)
    wall = time.time() - t0
    if out.returncode != 0:
        print(f"[{model}/{seed} FAILED rc={out.returncode}]\n"
              f"{out.stderr[-3000:]}", file=sys.stderr)
        return None
    res = {"wall_s": round(wall, 1)}
    epochs = re.findall(
        r"epoch (\d+): train_loss=([\d.]+) valid auc=([\d.]+) "
        r"loss=([\d.]+) mean_auc=([\d.nan]+)", out.stdout)
    res["epochs_ran"] = len(epochs)
    res["valid_mean_auc_by_epoch"] = [
        None if "nan" in m else float(m) for *_, m in epochs]
    m = re.findall(r"^test: (\{.*\})", out.stdout, re.M)
    if m:
        res["test"] = {k: v for k, v in _literal(m[-1]).items()}
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--epoch", type=int, default=10)
    ap.add_argument("--models", default="aread,aread_womask")
    ap.add_argument("--seeds", default="2000")
    ap.add_argument("--timeout", type=int, default=5400)
    ap.add_argument("--extra", default="",
                    help="extra main.py args, e.g. "
                         "'--table_optimizer lazy_adam' or "
                         "'--table_moments_dtype bfloat16' (optimizer-"
                         "variant AUC-at-scale evidence, VERDICT r3 item 4b)")
    ap.add_argument("--tag", default="",
                    help="write to scale_signal_<tag>.json and label rows")
    args = ap.parse_args()
    extra = args.extra.split() if args.extra else []

    data_dir = os.path.join(WS, "data", "aliccp")
    csv = os.path.join(data_dir, parity_signal.CSV_NAME)
    if not os.path.exists(csv):
        print(f"generating {args.rows}-row planted-signal dataset "
              f"(vocab {VOCAB_OVERRIDES})...", file=sys.stderr, flush=True)
        parity_signal.generate(data_dir, args.rows,
                               vocab_overrides=VOCAB_OVERRIDES)

    results = []
    for model in args.models.split(","):
        for seed in [int(s) for s in args.seeds.split(",")]:
            res = run_ours(model, seed, args.epoch, args.timeout, extra)
            row = {"model": model, "seed": seed, "rows": args.rows,
                   **({"variant": args.tag} if args.tag else {}),
                   **(res or {"failed": True})}
            results.append(row)
            print(json.dumps(row), flush=True)

    name = (f"scale_signal_{args.tag}.json" if args.tag
            else "scale_signal.json")
    with open(os.path.join(REPO, "benchmarks", name), "w") as f:
        json.dump(results, f, indent=1)

    # self-consistency verdicts
    by_model = {}
    for r in results:
        if r.get("test"):
            by_model.setdefault(r["model"], []).append(r)
    for model, rows in by_model.items():
        for r in rows:
            aucs = [a for a in r["valid_mean_auc_by_epoch"] if a is not None]
            improved = len(aucs) >= 2 and max(aucs[1:]) > aucs[0]
            early = r["epochs_ran"] < args.epoch
            print(f"{model}/{r['seed']}: mean_auc {aucs[0]:.4f} -> "
                  f"{max(aucs):.4f} improved={improved} "
                  f"early_stop_engaged={early} "
                  f"test mean_auc={r['test'].get('mean_auc'):.4f} "
                  f"wall={r['wall_s']}s")
    if "aread" in by_model and "aread_womask" in by_model:
        a = max(r["test"]["mean_auc"] for r in by_model["aread"])
        w = max(r["test"]["mean_auc"] for r in by_model["aread_womask"])
        print(f"HEMP effect: aread mean_auc {a:.4f} vs wo_mask {w:.4f} "
              f"({'>=' if a >= w else '<'} — HEMP "
              f"{'helps' if a >= w else 'HURTS'})")


if __name__ == "__main__":
    main()
