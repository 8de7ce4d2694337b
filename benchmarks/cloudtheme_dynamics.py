"""Cloud-Theme end-to-end TRAINING-DYNAMICS run (VERDICT r4 item 9).

Cloud-Theme is the one dataset whose training path had never seen a
gradient here: the pipeline (preprocess_cloudtheme — encode, k-core +
domain sampling, time-ordered 80/10/10, leakage-avoiding 4:1 popularity
negatives; reference preprocess.py:600-669) was tested, but no model had
trained through it. The REFERENCE cannot run this at all: its Run
crashes on cloudtheme at run.py:43-45 (KeyError — no domain2group entry)
before reaching a train step, so the row is ours-vs-learnability, not
ours-vs-reference.

Plants a user-type x item-type affinity signal in a synthetic raw click
log (theme_click_log.csv), pushes it through the real
run_preprocessing('cloudtheme') path, and trains deepfm + mmoe (the
modulo-grouping fallback the reference lacks) end to end, recording the
per-epoch valid AUC. Learnability bar: the synthesized negatives are
(random user, popularity-drawn item) pairs, so the planted match
predicts click and valid AUC must climb well above 0.5.

Runs on CPU by default (tiny model; keeps the single-tenant TPU free).
Writes benchmarks/cloudtheme_dynamics.json; row recorded in PARITY.md.

Run: python benchmarks/cloudtheme_dynamics.py [--events 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WS = "/tmp/cloudtheme_dynamics_ws"


def gen_raw_log(path: str, n_events: int, seed: int = 11) -> None:
    """Synthetic click log in the raw Cloud-Theme schema (user_id,
    item_id, theme_id, leaf_cate_id, cate_level1_id, reach_time,
    clk_cnt) with a planted user-type x item-type affinity."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    n_users, n_items, n_themes = 3000, 4000, 60
    item_theme = rng.integers(0, n_themes, n_items)
    item_leaf = rng.integers(0, 50, n_items)
    item_l1 = item_leaf % 12
    utype = rng.integers(0, 4, n_users)
    itype = rng.integers(0, 4, n_items)

    # Zipf-skewed user activity: positives over-represent active users
    # while the pipeline's synthesized negatives draw users UNIFORMLY
    # (preprocess.py:624-644 semantics) — a main-effect signal any
    # embedding model recovers quickly. (A pure type-match interaction
    # alone measured unlearnable within the epoch budget: LR on one-hot
    # user+item gets AUC 0.504 by construction, and FM needs many more
    # epochs to factor it.)
    wu = 1.0 / (np.arange(1, n_users + 1) ** 0.7)
    users = rng.choice(n_users, size=n_events, p=wu / wu.sum())
    # plus 75% of events pick an item whose type matches the user's type
    # — a second-order signal for the FM/tower interactions
    match = rng.random(n_events) < 0.75
    items = rng.integers(0, n_items, n_events)
    for t in range(4):
        pool = np.flatnonzero(itype == t)
        sel = match & (utype[users] == t)
        items[sel] = rng.choice(pool, size=int(sel.sum()))
    df = pd.DataFrame({
        "user_id": users,
        "item_id": items,
        "theme_id": item_theme[items],
        "leaf_cate_id": item_leaf[items],
        "cate_level1_id": item_l1[items],
        "reach_time": rng.integers(1_600_000_000, 1_610_000_000, n_events),
        "clk_cnt": rng.integers(1, 6, n_events),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df.to_csv(path, index=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--models", default="deepfm,mmoe")
    ap.add_argument("--grad_clip", type=float, default=10.0,
                    help="global-norm clip for the GATED models only "
                         "(mmoe at lr 1e-2 NaN-blows on this data at "
                         "epoch ~4 without it — the same recipe-"
                         "survivorship mode PARITY.md documents; deepfm "
                         "runs unclipped)")
    ap.add_argument("--platform", default="cpu",
                    help="'' to keep the default (TPU) backend")
    ap.add_argument("--fresh", action="store_true",
                    help="regenerate the workspace")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from aread_tpu.config import Config
    from aread_tpu.data.loader import load_split_data
    from aread_tpu.data.pipeline import run_preprocessing
    from aread_tpu.models import build_model
    from aread_tpu.train.trainer import MULTI_TOWER_MODELS, Trainer

    if args.fresh and os.path.exists(WS):
        shutil.rmtree(WS)
    raw = os.path.join(WS, "cloudtheme", "theme_click_log.csv")
    if not os.path.exists(raw):
        print(f"generating {args.events:,}-event raw click log...",
              flush=True)
        gen_raw_log(raw, args.events)
    csv = run_preprocessing("cloudtheme", WS, seed=2022)

    results = []
    for name in args.models.split(","):
        clip = 0.0 if name in ("deepfm", "dcn", "dcnv2") else args.grad_clip
        cfg = Config(model=name, dataset_name="cloudtheme", bs=1024,
                     embed_dim=8, epoch=args.epochs, lr=1e-2, dropout=0.2,
                     is_evaluate_multi_domain=True, seed=2000,
                     grad_clip_norm=clip)
        data = load_split_data(csv, "cloudtheme", cfg.seq_maxlen)
        d2g = cfg.domain2group()
        if d2g is None and name in MULTI_TOWER_MODELS:
            # the exact fallback main.py applies — the spot where the
            # reference crashes (run.py:43-45 KeyError)
            d2g = np.arange(data.n_domain) % min(cfg.n_tower, data.n_domain)
        model = build_model(cfg, data.spec, data.n_domain)
        trainer = Trainer(model, cfg, data.n_domain, domain2group=d2g)
        try:
            res = trainer.fit(data, rng=jax.random.PRNGKey(cfg.seed),
                              verbose=True)
        except FloatingPointError as e:
            results.append({"model": name, "failed": str(e),
                            "grad_clip_norm": clip})
            print(f"[{name} FAILED] {e}", flush=True)
            continue
        row = {"model": name, "rows": len(data.train_x),
               "n_domain": data.n_domain,
               "valid_auc_by_epoch": [round(h["total_auc"], 4)
                                      for h in res["history"]],
               "valid_mean_auc_by_epoch": [
                   None if np.isnan(h.get("mean_auc", np.nan))
                   else round(h["mean_auc"], 4) for h in res["history"]],
               "test_auc": round(res["test"]["total_auc"], 4),
               "test_mean_auc": (None if np.isnan(res["test"].get(
                   "mean_auc", np.nan))
                   else round(res["test"]["mean_auc"], 4))}
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(REPO, "benchmarks", "cloudtheme_dynamics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
