"""Summarize benchmarks/parity_signal.json per (model, side).

Prints mean±sd over ALL seeds, the collapse count (best valid AUC < 0.55 —
the planted signal's chance band; real learners reach >=0.65, see
parity_signal.py), and successful-mode mean±sd (collapsed seeds excluded),
for the reference and TPU sides. This is the table recorded in PARITY.md /
BASELINE.md.

Run: python benchmarks/summarize_parity.py [--json benchmarks/parity_signal.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics

COLLAPSE = 0.55

MODEL_ORDER = ["deepfm", "dcn", "dcnv2", "autoint", "mmoe", "ple", "pepnet",
               "star", "adl", "hinet", "adasparse", "aread"]


def _stats(vals):
    vals = [v for v in vals if v is not None]
    if not vals:
        return None
    ok = [v for v in vals if v >= COLLAPSE]
    mu = statistics.mean(vals)
    sd = statistics.stdev(vals) if len(vals) > 1 else 0.0
    row = {"n": len(vals), "mean": mu, "sd": sd,
           "collapsed": len(vals) - len(ok)}
    if ok:
        row["ok_mean"] = statistics.mean(ok)
        row["ok_sd"] = statistics.stdev(ok) if len(ok) > 1 else 0.0
    return row


def fmt(side):
    if side is None:
        return "--"
    s = f"{side['mean']:.4f}±{side['sd']:.4f} (n={side['n']}"
    if side["collapsed"]:
        if side.get("ok_mean") is not None:
            s += (f", {side['collapsed']} collapsed; successful-mode "
                  f"{side['ok_mean']:.4f}±{side['ok_sd']:.4f}")
        else:
            s += f", all {side['collapsed']} collapsed"
    s += ")"
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "parity_signal.json"))
    args = ap.parse_args()
    rows = json.load(open(args.json))
    models = sorted({r["model"] for r in rows},
                    key=lambda m: (MODEL_ORDER.index(m)
                                   if m in MODEL_ORDER else 99, m))
    print(f"{'model':10s} {'ref best-valid AUC':42s} {'tpu best-valid AUC':42s}")
    for m in models:
        mr = [r for r in rows if r["model"] == m]
        ref = _stats([r.get("ref_auc") for r in mr])
        tpu = _stats([r.get("tpu_auc") for r in mr])
        print(f"{m:10s} {fmt(ref):42s} {fmt(tpu):42s}")
    # headline denominators (ADVICE r3: recompute from the JSON, don't
    # hand-count): total runs and collapse counts per side over ALL rows
    refs = [r["ref_auc"] for r in rows if r.get("ref_auc") is not None]
    tpus = [r["tpu_auc"] for r in rows if r.get("tpu_auc") is not None]
    # build each side's fragment independently: a --skip_ours (ref-only)
    # matrix must still print the ref totals (ADVICE r4)
    parts = []
    if refs:
        parts.append(f"ref {len(refs)} runs, "
                     f"{sum(v < COLLAPSE for v in refs)} collapsed")
    else:
        parts.append("no ref runs")
    if tpus:
        parts.append(f"tpu {len(tpus)} runs, "
                     f"{sum(v < COLLAPSE for v in tpus)} collapsed "
                     f"(min tpu {min(tpus):.4f})")
    else:
        parts.append("no tpu runs")
    print("\ntotals: " + " | ".join(parts))


if __name__ == "__main__":
    main()
