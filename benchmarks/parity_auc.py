"""End-to-end AUC parity: PyTorch reference vs aread_tpu on the bundled
3k-row sample CSVs (reference README.md:60 ships them 'to facilitate
initial setup and verification').

Both frameworks run their FULL pipeline (load -> split -> train with early
stopping -> reload best -> test) with identical hyperparameters on the
same CSVs; per BASELINE.md the success criterion is test AUC parity within
run-to-run variance (seeds differ stream-for-stream by construction — JAX
and torch RNGs are incomparable), not bitwise parity.

The reference is imported READ-ONLY: the sample CSVs are staged into a
/tmp workspace first because the reference writes tensor caches next to
its input CSV (run.py:262-263) and /root/reference must stay untouched;
its missing `wandb` dependency (imported at run.py:14, but wandb.init is
never called so nothing ever recorded) is satisfied with a no-op stub.

Run:  python benchmarks/parity_auc.py [--models deepfm,mmoe,aread]
          [--datasets aliccp,amazon] [--seeds 2000,2001,2002] [--epoch 10]
Prints a table and writes benchmarks/parity_auc.json.
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
WS = "/tmp/ref_parity_ws"

SAMPLES = {
    "amazon": ["prepare2train_filter_12month.csv",
               "prepare2train_filter_12month_aug0.1.csv"],
    "aliccp": ["thresh15_ndomain30_modeinterval_random.csv",
               "thresh15_ndomain30_modeinterval_random_aug0.1.csv"],
}

WANDB_STUB = '''\
"""No-op wandb stub: the reference imports wandb (run.py:14) and calls
wandb.log, but never wandb.init — with the real library that records
nothing; this stub keeps identical (non-)behavior without the dep."""
def init(*a, **k): pass
def log(*a, **k): pass
'''

REF_DRIVER = '''\
import os, sys
sys.path.insert(0, {ws!r})          # wandb stub
sys.path.insert(0, {ref!r})         # reference code, read-only
os.chdir({ws!r})                    # save/ + caches land here
sys.argv = ["main.py"] + {argv!r}
import random
import numpy as np
import pandas as pd
import torch
import config
config.data_path = os.path.join({ws!r}, "data")  # not a CLI flag (config.py)
# reference bug: MMoE/PLE append the raw [B, embed_output_dim] CrossNetwork
# output to other_outs (mmoe.py:64-66) and tower_forward broadcasts it into
# [B,1] logits (layer.py:53-54) -> RuntimeError; HiNet/ADL/AdaSparse add the
# same raw cn_out straight into their [B,1] logits (hinet.py:90-92,
# adl.py:92-94, adasparse.py:112-114) -> same crash. use_dcn=False is the
# only runnable configuration for all of them (our side runs with
# --use_dcn 0 too). STAR hardcodes use_dcn=False (star.py:28); AREAD
# concatenates cn_out properly (aread.py:175) so it keeps the default.
if {model!r} in ("mmoe", "ple", "pepnet", "epnet", "epnet-single",
                 "hinet", "adl", "adasparse"):
    config.use_dcn = False
from main import load_config
from preprocess import DataPreprocessing
from run import Run


class RepairedRun(Run):
    """Minimal environment/bug shims so the reference can run at all; the
    model code itself is untouched.

    1. run.py:155 does `one_hot_feature_dims[itemid_idx] = itemid_all` on a
       string-indexed pandas Series; with this image's pandas an int key
       *appends* a new entry instead of setting positionally, so the
       embedding gets 8 amazon field dims / 18 offsets vs 17 data columns
       -> RuntimeError in layer.py:165. Repair restores the intent.
    2. One-hot dims are inferred from the original CSV only (run.py:154),
       but HEMP fast-adapt steps feed the *_aug CSV (run.py:634-648) whose
       downsampled sample rows contain unseen ids -> embedding IndexError.
       Repair sizes each field over the aug CSV as well.
    3. The bundled amazon aug sample is a row subset: some domains end up
       with ZERO augmented train rows, and the per-domain DataLoader
       construction (run.py:310-353) raises num_samples=0. Repair backfills
       an empty domain's aug split with its original train rows (i.e. 'no
       augmentation for this domain').

    NOT repaired — amazon/aread reference rows stay empty: the amazon
    sample's 5% valid slice leaves several of the 25 domains with zero
    rows, and AREAD's per-domain evaluation both crashes on the empty
    DataLoader (run.py:335) and, if empty domains were filtered out,
    misindexes: batch sequences carry original domain ids (run.py:337-341)
    into a loader list compacted by the filter (run.py:330-335). Making it
    run would require changing its evaluation semantics. The aread_tpu
    side runs fine (fixed-shape padded batches handle empty domains).
    """

    def __init__(self, config):
        super().__init__(config)
        # Repair 5 — the is_concat_group signature bug (run.py:72,495):
        # star/adl are routed as model(X, group, targets=y) but
        # STAR.forward(self, x) (star.py:60) and ADL.forward(self, x)
        # (adl.py:79) accept neither -> TypeError as shipped. STAR computes
        # ALL towers ([B, n_tower], star.py:74-101) so the is_multi_tower
        # gather branch (run.py:497-500) is its intended dispatch; ADL
        # routes samples internally by DLM cluster (adl.py:79-117) and
        # returns [B, 1], so the plain single-output branch is correct.
        # HiNet's forward matches the concat_group call and stays as-is.
        if self.model == "star":
            self.is_concat_group = False
        elif self.model == "adl":
            self.is_concat_group = False
            self.is_multi_tower = False

    def test(self, data_loader, model, mode='test'):
        """Repair 4: any domain whose eval split size is == 1 (mod bs)
        yields a batch of one row; the reference's .squeeze() turns its
        prediction into a 0-dim array and np.concatenate(targets) at
        run.py:743 raises. atleast_1d restores the intended shapes."""
        orig = np.concatenate

        def cat(arrs, *a, **k):
            return orig([np.atleast_1d(x) for x in arrs], *a, **k)

        np.concatenate = cat
        try:
            return super().test(data_loader, model, mode)
        finally:
            np.concatenate = orig

    def read_split_data(self, path, aug_path, history=True, only_id=False):
        cols, (tr, va, te, aug) = super().read_split_data(
            path, aug_path, history=history, only_id=only_id)
        if self.is_aug_data and tr is not None and aug is not None \
                and len(aug):
            missing = set(tr["domain"].unique()) - set(aug["domain"].unique())
            if missing:
                aug = pd.concat(
                    [aug] + [tr[tr["domain"] == d] for d in sorted(missing)],
                    ignore_index=True)
        return cols, (tr, va, te, aug)

    def get_model(self):
        d = self.one_hot_feature_dims
        if hasattr(d, "index") and 0 in getattr(d, "index", []):
            itemid_all = d.pop(0)
            d.iloc[self.itemid_idx] = itemid_all
            self.one_hot_feature_dims = d
        if getattr(self, "is_aug_data", False):
            aug = pd.read_csv(self.config.preprocess_aug_path,
                              usecols=list(d.index))
            self.one_hot_feature_dims = np.maximum(
                d, aug[list(d.index)].max(axis=0) + 1)
        return super().get_model()


args = load_config()
datapre = DataPreprocessing(args.data_path, dataset_name=args.dataset_name,
                            domains=[],
                            prepare2train_month=args.prepare2train_month,
                            is_aug=("aread" in args.model),
                            aug_ratio=args.aug_ratio)
datapre.main()
datapre.update_config(args)
if args.model == "mamdr":
    # MAMDR is unreachable as shipped: main.py never constructs MamdrRun
    # and MamdrRun reads config.mamdr_meta_lr / mamdr_aux_sample_num
    # defined nowhere (run.py:984,991; SURVEY 2.1). Environment shim only
    # (same values as our Config defaults): the Reptile training dynamics
    # (run.py:911-1088) themselves run untouched.
    from run import MamdrRun

    args.mamdr_meta_lr = 0.1
    args.mamdr_aux_sample_num = 2

    class RepairedMamdrRun(MamdrRun, RepairedRun):
        """MamdrRun with RepairedRun's environment shims (pandas dims
        repair, aug vocab sizing). MamdrRun.test wins the MRO over
        RepairedRun.test, so repair 4 (atleast_1d around np.concatenate
        for size-1 per-domain eval batches) is re-applied here."""

        def test(self, seq, model, mode='valid'):
            orig = np.concatenate

            def cat(arrs, *a, **k):
                return orig([np.atleast_1d(x) for x in arrs], *a, **k)

            np.concatenate = cat
            try:
                return MamdrRun.test(self, seq, model, mode)
            finally:
                np.concatenate = orig

    RepairedMamdrRun(args).main()
else:
    RepairedRun(args).main()
'''


def stage_workspace():
    os.makedirs(WS, exist_ok=True)
    with open(os.path.join(WS, "wandb.py"), "w") as f:
        f.write(WANDB_STUB)
    for ds, files in SAMPLES.items():
        d = os.path.join(WS, "data", ds)
        os.makedirs(d, exist_ok=True)
        for fn in files:
            src = os.path.join(REF, "dataset", ds, fn)
            dst = os.path.join(d, fn)
            if os.path.exists(src) and not os.path.exists(dst):
                shutil.copy(src, dst)


def common_argv(model, ds, seed, epoch, fast_aread):
    argv = ["--model", model, "--dataset_name", ds, "--seed", str(seed),
            "--epoch", str(epoch), "--bs", "256", "--embed_dim", "16",
            "--lr", "1e-3"]
    if model == "aread" and fast_aread:
        # sample-scale HEMP knobs: the defaults are sized for 17.9M rows
        argv += ["--warm_up_interval", "1", "--regroup_interval", "4",
                 "--candidate_mask_num", "3", "--regroup_update_step", "2",
                 "--regroup_eval_step", "2"]
    return argv


def run_reference(model, ds, seed, epoch, timeout):
    argv = common_argv(model, ds, seed, epoch, True)
    # as shipped, domain_filter=None makes read_split_data return
    # (None, None, None, None) expecting .pth tensor caches that a fresh
    # checkout doesn't have (run.py:170-173) -> crash; an all-domains
    # filter is a no-op that takes the data-bearing path
    if "--domain_filter" not in argv:
        n_dom = {"amazon": 25, "aliccp": 30}[ds]
        argv += ["--domain_filter",
                 "[" + ",".join(map(str, range(n_dom))) + "]"]
    driver = REF_DRIVER.format(ws=WS, ref=REF, argv=argv, model=model)
    path = os.path.join(WS, "driver.py")
    with open(path, "w") as f:
        f.write(driver)
    # fresh checkpoints per run: the reference picks save indices randomly
    # (run.py:92) and resumes the 'best' by scanning the folder
    shutil.rmtree(os.path.join(WS, "save"), ignore_errors=True)
    out = run_graceful([sys.executable, path], timeout)
    return parse_ref(out.stdout), out


def run_graceful(cmd, timeout, **kw):
    """subprocess.run(capture_output=True, text=True) that SIGTERMs on
    timeout instead of SIGKILL.

    subprocess.run's own timeout path SIGKILLs the child — which, for a
    TPU child, leaks its resident HBM and blocks the single-tenant chip's
    next claim for 15-20 min (measured 2026-08-21; CLAUDE.md). SIGTERM
    lets device_cleanup's handler free device arrays first; a 60 s grace
    precedes the final kill. Raises TimeoutExpired like subprocess.run so
    callers are unchanged."""
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True, **kw)
    try:
        stdout, stderr = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.terminate()
        try:
            stdout, stderr = proc.communicate(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
            stdout, stderr = proc.communicate()
        raise subprocess.TimeoutExpired(cmd, timeout, output=stdout,
                                        stderr=stderr)
    return subprocess.CompletedProcess(cmd, proc.returncode, stdout, stderr)


def _literal(s):
    # tolerate nan/inf in printed dicts/lists
    return ast.literal_eval(re.sub(r"\bnan\b|\binf\b", "None", s))


def parse_ref(stdout):
    """Best validation AUC/loss across epochs, plus test metrics when the
    run reaches them. On the 3k-row samples mean_auc is NaN (single-class
    domains) and the reference's `NaN > best` check (run.py:461) never
    saves a checkpoint, so its final best-model reload crashes — the
    per-epoch `validation: auc:` prints are the comparable signal."""
    vals = re.findall(r"^validation: auc: ([\d.]+), loss: ([\d.]+)",
                      stdout, re.M)
    out = {}
    if vals:
        best = max(float(a) for a, _ in vals)
        out["val_auc"] = best
        out["val_loss"] = min(float(l) for _, l in vals)
    m = re.findall(r"^test: \s*(\[.*\])", stdout, re.M)
    if m:
        out.update(dict(_literal(m[-1])))
    return out or None


OURS_EXTRA: list = []  # extra main.py args for the aread_tpu side only
# (the reference argparse rejects unknown flags, so these cannot ride
# common_argv; parity_signal --ours_extra sets this)


def run_ours(model, ds, seed, epoch, timeout):
    argv = common_argv(model, ds, seed, epoch, True) + \
        ["--data_path", os.path.join(WS, "data"),
         "--save_path", os.path.join(WS, "save_tpu")] + list(OURS_EXTRA)
    if model in ("mmoe", "ple", "pepnet", "epnet", "epnet-single",
                 "hinet", "adl", "adasparse"):
        argv += ["--use_dcn", "0"]  # match the reference's only runnable cfg
    env = dict(os.environ, AREAD_TPU_CACHE="0")
    out = run_graceful([sys.executable, os.path.join(REPO, "main.py")]
                       + argv, timeout, cwd=REPO, env=env)
    res = {}
    vals = re.findall(r"valid auc=([\d.]+) loss=([\d.]+)", out.stdout)
    if vals:
        res["val_auc"] = max(float(a) for a, _ in vals)
        res["val_loss"] = min(float(l) for _, l in vals)
    m = re.findall(r"^test: (\{.*\})", out.stdout, re.M)
    if m:
        res.update(_literal(m[-1]))
    return res or None, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="deepfm,mmoe,aread")
    ap.add_argument("--datasets", default="aliccp,amazon")
    ap.add_argument("--seeds", default="2000,2001,2002")
    ap.add_argument("--epoch", type=int, default=10)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--skip_reference", action="store_true")
    args = ap.parse_args()

    stage_workspace()
    results = []
    for ds in args.datasets.split(","):
        for model in args.models.split(","):
            for seed in [int(s) for s in args.seeds.split(",")]:
                row = {"dataset": ds, "model": model, "seed": seed}
                if not args.skip_reference:
                    try:
                        ref, rout = run_reference(model, ds, seed,
                                                  args.epoch, args.timeout)
                    except subprocess.TimeoutExpired:
                        ref, rout = None, None
                    if ref is None:
                        tail = rout.stderr[-2000:] if rout else "timeout"
                        print(f"[ref FAILED] {ds}/{model}/{seed}: {tail}",
                              file=sys.stderr)
                    row["ref_auc"] = ref and ref.get("val_auc")
                    row["ref_logloss"] = ref and ref.get("val_loss")
                    row["ref_test_auc"] = ref and ref.get("total_auc")
                try:
                    ours, oout = run_ours(model, ds, seed, args.epoch,
                                          args.timeout)
                except subprocess.TimeoutExpired:
                    ours, oout = None, None
                if ours is None:
                    tail = oout.stderr[-2000:] if oout else "timeout"
                    print(f"[ours FAILED] {ds}/{model}/{seed}: {tail}",
                          file=sys.stderr)
                row["tpu_auc"] = ours and ours.get("val_auc")
                row["tpu_logloss"] = ours and ours.get("val_loss")
                row["tpu_test_auc"] = ours and ours.get("total_auc")
                results.append(row)
                print(json.dumps(row), flush=True)

    with open(os.path.join(REPO, "benchmarks", "parity_auc.json"), "w") as f:
        json.dump(results, f, indent=1)

    # summary: mean +/- std per (dataset, model)
    import collections
    import statistics
    groups = collections.defaultdict(list)
    for r in results:
        groups[(r["dataset"], r["model"])].append(r)
    print(f"\n{'dataset':8s} {'model':8s} {'ref AUC':>16s} {'tpu AUC':>16s}")
    for (ds, model), rows in groups.items():
        def ms(key):
            vals = [r[key] for r in rows if r.get(key) is not None]
            if not vals:
                return "--"
            mu = statistics.mean(vals)
            sd = statistics.stdev(vals) if len(vals) > 1 else 0.0
            return f"{mu:.4f}±{sd:.4f}"
        print(f"{ds:8s} {model:8s} {ms('ref_auc'):>16s} {ms('tpu_auc'):>16s}")


if __name__ == "__main__":
    main()
