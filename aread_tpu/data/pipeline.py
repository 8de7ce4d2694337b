"""File-level preprocessing driver: raw dumps -> the canonical training CSV.

The reference's ``DataPreprocessing.main`` (preprocess.py:476-673) is run
by its main.py on every invocation and SKIPS when the preprocessed CSV
already exists (preprocess.py:477-478). ``run_preprocessing`` reproduces
that contract on top of the pure pipelines in data/preprocess.py and
data/aliccp_raw.py, reading the same raw filenames:

  amazon      all_csv_files.csv (headerless: itemid,userid,rating,
              timestamp — preprocess.py:489-500) + All_Amazon_Meta.json
              (json-lines) -> prepare2train_filter_{N}month.csv
  aliccp      sample_skeleton_{train,test}.csv +
              common_features_{train,test}.csv (the raw \\x01\\x02\\x03
              format, dataset/aliccp/preprocess_ali_ccp.py) ->
              thresh{T}_ndomain{D}_mode{M}.csv
  cloudtheme  theme_click_log.csv -> kcore3_ndomain{D}_mode{M}_neg4.csv

Counterfactual augmentation (``*_aug{ratio}.csv``) is generated lazily by
main.py (data/augment.py). Also runnable standalone:

  python -m aread_tpu.data.pipeline --dataset_name amazon --data_path ...
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pandas as pd


def amazon_meta_frame(meta_path: str, keep_items=None) -> pd.DataFrame:
    """All_Amazon_Meta.json (json-lines, huge) -> the 5 columns the
    pipeline joins (preprocess.py:139-175), streaming line-by-line and
    keeping only asins present in the filtered ratings."""
    rows = []
    keep = set(keep_items) if keep_items is not None else None
    with open(meta_path) as f:
        for line in f:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            asin = d.get("asin")
            if not asin or (keep is not None and asin not in keep):
                continue
            rank = d.get("salesRank")
            if isinstance(rank, dict) and rank:
                chart, r = next(iter(rank.items()))
                rank_str = f"{r:,} in {chart}"
            else:
                rank_str = rank if isinstance(rank, str) else None
            rows.append({
                "itemid": asin,
                "price": d.get("price"),
                "salesRank": rank_str,
                "brand": d.get("brand"),
                "category": repr(d["category"]) if isinstance(
                    d.get("category"), list) else d.get("categories"),
            })
    return pd.DataFrame(rows, columns=["itemid", "price", "salesRank",
                                       "brand", "category"])


def preprocessed_csv_path(dataset_name: str, data_path: str,
                          prepare2train_month: int = 12,
                          thresh: int = 15, n_domain: int = 30,
                          sample_mode: str = "interval_random") -> str:
    base = os.path.join(data_path, dataset_name)
    if dataset_name == "amazon":
        return os.path.join(
            base, f"prepare2train_filter_{prepare2train_month}month.csv")
    if dataset_name == "aliccp":
        return os.path.join(
            base, f"thresh{thresh}_ndomain{n_domain}_mode{sample_mode}.csv")
    if dataset_name == "cloudtheme":
        return os.path.join(
            base, f"kcore3_ndomain{n_domain}_mode{sample_mode}_neg4.csv")
    raise ValueError(dataset_name)


def run_preprocessing(dataset_name: str, data_path: str,
                      out_path: Optional[str] = None,
                      prepare2train_month: int = 12, k_cores: int = 3,
                      thresh: int = 15, n_domain: int = 30,
                      sample_mode: str = "interval_random",
                      seed: int = 2022, verbose: bool = True) -> str:
    """Build the canonical CSV from raw dumps if it does not exist yet.
    Returns the CSV path (existing or newly written). Raises
    FileNotFoundError when neither the CSV nor the raw files are present
    (the bundled 3k-row samples satisfy the CSV case out of the box)."""
    from aread_tpu.data.preprocess import (preprocess_aliccp,
                                           preprocess_amazon,
                                           preprocess_cloudtheme)

    base = os.path.join(data_path, dataset_name)
    csv_path = out_path or preprocessed_csv_path(
        dataset_name, data_path, prepare2train_month, thresh, n_domain,
        sample_mode)
    if os.path.exists(csv_path):
        return csv_path  # preprocess.py:477-478 skip

    def log(msg):
        if verbose:
            print(f"[preprocess:{dataset_name}] {msg}")

    rng = np.random.default_rng(seed)
    if dataset_name == "amazon":
        ratings_path = os.path.join(base, "all_csv_files.csv")
        meta_path = os.path.join(base, "All_Amazon_Meta.json")
        if not (os.path.exists(ratings_path) and os.path.exists(meta_path)):
            raise FileNotFoundError(
                f"{csv_path} missing and raw dumps not found "
                f"({ratings_path}, {meta_path})")
        log("reading raw ratings (chunked)")
        chunks = pd.read_csv(ratings_path, header=None, chunksize=5_000_000,
                             names=["itemid", "userid", "rating", "timestamp"],
                             engine="c", on_bad_lines="skip")
        ratings = pd.concat(chunks, ignore_index=True)
        log(f"{len(ratings)} raw ratings; streaming metadata join")
        meta = amazon_meta_frame(meta_path,
                                 keep_items=ratings["itemid"].unique())
        df = preprocess_amazon(ratings, meta, k_cores=k_cores,
                               prepare2train_month=prepare2train_month)
    elif dataset_name == "aliccp":
        raw = {name: os.path.join(base, f"{name}.csv")
               for name in ("sample_skeleton_train", "common_features_train",
                            "sample_skeleton_test", "common_features_test")}
        if not all(os.path.exists(p) for p in raw.values()):
            raise FileNotFoundError(
                f"{csv_path} missing and raw dumps not found ({raw})")
        from aread_tpu.data.aliccp_raw import preprocess_raw_aliccp

        log("parsing raw skeleton/common features")
        with open(raw["sample_skeleton_train"]) as st, \
                open(raw["common_features_train"]) as ct, \
                open(raw["sample_skeleton_test"]) as se, \
                open(raw["common_features_test"]) as ce:
            train_df, val_df, test_df = preprocess_raw_aliccp(st, ct, se, ce,
                                                              seed=seed)
        log("discretize + domain sampling")
        df = preprocess_aliccp(train_df, val_df, test_df, thresh=thresh,
                               n_domain=n_domain, sample_mode=sample_mode,
                               rng=rng)
    elif dataset_name == "cloudtheme":
        raw_path = os.path.join(base, "theme_click_log.csv")
        if not os.path.exists(raw_path):
            raise FileNotFoundError(
                f"{csv_path} missing and raw dump not found ({raw_path})")
        log("reading click log")
        raw_df = pd.read_csv(raw_path, engine="c", on_bad_lines="skip")
        df = preprocess_cloudtheme(raw_df, k_cores=k_cores,
                                   n_domain=n_domain,
                                   sample_mode=sample_mode, rng=rng)
    else:
        raise ValueError(dataset_name)

    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    df.to_csv(csv_path, index=False)
    log(f"wrote {csv_path} ({len(df)} rows)")
    return csv_path


def _main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_name", required=True,
                   choices=["amazon", "aliccp", "cloudtheme"])
    p.add_argument("--data_path", required=True)
    p.add_argument("--out_path", default=None)
    p.add_argument("--prepare2train_month", type=int, default=12)
    p.add_argument("--k_cores", type=int, default=3)
    p.add_argument("--thresh", type=int, default=15)
    p.add_argument("--n_domain", type=int, default=30)
    p.add_argument("--sample_mode", default="interval_random")
    p.add_argument("--seed", type=int, default=2022)
    a = p.parse_args()
    path = run_preprocessing(a.dataset_name, a.data_path, a.out_path,
                             a.prepare2train_month, a.k_cores, a.thresh,
                             a.n_domain, a.sample_mode, a.seed)
    print(path)


if __name__ == "__main__":
    _main()
