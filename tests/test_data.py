"""Data layer tests: batching invariants, preprocessing pipelines, and the
counterfactual augmenter. Pure numpy/pandas — no device work."""

import numpy as np
import pandas as pd
import pytest

from aread_tpu.data.augment import make_augmentation
from aread_tpu.data.loader import (DomainBatcher, GlobalBatcher, pad_batch)
from aread_tpu.data.preprocess import (filter_by_threshold, label_encode,
                                       preprocess_cloudtheme, process_price,
                                       process_rank, sample_domains,
                                       uniform_discretize)


def test_pad_batch_masks_tail():
    x = np.arange(12).reshape(3, 4).astype(np.int32)
    y = np.array([1, 0, 1], np.int8)
    b = pad_batch(x, y, 5)
    assert b["x"].shape == (5, 4) and b["y"].shape == (5,)
    np.testing.assert_array_equal(b["valid"], [1, 1, 1, 0, 0])


def test_global_batcher_covers_all_rows():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 5, size=(103, 3)).astype(np.int32)
    y = rng.integers(0, 2, size=103).astype(np.int8)
    b = GlobalBatcher(x, y, 32, domain_idx=1, shuffle=True, seed=1)
    seen = 0
    for batch in b:
        seen += int(batch["valid"].sum())
        assert batch["x"].shape == (32, 3)
    assert seen == 103


def test_domain_batcher_seq_counts():
    """domain_batch_seq has ceil(n_d/bs) entries per domain
    (reference run.py:337)."""
    rng = np.random.default_rng(0)
    x = np.zeros((100, 2), np.int32)
    x[:, 1] = np.concatenate([np.zeros(70), np.ones(30)])
    y = rng.integers(0, 2, 100).astype(np.int8)
    b = DomainBatcher(x, y, 32, domain_idx=1, n_domain=2, seed=0)
    seq = np.asarray(b.domain_batch_seq)
    assert (seq == 0).sum() == int(np.ceil(70 / 32))
    assert (seq == 1).sum() == int(np.ceil(30 / 32))
    # single-domain batches
    batch = b.next_batch(1)
    assert (batch["x"][batch["valid"] > 0, 1] == 1).all()


def test_domain_batcher_cycles():
    x = np.zeros((10, 2), np.int32)
    y = np.zeros(10, np.int8)
    b = DomainBatcher(x, y, 8, domain_idx=1, n_domain=1, seed=0)
    for _ in range(5):  # more pulls than batches -> must restart cleanly
        batch = b.next_batch(0)
        assert batch["x"].shape == (8, 2)


def test_label_encode_matches_sklearn_semantics():
    s = pd.Series(["b", "a", "c", "a"])
    enc, mapping = label_encode(s)
    assert mapping == {"a": 0, "b": 1, "c": 2}
    np.testing.assert_array_equal(enc.to_numpy(), [1, 0, 2, 0])


def test_price_and_rank_parsers():
    assert process_price("$12.50") == 13.0
    assert process_price("$10 - $20") == 15.0
    assert process_price(None) is None
    assert process_rank("1,234 in Books (See Top 100)") == (1234, "Books")
    assert process_rank(None) == (None, None)


def test_uniform_discretize_train_only_fit():
    train = np.array([0.0, 10.0])
    tf = uniform_discretize(train, n_bins=10)
    np.testing.assert_array_equal(tf(np.array([0.0, 5.0, 9.99, 100.0])),
                                  [0, 5, 9, 9])


def test_sample_domains_interval_random():
    counts = pd.Series(np.arange(100, 0, -1),
                       index=[f"d{i}" for i in range(100)])
    sel = sample_domains(counts, 30, "interval_random")
    assert len(sel) == 30
    assert len(set(sel)) == 30


def test_filter_by_threshold_reencodes():
    rng = np.random.default_rng(0)
    n = 2000
    df = pd.DataFrame({
        "userid": rng.integers(0, 40, n) * 7,  # sparse ids
        "itemid": rng.integers(0, 40, n) * 3,
        "domain": rng.integers(0, 6, n),
    })
    out, mapping, inverse = filter_by_threshold(df, thresh=2, n_domain=4,
                                                sample_mode="nlargest")
    assert out["domain"].nunique() <= 4
    assert out["domain"].max() < 4  # contiguous re-encoded
    assert out["userid"].max() < out["userid"].nunique()  # re-encoded dense


def test_augmentation_moves_cold_items_to_small_domains():
    rng = np.random.default_rng(0)
    # cold items: 10 items x 100 exposures with 2 positives each
    # -> popularity = 3/102 < 0.05, and positive rows exist for the pool
    cold_items = np.repeat(np.arange(10), 100)
    cold_click = np.tile([1, 1] + [0] * 98, 10)
    warm_n = 4000
    df = pd.DataFrame({
        "itemid": np.concatenate([cold_items, rng.integers(100, 300, warm_n)]),
        "click": np.concatenate([cold_click, rng.integers(0, 2, warm_n)]),
    })
    n = len(df)
    # domains 2/3 must stay under the 1.5% small-domain threshold
    df["domain"] = rng.choice([0, 1, 2, 3], n, p=[0.60, 0.388, 0.007, 0.005])
    out = make_augmentation(df, "aliccp", aug_ratio=0.1)
    added = out[out["is_augmented"]]
    assert len(added) == int(n * 0.1)
    # augmented rows land only in small domains
    assert set(added["domain"].unique()) <= {2, 3}
    # originals unchanged
    assert len(out) == n + len(added)


def test_cloudtheme_negative_sampling_ratio():
    rng = np.random.default_rng(0)
    n = 1200
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n),
        "item_id": rng.integers(0, 30, n),
        "theme_id": rng.integers(0, 5, n),
        "leaf_cate_id": rng.integers(0, 10, n),
        "cate_level1_id": rng.integers(0, 4, n),
        "reach_time": np.arange(n),
        "clk_cnt": rng.integers(1, 5, n),
    })
    out = preprocess_cloudtheme(df, k_cores=2, n_domain=4,
                                sample_mode="nlargest",
                                negative_sampling_ratio=2)
    pos = out[out["click"] == 1]
    neg = out[out["click"] == 0]
    assert len(neg) > 0
    assert (neg["clk_cnt"] == 0).all()
    # negatives never duplicate a positive (user, item) pair
    pos_pairs = set(map(tuple, pos[["userid", "itemid"]].to_numpy()))
    neg_pairs = set(map(tuple, neg[["userid", "itemid"]].to_numpy()))
    assert not (pos_pairs & neg_pairs)


def test_read_arrays_cache_roundtrip(tmp_path, monkeypatch):
    """The parsed-tensor cache (reference caches to *_data_loader.pth,
    run.py:260-263) returns identical arrays on a warm read and
    invalidates when the file changes."""
    import time as _time

    from aread_tpu.data.loader import _read_arrays

    csv = tmp_path / "mini.csv"
    csv.write_text(
        "itemid,domain,click,train_tag\n"
        "0,0,1,0\n1,1,0,1\n2,0,1,2\n3,1,0,0\n")
    monkeypatch.setenv("AREAD_TPU_CACHE", str(tmp_path / "cache"))
    args = (str(csv), ["itemid", "domain"], [], "click", "train_tag", 5, -1)

    x1, y1, s1 = _read_arrays(*args)
    x2, y2, s2 = _read_arrays(*args)  # warm: served from mmap cache
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert any((tmp_path / "cache").iterdir())

    _time.sleep(0.01)
    csv.write_text(
        "itemid,domain,click,train_tag\n"
        "5,0,1,0\n6,1,0,1\n7,0,1,2\n8,1,0,0\n")
    x3, _, _ = _read_arrays(*args)
    assert int(np.asarray(x3)[:, 0].max()) == 8  # new content, not stale
