"""Native C++ CSV loader vs. the pandas path — exact agreement, fallback
behavior, and load_split_data integration (reference run.py:237-265)."""

import os

import numpy as np
import pandas as pd
import pytest

from aread_tpu import native
from aread_tpu.data.loader import (AMAZON_FEATURES, AMAZON_SEQ_FEATURES,
                                   ALICCP_FEATURES, load_split_data, tensorize)

AMAZON = "/root/reference/dataset/amazon/prepare2train_filter_12month.csv"
ALICCP = "/root/reference/dataset/aliccp/thresh15_ndomain30_modeinterval_random.csv"

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.mark.skipif(not os.path.exists(AMAZON), reason="sample not mounted")
def test_native_matches_pandas_amazon_with_seqs():
    x, y, split = native.load_csv(AMAZON, AMAZON_FEATURES, AMAZON_SEQ_FEATURES,
                                  "label", "timestamp", 5, 1368287)
    df = pd.read_csv(AMAZON, usecols=AMAZON_FEATURES + AMAZON_SEQ_FEATURES
                     + ["label", "timestamp"])
    xr, yr = tensorize(df, AMAZON_FEATURES, AMAZON_SEQ_FEATURES, "label", 5, 1368287)
    np.testing.assert_array_equal(x, xr)
    np.testing.assert_array_equal(y, yr)
    np.testing.assert_array_equal(split, df["timestamp"].to_numpy(np.float64))


@pytest.mark.skipif(not os.path.exists(ALICCP), reason="sample not mounted")
def test_native_matches_pandas_aliccp_no_seqs():
    x, y, split = native.load_csv(ALICCP, ALICCP_FEATURES, [], "click",
                                  "train_tag", 5, 0)
    df = pd.read_csv(ALICCP, usecols=ALICCP_FEATURES + ["click", "train_tag"])
    xr, yr = tensorize(df, ALICCP_FEATURES, [], "click", 5, 0)
    np.testing.assert_array_equal(x, xr)
    np.testing.assert_array_equal(y, yr)


def test_native_errors_on_missing_column(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(RuntimeError, match="column not found"):
        native.load_csv(str(p), ["a", "zzz"], [], "b", "a", 5, 0)


def test_native_seq_truncation_keeps_last_maxlen(tmp_path):
    p = tmp_path / "seq.csv"
    p.write_text('itemid,domain,seq,label,train_tag\n'
                 '3,0,"[1, 2, 3, 4, 5, 6, 7]",1,0\n'
                 '4,1,[9],0,1\n'
                 '5,1,[],0,2\n')
    x, y, split = native.load_csv(str(p), ["itemid", "domain"], ["seq"],
                                  "label", "train_tag", 5, 99)
    # run.py:105-111: keep the LAST maxlen, pad right
    np.testing.assert_array_equal(x[0], [3, 0, 3, 4, 5, 6, 7])
    np.testing.assert_array_equal(x[1], [4, 1, 9, 99, 99, 99, 99])
    np.testing.assert_array_equal(x[2], [5, 1, 99, 99, 99, 99, 99])
    np.testing.assert_array_equal(y, [1, 0, 0])
    np.testing.assert_array_equal(split, [0.0, 1.0, 2.0])


@pytest.mark.skipif(not os.path.exists(AMAZON), reason="sample not mounted")
def test_load_split_data_same_with_and_without_native(monkeypatch):
    data_native = load_split_data(AMAZON, "amazon", itemid_all=1368287)
    monkeypatch.setenv("AREAD_TPU_NO_NATIVE", "1")
    assert not native.available()
    data_pandas = load_split_data(AMAZON, "amazon", itemid_all=1368287)
    np.testing.assert_array_equal(data_native.train_x, data_pandas.train_x)
    np.testing.assert_array_equal(data_native.valid_x, data_pandas.valid_x)
    np.testing.assert_array_equal(data_native.test_y, data_pandas.test_y)
    assert data_native.spec == data_pandas.spec
    np.testing.assert_allclose(data_native.domain_cnt_weight,
                               data_pandas.domain_cnt_weight)
