"""Integration tests on the reference's bundled sample CSVs (~3k rows each,
'to facilitate initial setup and verification', reference README.md:60).
Read-only from /root/reference; skipped when absent."""

import os

import numpy as np
import pytest

import jax

from aread_tpu.config import Config
from aread_tpu.data.loader import load_split_data
from aread_tpu.models.deepfm import DeepFM
from aread_tpu.models.mmoe import MMoE
from aread_tpu.train.trainer import Trainer

REF = "/root/reference/dataset"
AMAZON = os.path.join(REF, "amazon", "prepare2train_filter_12month.csv")
AMAZON_AUG = os.path.join(REF, "amazon", "prepare2train_filter_12month_aug0.1.csv")
ALICCP = os.path.join(REF, "aliccp", "thresh15_ndomain30_modeinterval_random.csv")

pytestmark = pytest.mark.skipif(not os.path.exists(AMAZON),
                                reason="reference sample data not mounted")


def test_amazon_sample_loads_and_splits():
    data = load_split_data(AMAZON, "amazon", itemid_all=1368287,
                           aug_path=AMAZON_AUG)
    # 7 one-hot + 2 seq*5 columns (run.py:52-54, 158)
    assert data.train_x.shape[1] == 7 + 10
    assert data.spec.one_hot_dims[data.spec.itemid_idx] == 1368287
    n = len(data.train_y) + len(data.valid_y) + len(data.test_y)
    assert n == 3092  # file rows minus header
    # timestamp-quantile split ~ 90/5/5 (run.py:141-142)
    assert len(data.train_x) >= 0.85 * n
    assert data.aug_train_x is not None and len(data.aug_train_x) > len(data.train_x) * 0.9
    # domain weights sum to 1 over train
    assert abs(data.domain_cnt_weight.sum() - 1.0) < 1e-6


def test_aliccp_sample_loads():
    data = load_split_data(ALICCP, "aliccp")
    assert data.train_x.shape[1] == 23  # categorical cols (run.py:56-59)
    assert data.n_domain <= 30
    assert len(data.valid_y) > 0 and len(data.test_y) > 0


def test_deepfm_trains_on_aliccp_sample():
    data = load_split_data(ALICCP, "aliccp")
    # small embed table: aliccp sample vocab fits easily
    cfg = Config(model="deepfm", dataset_name="aliccp", bs=256, lr=1e-3,
                 embed_dim=8, epoch=1)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(64, 32))
    trainer = Trainer(model, cfg, data.n_domain)
    result = trainer.fit(data, epochs=1, verbose=False)
    assert np.isfinite(result["history"][0]["train_loss"])
    assert 0.0 <= result["test"]["total_auc"] <= 1.0
