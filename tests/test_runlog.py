"""JSONL metric sink (utils/runlog.py — the reference wandb.log calls,
run.py:165,512,846, never record anything because wandb.init is missing)."""

import json
import os

import numpy as np

from aread_tpu.utils.runlog import RunLogger


def test_runlogger_writes_jsonl_and_config(tmp_path):
    from aread_tpu.config import Config

    cfg = Config(model="deepfm", bs=64)
    with RunLogger(str(tmp_path), config=cfg, run_name="r1") as lg:
        lg.log({"train_loss": np.float32(0.5)}, step=10)
        lg.log({"valid": {"total_auc": 0.7, "domain_auc": {0: 0.6, 1: np.nan}}})

    run_dir = tmp_path / "r1"
    recs = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert recs[0]["_step"] == 10 and recs[0]["train_loss"] == 0.5
    assert recs[1]["_step"] == 11  # auto-increment continues from last
    assert recs[1]["valid"]["total_auc"] == 0.7
    conf = json.loads((run_dir / "config.json").read_text())
    assert conf["model"] == "deepfm" and conf["bs"] == 64


def test_runlogger_none_is_noop():
    lg = RunLogger(None)
    lg.log({"x": 1})  # must not raise
    lg.close()


def test_trainer_fit_logs_epochs(tmp_path):
    import jax

    from aread_tpu.config import Config
    from aread_tpu.data.loader import make_synthetic_data
    from aread_tpu.models.deepfm import DeepFM
    from aread_tpu.train.trainer import Trainer

    data = make_synthetic_data(n_rows=256, n_domain=3, vocab=40, seed=3)
    cfg = Config(model="deepfm", bs=128, embed_dim=8, epoch=2, dropout=0.0,
                 log_dir=str(tmp_path))
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,))
    Trainer(model, cfg, data.n_domain).fit(data, verbose=False)

    runs = list(tmp_path.iterdir())
    assert len(runs) == 1
    lines = [json.loads(l) for l in
             (runs[0] / "metrics.jsonl").read_text().splitlines()]
    valid = [r for r in lines if "valid" in r]
    test = [r for r in lines if "test" in r]
    assert len(valid) >= 1 and len(test) == 1
    assert "total_auc" in valid[0]["valid"] and "total_auc" in test[0]["test"]
