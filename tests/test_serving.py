"""Serving layer: self-contained checkpoint -> Predictor -> HTTP endpoint.

The reference has no serving path (SURVEY.md §1); the contract here is
that served probabilities equal the training/eval path's exactly.
"""

import json
import os
import threading
import urllib.request

import jax
import numpy as np
import pytest

from aread_tpu.config import Config
from aread_tpu.data.loader import make_synthetic_data
from aread_tpu.models.deepfm import DeepFM
from aread_tpu.serve.predictor import Predictor, load_predictor
from aread_tpu.serve.server import make_server
from aread_tpu.train.checkpoint import save_checkpoint
from aread_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from aread_tpu.models import build_model

    data = make_synthetic_data(n_rows=512, n_domain=3, vocab=48, seed=11)
    cfg = Config(model="deepfm", bs=128, embed_dim=8, epoch=1)
    # the exact main.py flow: build_model derives the (flat) model spec
    # from the data spec; the checkpoint stores the DATA spec
    model = build_model(cfg, data.spec, data.n_domain)
    trainer = Trainer(model, cfg, data.n_domain)
    result = trainer.fit(data, epochs=1, verbose=False)
    ckpt = str(tmp_path_factory.mktemp("serve") / "ckpt")
    save_checkpoint(ckpt, result["params"], result["state"], opt_state={},
                    epoch=1, spec=data.spec, run_config=cfg,
                    n_domain=data.n_domain)
    return data, cfg, model, result, ckpt


def test_predictor_matches_eval(trained):
    data, cfg, model, result, ckpt = trained
    pred = Predictor(model, result["params"], result["state"], data.n_domain)
    probs = pred.predict(data.test_x[:40])

    # ground truth: direct model application
    out = model.apply({"params": result["params"], **result["state"]},
                      data.test_x[:40], train=False)
    np.testing.assert_allclose(probs, np.asarray(out["prob"]),
                               rtol=1e-5, atol=1e-6)


def test_load_predictor_from_checkpoint(trained):
    data, cfg, model, result, ckpt = trained
    pred = load_predictor(ckpt)
    probs = pred.predict(data.test_x[:17])  # odd size -> bucket padding
    assert probs.shape == (17,)
    assert np.all((probs >= 0) & (probs <= 1))
    direct = Predictor(model, result["params"], result["state"],
                       data.n_domain).predict(data.test_x[:17])
    np.testing.assert_allclose(probs, direct, rtol=1e-5, atol=1e-6)


def test_aread_predictor_per_domain_masks():
    from aread_tpu.models.aread import AREAD
    from aread_tpu.train.hemp import AREADTrainer

    data = make_synthetic_data(n_rows=512, n_domain=3, vocab=60, seed=12)
    cfg = Config(model="aread", bs=128, embed_dim=8, warm_up_interval=1,
                 regroup_interval=2, regroup_update_step=1,
                 regroup_eval_step=1, candidate_mask_num=2)
    model = AREAD(spec=data.spec, embed_dim=8, n_tower=(2, 4),
                  n_domain=data.n_domain, base_model="mmoe",
                  expert_dims=(16, 8), tower_dims=((8, 8), (8, 8)),
                  mmoe_n_expert=2)
    trainer = AREADTrainer(model, cfg, data.n_domain)
    result = trainer.fit(data, epochs=1, verbose=False)

    pred = Predictor(model, result["params"], result["state"], data.n_domain,
                     domain_mask=result["domain_mask"])
    x = data.test_x[:30]
    probs = pred.predict(x)
    assert probs.shape == (30,)
    # mixed-domain input must equal per-domain masked eval, row for row
    from aread_tpu.train.hemp import _to_device_mask
    for d in np.unique(x[:, data.spec.domain_idx]):
        idx = np.nonzero(x[:, data.spec.domain_idx] == d)[0]
        out = model.apply(
            {"params": result["params"], **result["state"]}, x[idx],
            domain_mask=_to_device_mask(result["domain_mask"][int(d)]),
            mode="domain_with_mask", train=False)
        np.testing.assert_allclose(probs[idx], np.asarray(out["prob"]),
                                   rtol=1e-5, atol=1e-6)


def test_http_server_roundtrip(trained):
    data, cfg, model, result, ckpt = trained
    pred = Predictor(model, result["params"], result["state"], data.n_domain)
    srv = make_server(pred, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        with urllib.request.urlopen(f"http://{host}:{port}/healthz") as r:
            assert json.load(r)["status"] == "ok"
        body = json.dumps({"x": data.test_x[:5].tolist()}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            probs = json.load(r)["prob"]
        assert len(probs) == 5
        np.testing.assert_allclose(
            probs, pred.predict(data.test_x[:5]), rtol=1e-5)
        # malformed request -> 400 with an error message, not a crash
        bad = urllib.request.Request(
            f"http://{host}:{port}/predict", data=b'{"x": 3}',
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
