"""Elastic end-to-end drill (VERDICT r1 item 9): a training process whose
epoch 2 hangs (simulated stuck collective) is HARD-KILLED by the watchdog
(parallel/health.py kill mode, exit 42), an orchestrator loop restarts it,
it resumes from the last improvement checkpoint (train/checkpoint.py) —
and the final test metrics and parameters are BITWISE identical to an
uninterrupted run. Exact replay works because GlobalBatcher's shuffle is
epoch-keyed (counter-based Philox fast-forwarded by set_epoch) and the
checkpoint carries the post-epoch RNG key."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import json, os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from aread_tpu.config import Config
from aread_tpu.data.loader import make_synthetic_data
from aread_tpu.models.deepfm import DeepFM
from aread_tpu.train.trainer import Trainer

ckpt_dir, hang = sys.argv[1], sys.argv[2] == "1"

data = make_synthetic_data(n_rows=1024, n_domain=3, vocab=64, seed=0)
cfg = Config(bs=128, embed_dim=8, lr=1e-2, early_stop=100,
             epoch_timeout_s=3.0, epoch_timeout_kill=True,
             epoch_timeout_first_mult=30.0, device_data="0")
model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16,), dropout=0.0)


class DrillTrainer(Trainer):
    _epochs_run = 0

    def train_epoch(self, *a, **k):
        DrillTrainer._epochs_run += 1
        if hang and DrillTrainer._epochs_run == 2:
            time.sleep(300)  # a permanently hung epoch: watchdog must kill
        return super().train_epoch(*a, **k)


trainer = DrillTrainer(model, cfg, data.n_domain)
result = trainer.fit(data, epochs=4, verbose=False, ckpt_dir=ckpt_dir)
leaves = jax.tree_util.tree_leaves(result["params"])
checksum = float(sum(np.abs(np.asarray(l)).sum() for l in leaves))
print("FINAL", json.dumps({"test": result["test"], "checksum": checksum}),
      flush=True)
'''


def _run(script, ckpt_dir, hang, timeout=900):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, str(script), ckpt_dir, "1" if hang else "0"],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)


def _final(stdout):
    import json
    for line in stdout.splitlines():
        if line.startswith("FINAL "):
            return json.loads(line[6:])
    return None


@pytest.mark.skipif(sys.platform != "linux", reason="process drill")
def test_watchdog_kill_then_elastic_resume_matches_uninterrupted(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    # uninterrupted run
    base = _run(script, str(tmp_path / "ckpt_base"), hang=False)
    assert base.returncode == 0, base.stderr[-3000:]
    want = _final(base.stdout)
    assert want is not None, base.stdout

    # drill: epoch 2 hangs -> watchdog hard-exits with code 42
    ckpt = str(tmp_path / "ckpt_drill")
    killed = _run(script, ckpt, hang=True)
    assert killed.returncode == 42, (killed.returncode, killed.stderr[-2000:])
    assert "watchdog" in (killed.stdout + killed.stderr)
    assert os.path.exists(os.path.join(ckpt, "meta.json"))  # epoch-1 improv

    # orchestrator restart: resumes and must finish identically
    resumed = _run(script, ckpt, hang=False)
    assert resumed.returncode == 0, resumed.stderr[-3000:]
    got = _final(resumed.stdout)
    assert got is not None, resumed.stdout

    assert got["checksum"] == want["checksum"]
    for k, v in want["test"].items():
        g = got["test"][k]
        if isinstance(v, float) and np.isnan(v):
            assert np.isnan(g)
        else:
            assert g == v, (k, g, v)
