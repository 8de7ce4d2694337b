"""Failure detection (parallel/health.py): watchdog deadlines + the
single-process barrier no-op, and the trainer's epoch_timeout_s wiring."""

import time

import numpy as np
import pytest

from aread_tpu.parallel.health import HealthError, barrier, watchdog


def test_watchdog_passes_fast_block():
    with watchdog(5.0, tag="ok"):
        time.sleep(0.01)


def test_watchdog_raises_on_deadline():
    with pytest.raises(HealthError) as e:
        with watchdog(0.05, tag="slow"):
            time.sleep(0.2)
    assert "slow" in str(e.value)


def test_watchdog_disabled():
    with watchdog(0, tag="off"):
        time.sleep(0.01)
    with watchdog(None, tag="off"):
        pass


def test_barrier_single_process_noop():
    barrier("epoch", timeout_s=1.0)  # process_count()==1: returns at once


def test_trainer_epoch_timeout_wired():
    """A sub-second epoch deadline must abort fit() with HealthError."""
    from aread_tpu.config import Config
    from aread_tpu.data.loader import make_synthetic_data
    from aread_tpu.models.deepfm import DeepFM
    from aread_tpu.train.trainer import Trainer

    data = make_synthetic_data(n_rows=2048, n_domain=3, seed=0)
    cfg = Config(model="deepfm", bs=64, embed_dim=8, epoch=1,
                 epoch_timeout_s=1e-4)
    model = DeepFM(spec=data.spec, embed_dim=8, mlp_dims=(16, 8))
    trainer = Trainer(model, cfg, data.n_domain)
    with pytest.raises(HealthError):
        trainer.fit(data, epochs=1, verbose=False)


def test_watchdog_kill_process_hard_exits():
    """kill_process: a deadline breach hard-exits the process (code 42) —
    the only escape from a permanently hung collective. Verified in a
    subprocess."""
    import subprocess
    import sys

    code = (
        "from aread_tpu.parallel.health import watchdog\n"
        "import time\n"
        "with watchdog(0.05, tag='hang', kill_process=True):\n"
        "    time.sleep(30)\n"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=60)
    assert p.returncode == 42
    assert "watchdog 'hang' exceeded" in p.stdout
