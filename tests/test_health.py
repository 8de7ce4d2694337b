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


def test_epoch_deadline_first_epoch_grace():
    """ADVICE r1: the first wrapped epoch of a process pays compiles +
    first device_put — it gets timeout * first_mult; later epochs the
    plain timeout; timeout 0/None never consumes the grace."""
    from aread_tpu.parallel import health

    old = health._first_epoch_done
    health._first_epoch_done = False
    try:
        assert health.epoch_deadline(0.0, 5.0) == 0.0  # off: grace kept
        assert health.epoch_deadline(None, 5.0) is None
        assert not health._first_epoch_done
        assert health.epoch_deadline(10.0, 5.0) == 50.0  # first epoch
        assert health.epoch_deadline(10.0, 5.0) == 10.0  # steady state
        assert health.epoch_deadline(10.0, 0.5) == 10.0  # mult floors at 1
    finally:
        health._first_epoch_done = old


def test_watchdog_fire_after_completion_is_noop(monkeypatch):
    """ADVICE r1 race: the timer firing AFTER the block returned (but
    conceptually before cancel) must neither breach nor hard-exit. The
    Timer is faked so the callback can be driven by hand post-completion;
    without the `completed` guard, os._exit(42) would kill pytest here."""
    import threading

    captured = {}

    class FakeTimer:
        daemon = True

        def __init__(self, t, fn):
            captured["fn"] = fn

        def start(self):
            pass

        def cancel(self):
            pass

    monkeypatch.setattr(threading, "Timer", FakeTimer)
    with watchdog(0.001, tag="race", kill_process=True):
        time.sleep(0.01)  # past the deadline, but the fake never fired
    captured["fn"]()  # post-completion fire: must be a pure no-op
