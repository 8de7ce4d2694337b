"""Run-metrics sink (the working equivalent of the reference's wandb usage).

The reference calls ``wandb.log`` throughout (run.py:165,512,846,891,903 —
train_loss per log interval, full valid/test result dicts per epoch,
feature metadata, final domain masks) but never calls ``wandb.init``, so
nothing is actually recorded. Here the same call points write JSON-lines
to ``<dir>/metrics.jsonl`` (one object per log call, with a monotonic
``_step`` and wall-clock ``_ts``) plus a ``config.json`` snapshot — a
format tail -f / pandas / external dashboards can all consume with zero
dependencies.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


def _jsonable(v: Any):
    if isinstance(v, (float, np.floating)) and not np.isfinite(v):
        return None  # NaN/inf are not valid JSON (single-class domain AUCs)
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    if hasattr(v, "item"):  # 0-d jax arrays
        try:
            return v.item()
        except Exception:
            pass
    return repr(v)


class RunLogger:
    """Append-only JSONL metric logger.

    >>> logger = RunLogger("save/aliccp/logs", config=cfg)
    >>> logger.log({"train_loss": 0.51}, step=120)
    >>> logger.log({"valid": result_dict})
    >>> logger.close()

    A ``RunLogger(None)`` is a no-op sink, so trainers can call it
    unconditionally.
    """

    def __init__(self, log_dir: Optional[str], config: Any = None,
                 run_name: Optional[str] = None):
        self._fh = None
        self._step = 0
        self.log_dir = None
        if not log_dir:
            return
        run_name = run_name or time.strftime("%Y%m%d-%H%M%S")
        self.log_dir = os.path.join(log_dir, run_name)
        os.makedirs(self.log_dir, exist_ok=True)
        self._fh = open(os.path.join(self.log_dir, "metrics.jsonl"), "a",
                        buffering=1)
        if config is not None:
            cfg = (dataclasses.asdict(config)
                   if dataclasses.is_dataclass(config) else dict(config))
            with open(os.path.join(self.log_dir, "config.json"), "w") as f:
                json.dump(_jsonable(cfg), f, indent=1)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        if self._fh is None:
            return
        self._step = self._step + 1 if step is None else int(step)
        rec = {"_step": self._step, "_ts": time.time()}
        rec.update({k: _jsonable(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
