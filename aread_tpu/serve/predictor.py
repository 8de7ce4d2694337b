"""Inference / serving layer.

The reference has no serving path at all (SURVEY.md §1: "no serving
layer"); this module completes the production story TPU-first:

  * checkpoints are self-contained — meta.json carries the FeatureSpec,
    the model config and n_domain (train.checkpoint.save_checkpoint), so
    ``load_predictor(ckpt_dir)`` rebuilds the exact network with no
    training data or flags present;
  * batches are padded to power-of-two buckets so XLA compiles a bounded
    set of programs (arbitrary request sizes never trigger fresh traces);
  * AREAD single-domain requests run through that domain's HEMP mask
    (mode='domain_with_mask'), exactly the reference's evaluation contract
    (run.py:718-727); MIXED-domain requests run as ONE dispatch via
    mode='batch_with_mask' — per-example masks gathered on device from the
    stacked per-domain masks — instead of one dispatch per domain (each
    dispatch pays this box's 8-30 ms tunnel RTT; measured 338 ms p50 for
    an 8-domain batch on the per-domain loop, benchmarks/bench_serve.py);
    multi-tower models gather the sample's group tower (run.py:497-500);
    results return in input order;
  * predictions are probabilities (sigmoid outputs), matching the
    training/eval path bit-for-bit — tests/test_serving.py asserts
    equality against Trainer.evaluate.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

BUCKETS = (128, 512, 2048, 8192)


def _bucket(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return -(-n // BUCKETS[-1]) * BUCKETS[-1]


class Predictor:
    def __init__(self, model, params, state, n_domain: int,
                 domain_mask: Optional[List] = None,
                 domain2group: Optional[np.ndarray] = None,
                 compute_dtype: str = "float32"):
        self.model = model
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.state = jax.tree_util.tree_map(jnp.asarray, state)
        self.n_domain = n_domain
        self.domain_mask = domain_mask
        self.domain2group = domain2group
        self.compute_dtype = compute_dtype
        self.is_aread = type(model).__name__ == "AREAD"
        self._fn = None
        self._fn_mixed = None

    # ------------------------------------------------------------- jitted
    def _build(self):
        model = self.model
        from aread_tpu.models.base import gather_group
        from aread_tpu.train.trainer import matmul_precision_ctx

        if self.is_aread:
            from aread_tpu.models.aread import full_mask
            fm = [np.asarray(m, bool) for m in full_mask(model.n_tower)]
            if self.domain_mask is not None and \
                    any(m is not None for m in self.domain_mask):
                # domains without an evolved mask serve through the full
                # (all-edges) mask, like pre-evolution training
                masks = [fm if m is None else m for m in self.domain_mask]
            else:
                masks = [fm] * self.n_domain
            # all domains' masks stacked: [n_domain, T_prev, T] per level
            self._stacked_masks = tuple(
                jnp.asarray(np.stack([np.asarray(masks[d][li], bool)
                                      for d in range(self.n_domain)]))
                for li in range(len(masks[0])))

            stacked = self._stacked_masks

            @jax.jit
            def predict(params, state, x, dm):
                with matmul_precision_ctx(self.compute_dtype):
                    out = model.apply({"params": params, **state}, x,
                                      domain_mask=dm,
                                      mode="domain_with_mask", train=False)
                return out["prob"]

            @jax.jit
            def predict_mixed(params, state, x, dom):
                # per-example masks: one gather per level from the stacked
                # [n_domain, ...] masks (baked into the trace as constants)
                dm = tuple(sm[dom] for sm in stacked)
                with matmul_precision_ctx(self.compute_dtype):
                    out = model.apply({"params": params, **state}, x,
                                      domain_mask=dm,
                                      mode="batch_with_mask", train=False)
                return out["prob"]
            self._fn_mixed = predict_mixed
            return predict

        @jax.jit
        def predict(params, state, x, group):
            with matmul_precision_ctx(self.compute_dtype):
                kwargs: Dict = {"train": False}
                if group is not None:
                    kwargs["group"] = group
                out = model.apply({"params": params, **state}, x, **kwargs)
            prob = out["prob"]
            if prob.ndim == 2:
                prob = gather_group(prob, group)
            return prob
        return predict

    # -------------------------------------------------------------- public
    def predict(self, x: np.ndarray) -> np.ndarray:
        """``x``: int array [N, n_columns] of already-encoded feature ids
        (the canonical CSV layout: one-hot columns then flattened padded
        history sequences). Returns [N] float probabilities."""
        if self._fn is None:
            self._fn = self._build()
        x = np.asarray(x, np.int32)
        n = x.shape[0]
        if n == 0:
            return np.zeros((0,), np.float32)
        domain = x[:, self.model.spec.domain_idx]
        out = np.zeros((n,), np.float32)

        if self.is_aread:
            doms = np.unique(domain)
            if len(doms) > 1:
                # mixed-domain request: ONE dispatch with per-example masks
                b = _bucket(n)
                padx = np.zeros((b - n, x.shape[1]), np.int32)
                domp = np.concatenate(
                    [domain, np.zeros((b - n,), domain.dtype)])
                prob = self._fn_mixed(
                    self.params, self.state,
                    jnp.asarray(np.concatenate([x, padx])),
                    jnp.asarray(domp, jnp.int32))
                return np.asarray(prob)[:n].astype(np.float32)
            for d in doms:
                idx = np.nonzero(domain == d)[0]
                xb = x[idx]
                b = _bucket(len(idx))
                pad = np.zeros((b - len(idx), x.shape[1]), np.int32)
                dm = tuple(m[int(d)] for m in self._stacked_masks)
                prob = self._fn(self.params, self.state,
                                jnp.asarray(np.concatenate([xb, pad])), dm)
                out[idx] = np.asarray(prob)[:len(idx)]
            return out

        # group = mapped domain group, else the domain itself — the same
        # fallback the trainer's gather uses (trainer.py forward)
        if self.domain2group is not None:
            group = np.asarray(self.domain2group)[domain].astype(np.int64)
        else:
            group = domain.astype(np.int64)
        b = _bucket(n)
        padx = np.zeros((b - n, x.shape[1]), np.int32)
        xb = jnp.asarray(np.concatenate([x, padx]))
        gb = jnp.asarray(np.concatenate([group, np.zeros((b - n,), np.int64)]))
        prob = self._fn(self.params, self.state, xb, gb)
        return np.asarray(prob)[:n].astype(np.float32)


def _coerce_like(template, value):
    """JSON round-trip turns tuples into lists; restore tuples (recursively)
    wherever the dataclass default is a tuple."""
    if isinstance(template, tuple) and isinstance(value, list):
        return tuple(_coerce_like(template[0] if template else None, v)
                     for v in value)
    if isinstance(value, list) and value and isinstance(value[0], list):
        return tuple(tuple(v) for v in value)
    return value


def load_predictor(ckpt_path: str) -> Predictor:
    """Rebuild a Predictor from a self-contained checkpoint directory
    (written by main.py / train.checkpoint.save_checkpoint with
    spec/run_config/n_domain)."""
    import dataclasses

    from aread_tpu.config import Config
    from aread_tpu.models import build_model
    from aread_tpu.models.base import FeatureSpec
    from aread_tpu.train.checkpoint import load_checkpoint

    with open(os.path.join(ckpt_path, "meta.json")) as f:
        meta = json.load(f)
    if "spec" not in meta or "config" not in meta:
        raise ValueError(
            f"{ckpt_path} lacks spec/config metadata (written by older "
            "checkpoints); re-save with spec=/run_config= to serve from it")

    spec_kwargs = dict(meta["spec"])
    spec_kwargs["one_hot_dims"] = tuple(spec_kwargs["one_hot_dims"])
    spec = FeatureSpec(**spec_kwargs)

    cfg_fields = {f.name: f.default for f in dataclasses.fields(Config)}
    cfg_kwargs = {k: _coerce_like(cfg_fields.get(k), v)
                  for k, v in meta["config"].items() if k in cfg_fields}
    cfg = Config(**cfg_kwargs)

    n_domain = meta.get("n_domain")
    if n_domain is None:
        from aread_tpu.config import DOMAIN_SIZE
        n_domain = len(DOMAIN_SIZE.get(cfg.dataset_name, ()))
    n_domain = int(n_domain)
    ck = load_checkpoint(ckpt_path, n_domain=n_domain)
    model = build_model(cfg, spec, n_domain)

    from aread_tpu.train.trainer import MULTI_TOWER_MODELS
    d2g = cfg.domain2group()
    if d2g is not None:
        d2g = np.array(d2g)
    elif cfg.model in MULTI_TOWER_MODELS:
        # same modulo fallback as main.py for datasets without a
        # precomputed grouping (cloudtheme) — must match training
        d2g = np.arange(n_domain) % min(cfg.n_tower, n_domain)
    return Predictor(model, ck["params"], ck["state"], n_domain,
                     domain_mask=ck.get("domain_mask"),
                     domain2group=d2g, compute_dtype=cfg.compute_dtype)
