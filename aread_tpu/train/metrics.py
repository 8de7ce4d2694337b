"""Evaluation metrics: ROC-AUC, log-loss, and the per-domain weighted
aggregation that is the reference's north-star metric
(run.py:757-758, 787-808).

AUC is the tie-aware rank statistic (identical to
sklearn.metrics.roc_auc_score); log-loss clips probabilities at 1e-15 like
sklearn. Both run in numpy on host — eval predictions are streamed off
device once per epoch, so this is never on the hot path.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def roc_auc(targets: np.ndarray, predicts: np.ndarray) -> float:
    """Tie-aware AUC via average ranks (Mann-Whitney U)."""
    targets = np.asarray(targets).astype(np.int64).ravel()
    predicts = np.asarray(predicts, dtype=np.float64).ravel()
    n_pos = int(targets.sum())
    n_neg = targets.size - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError("Only one class present; AUC undefined")
    order = np.argsort(predicts, kind="mergesort")
    sorted_p = predicts[order]
    ranks = np.empty(targets.size, dtype=np.float64)
    # average ranks over ties
    i = 0
    rank_vals = np.arange(1, targets.size + 1, dtype=np.float64)
    # vectorized tie-averaging
    _, inv, counts = np.unique(sorted_p, return_inverse=True, return_counts=True)
    cum = np.cumsum(counts)
    start = cum - counts
    avg_rank = (start + cum + 1) / 2.0  # average of ranks within each tie group
    ranks[order] = avg_rank[inv]
    pos_rank_sum = ranks[targets == 1].sum()
    return float((pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def log_loss(targets: np.ndarray, predicts: np.ndarray, eps: float = 1e-15) -> float:
    targets = np.asarray(targets, dtype=np.float64).ravel()
    p = np.clip(np.asarray(predicts, dtype=np.float64).ravel(), eps, 1 - eps)
    return float(-np.mean(targets * np.log(p) + (1 - targets) * np.log(1 - p)))


def evaluate_multi_domain(
    targets: np.ndarray,
    predicts: np.ndarray,
    domains: np.ndarray,
    domain_cnt_weight: np.ndarray,
) -> Dict:
    """Per-domain AUC/log-loss plus the train-frequency-weighted means
    (reference Run.evaluate_multi_domain, run.py:787-808). Domains whose
    eval split is single-class contribute NaN, which propagates into the
    weighted mean exactly as in the reference."""
    domains = np.asarray(domains).ravel()
    domain_auc, domain_loss = {}, {}
    mean_auc, mean_loss = 0.0, 0.0
    for d in np.unique(domains):
        m = domains == d
        try:
            auc = roc_auc(targets[m], predicts[m])
            loss = log_loss(targets[m], predicts[m])
        except ValueError:
            auc, loss = np.nan, np.nan
        d = int(d)
        domain_auc[d], domain_loss[d] = auc, loss
        w = domain_cnt_weight[d] if d < len(domain_cnt_weight) else 0.0
        mean_auc += w * auc
        mean_loss += w * loss
    return {
        "domain_auc": domain_auc,
        "domain_loss": domain_loss,
        "mean_auc": float(mean_auc),
        "mean_loss": float(mean_loss),
    }


def full_evaluation(targets, predicts, domains, domain_cnt_weight, multi_domain: bool = True) -> Dict:
    """total AUC/loss (+ per-domain block), the reference Run.test result
    dict (run.py:756-763)."""
    result = {
        "total_auc": roc_auc(targets, predicts),
        "total_loss": log_loss(targets, predicts),
    }
    if multi_domain:
        result.update(evaluate_multi_domain(targets, predicts, domains, domain_cnt_weight))
    return result


# --------------------------------------------------------------------------
# Streaming (device-resident) per-domain AUC — the TPU-scalable eval path.
#
# The exact host path above needs every (target, pred, domain) triple on the
# host. At production scale (17.9M Amazon eval rows x many devices) that is
# a host-transfer bottleneck; instead we accumulate per-domain probability
# HISTOGRAMS on device (a [n_domain, n_bins] scatter-add per batch, which
# XLA lowers to one segment-sum), psum them across the mesh, and finalize
# AUC/log-loss on host from the tiny [n_domain, n_bins] arrays. AUC from a
# histogram is the tie-aware Mann-Whitney statistic with ties-within-bin
# handled by the 0.5 * pos_b * neg_b term, so it converges to the exact AUC
# as bins grow (within 1/n_bins discretization).
# --------------------------------------------------------------------------


class StreamingAUC:
    """Per-domain streaming AUC/log-loss accumulator.

    State is a pytree of device arrays, so ``update`` can live inside a
    jitted (and pjit-sharded) eval step; across a mesh, finish with
    ``jax.lax.psum(state, 'data')`` or simply let GSPMD all-reduce the
    replicated output. Finalization mirrors ``full_evaluation``'s dict.
    """

    def __init__(self, n_domain: int, n_bins: int = 16384):
        self.n_domain = int(n_domain)
        self.n_bins = int(n_bins)

    def init_state(self):
        import jax.numpy as jnp

        z = jnp.zeros((self.n_domain, self.n_bins), jnp.float32)
        return {"pos": z, "neg": z,
                "loss_sum": jnp.zeros((self.n_domain,), jnp.float32),
                "count": jnp.zeros((self.n_domain,), jnp.float32)}

    def update(self, state, probs, targets, domains, valid=None, logits=None):
        """Pure, jit-friendly. probs/targets [B] float, domains [B] int,
        valid [B] float mask for padded rows (1 = real). Pass the model's
        raw ``logits`` when available: float32 probabilities saturate to
        exactly 0/1 and destroy rank information, while logits keep full
        resolution."""
        import jax
        import jax.numpy as jnp

        targets = jnp.asarray(targets, jnp.float32)
        domains = jnp.asarray(domains, jnp.int32)
        if probs is None:
            probs = jax.nn.sigmoid(jnp.asarray(logits, jnp.float32))
        probs = jnp.asarray(probs, jnp.float32)
        valid = jnp.ones_like(probs) if valid is None else jnp.asarray(valid, jnp.float32)

        # bin in LOGIT space: AUC is rank-based, so any monotone transform
        # preserves it, and logit-spaced bins keep full resolution where
        # CTR models live (probabilities saturated near 0/1 collapse into
        # a handful of linear bins but spread over thousands of logit bins)
        if logits is not None:
            z = jnp.clip(jnp.asarray(logits, jnp.float32), -32.0, 32.0)
            lo, width = -32.2, 64.4
        else:
            pc = jnp.clip(probs, 1e-7, 1 - 1e-7)
            z = jnp.log(pc) - jnp.log1p(-pc)  # in (-16.2, 16.2)
            lo, width = -16.2, 32.4
        bins = jnp.clip(((z - lo) * (self.n_bins / width)).astype(jnp.int32),
                        0, self.n_bins - 1)
        idx = domains * self.n_bins + bins
        size = self.n_domain * self.n_bins
        pos_w = targets * valid
        neg_w = (1.0 - targets) * valid
        pos = jax.ops.segment_sum(pos_w, idx, num_segments=size).reshape(
            self.n_domain, self.n_bins)
        neg = jax.ops.segment_sum(neg_w, idx, num_segments=size).reshape(
            self.n_domain, self.n_bins)
        # 1e-7 is the float32-safe epsilon: clip(1.0, ..., 1 - 1e-15) is a
        # no-op in float32 and log1p(-1.0) = -inf would NaN the masked-out
        # term. Differs from the host path's 1e-15 only on rows whose
        # prediction is saturated AND wrong (-log(1e-7) vs -log(1e-15)).
        p = jnp.clip(probs, 1e-7, 1 - 1e-7)
        bce = -(targets * jnp.log(p) + (1 - targets) * jnp.log1p(-p)) * valid
        loss_sum = jax.ops.segment_sum(bce, domains, num_segments=self.n_domain)
        count = jax.ops.segment_sum(valid, domains, num_segments=self.n_domain)
        return {"pos": state["pos"] + pos, "neg": state["neg"] + neg,
                "loss_sum": state["loss_sum"] + loss_sum,
                "count": state["count"] + count}

    @staticmethod
    def _auc_from_hist(pos: np.ndarray, neg: np.ndarray) -> float:
        P, N = pos.sum(), neg.sum()
        if P == 0 or N == 0:
            return float("nan")
        cum_neg_below = np.concatenate([[0.0], np.cumsum(neg)[:-1]])
        ordered = float(np.sum(pos * cum_neg_below) + 0.5 * np.sum(pos * neg))
        return ordered / float(P * N)

    def finalize(self, state, domain_cnt_weight=None,
                 multi_domain: bool = True) -> Dict:
        """Host finalize -> the same dict shape as ``full_evaluation``."""
        pos = np.asarray(state["pos"], np.float64)
        neg = np.asarray(state["neg"], np.float64)
        loss_sum = np.asarray(state["loss_sum"], np.float64)
        count = np.asarray(state["count"], np.float64)
        total_count = count.sum()
        result = {
            "total_auc": self._auc_from_hist(pos.sum(0), neg.sum(0)),
            "total_loss": float(loss_sum.sum() / total_count) if total_count else float("nan"),
        }
        if multi_domain:
            domain_auc, domain_loss = {}, {}
            mean_auc, mean_loss = 0.0, 0.0
            for d in range(self.n_domain):
                if count[d] == 0:
                    continue  # domain absent from the eval split
                auc = self._auc_from_hist(pos[d], neg[d])
                loss = float(loss_sum[d] / count[d])
                if np.isnan(auc):
                    loss = float("nan")  # reference NaNs both on single-class
                domain_auc[d], domain_loss[d] = auc, loss
                w = (domain_cnt_weight[d]
                     if domain_cnt_weight is not None and d < len(domain_cnt_weight)
                     else 0.0)
                mean_auc += w * auc
                mean_loss += w * loss
            result.update({"domain_auc": domain_auc, "domain_loss": domain_loss,
                           "mean_auc": float(mean_auc), "mean_loss": float(mean_loss)})
        return result
