"""MAMDR Reptile meta-training (reference MamdrRun, run.py:911-1088, and
the meta-weight helpers mamdr.py:39-57).

Loop per epoch (run.py:963-1014):
  1. shared update: set meta weights, train over the shuffled domain batch
     sequence, Reptile-update: meta += (new - old) * meta_lr;
  2. per domain d: sample aux domains, train on (aux then d) starting from
     merged (shared + specific) weights, Reptile-update the specific
     weights against the merged starting point.
Eval (run.py:1016-1054): per-domain, with merged weights swapped in.

In JAX this is pure pytree arithmetic — no parameter copying machinery.
Note: the reference's MAMDR path is unreachable as shipped (main.py never
constructs MamdrRun and the two mamdr_* config knobs are undefined,
run.py:984,991); this implementation is runnable.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aread_tpu.config import Config
from aread_tpu.data.loader import DomainBatcher, SplitData
from aread_tpu.train import metrics as metrics_lib
from aread_tpu.train.trainer import Trainer, hybrid_init


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_clone(a):
    return jax.tree_util.tree_map(jnp.array, a)


def reptile_update(update_vars, new_vars, old_vars, meta_lr: float):
    """update += (new - old) * meta_lr (reference mamdr.py:48-57)."""
    return jax.tree_util.tree_map(
        lambda u, n, o: u + (n - o) * meta_lr, update_vars, new_vars, old_vars)


class MamdrTrainer(Trainer):
    """Reptile meta-trainer over per-domain batch streams."""

    def __init__(self, model, config: Config, n_domain: int, mesh=None):
        super().__init__(model, config, n_domain, mesh=mesh)
        self.meta_weights = None
        self.domain_weights: Optional[List] = None

    def _train_on_sequence(self, params, state, opt_state, batcher, seq, rng):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        for d in seq:
            batch = self._place(batcher.next_batch(int(d)))
            rng, srng = jax.random.split(rng)
            params, state, opt_state, _ = self._train_step(
                params, state, opt_state, batch, srng)
        return params, state, opt_state, rng

    def fit(self, data: SplitData, rng=None, epochs: Optional[int] = None,
            verbose: bool = True, warm_start: Optional[Dict] = None) -> Dict:
        """``warm_start``: checkpoint dict — params seed the shared meta
        weights (is_increment restart, reference run.py:835-840)."""
        cfg = self.config
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        nd = self.n_domain
        train_b = DomainBatcher(data.train_x, data.train_y, cfg.bs,
                                data.spec.domain_idx, nd, seed=cfg.seed)
        valid_b = DomainBatcher(data.valid_x, data.valid_y, cfg.bs,
                                data.spec.domain_idx, nd, shuffle=False, seed=0)
        test_b = DomainBatcher(data.test_x, data.test_y, cfg.bs,
                               data.spec.domain_idx, nd, shuffle=False, seed=0)
        np_rng = np.random.default_rng(cfg.seed)

        init_rng, rng = jax.random.split(rng)
        sample = train_b.next_batch(0)
        params, state, opt_state = self.init(init_rng, sample)
        if warm_start is not None:
            from aread_tpu.train.trainer import adopt_tree
            params = adopt_tree(params, warm_start["params"])
            if warm_start.get("state"):
                state = adopt_tree(state, warm_start["state"])
        from aread_tpu.utils.runlog import RunLogger
        logger = RunLogger(cfg.log_dir or None, config=cfg)
        self.meta_weights = tree_clone(params)
        # Specific (per-domain) weights start at ZERO so merged = shared at
        # t=0. The reference clones the full initial weights into both
        # (run.py:1064-1065), making merged = 2x params at t=0 — an artifact
        # of its (unreachable) MAMDR path; zero-init matches the MAMDR
        # paper's additive-residual intent.
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        self.domain_weights = [tree_clone(zeros) for _ in range(nd)]

        seq_all = np.asarray(train_b.domain_batch_seq)
        domain_list, counts = np.unique(seq_all, return_counts=True)
        cnt = dict(zip(domain_list.tolist(), counts.tolist()))

        history = []
        for epoch_i in range(epochs if epochs is not None else cfg.epoch):
            t0 = time.time()
            # ---- shared update (run.py:975-984)
            order = np_rng.permutation(domain_list)
            shuffled_seq = np.concatenate([np.repeat(d, cnt[int(d)]) for d in order])
            params = tree_clone(self.meta_weights)
            opt_state = hybrid_init(self.optimizer, params)
            params, state, opt_state, rng = self._train_on_sequence(
                params, state, opt_state, train_b, shuffled_seq, rng)
            self.meta_weights = reptile_update(
                self.meta_weights, params, self.meta_weights, cfg.mamdr_meta_lr)

            # ---- specific updates (run.py:987-1012)
            for d in domain_list:
                d = int(d)
                candidates = domain_list[domain_list != d]
                k = min(cfg.mamdr_aux_sample_num, len(candidates))
                aux = np_rng.choice(candidates, size=k, replace=False)
                aux = np.append(aux, d)
                merged = tree_add(self.meta_weights, self.domain_weights[d])
                for a in aux:
                    a = int(a)
                    params = tree_clone(merged)
                    opt_state = hybrid_init(self.optimizer, params)
                    params, state, opt_state, rng = self._train_on_sequence(
                        params, state, opt_state, train_b,
                        np.repeat(a, cnt[a]), rng)
                    params, state, opt_state, rng = self._train_on_sequence(
                        params, state, opt_state, train_b,
                        np.repeat(d, cnt[d]), rng)
                    self.domain_weights[d] = reptile_update(
                        self.domain_weights[d], params, merged, cfg.mamdr_meta_lr)
                    merged = tree_add(self.meta_weights, self.domain_weights[d])

            result = self.evaluate_merged(state, valid_b, data.domain_cnt_weight)
            result["epoch_time_s"] = time.time() - t0
            history.append(result)
            logger.log({"valid": result}, step=epoch_i + 1)
            if verbose:
                # same line shape as Trainer.fit so every harness
                # (parity_auc/parity_signal/scale_signal regexes) parses
                # MAMDR runs identically
                print(f"epoch {epoch_i + 1}: train_loss=nan "
                      f"valid auc={result['total_auc']:.4f} "
                      f"loss={result['total_loss']:.4f} "
                      f"mean_auc={result.get('mean_auc', np.nan):.4f}")
            if not self.is_continuable(self.meta_weights, state, opt_state,
                                       result, epoch_i):
                break

        test_result = self.evaluate_merged(state, test_b, data.domain_cnt_weight)
        logger.log({"test": test_result})
        logger.close()
        # "params" = the shared meta weights, so main.py's checkpoint save
        # and is_increment warm-start work for the MAMDR path too
        return {"history": history, "test": test_result,
                "params": self.meta_weights, "state": state,
                "meta_weights": self.meta_weights,
                "domain_weights": self.domain_weights}

    def evaluate_merged(self, state, batcher: DomainBatcher,
                        domain_cnt_weight) -> Dict:
        """Per-domain eval with merged shared+specific weights
        (run.py:1016-1054)."""
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        preds, targets, domains = [], [], []
        seq = np.sort(np.asarray(batcher.domain_batch_seq))
        prev_d, merged = -1, None
        for d in seq:
            d = int(d)
            if d != prev_d:
                merged = tree_add(self.meta_weights, self.domain_weights[d])
                prev_d = d
            batch_np = batcher.next_batch(d)
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            prob = np.asarray(self._eval_step(merged, state, batch)[0])
            n = int(batch_np["valid"].sum())
            preds.append(prob[:n])
            targets.append(batch_np["y"][:n])
            domains.append(np.full((n,), d, np.int64))
        return metrics_lib.full_evaluation(
            np.concatenate(targets), np.concatenate(preds),
            np.concatenate(domains), domain_cnt_weight,
            multi_domain=self.config.is_evaluate_multi_domain)
