"""Training/eval orchestration for the non-AREAD model zoo.

Reproduces the reference Run's semantics (run.py:33-908):
  * Adam(lr, betas=(0.9, 0.99), eps=1e-8, weight_decay=1e-8) (run.py:830);
  * loss = BCE (mean) + manual L2 regularization term (run.py:505);
  * multi-tower models compute all towers; the loss gathers the sample's
    group column (run.py:497-500);
  * early stopping on weighted mean AUC with patience ``early_stop``
    (run.py:459-484), checkpoint on every improvement, best model reloaded
    for the test pass (run.py:899-901).

TPU-first: a single donated jitted train step per model; batches are fixed
shape with a validity mask; BCE is computed from logits (equal to the
reference's BCELoss on probabilities, but stable and fusable).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aread_tpu.config import Config
from aread_tpu.data.loader import DomainBatcher, GlobalBatcher, SplitData
from aread_tpu.models.base import gather_group, regularization_loss
from aread_tpu.train import metrics as metrics_lib

MULTI_TOWER_MODELS = ("ple", "mmoe", "pepnet", "epnet", "star", "adl", "hinet")
CONCAT_GROUP_MODELS = ("star", "adl", "hinet")  # forward consumes group


def bce_with_logits(logit, y):
    """Numerically stable binary cross-entropy from logits."""
    return jnp.maximum(logit, 0.0) - logit * y + jnp.log1p(jnp.exp(-jnp.abs(logit)))


def masked_mean(values, valid):
    return jnp.sum(values * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def make_optimizer(lr: float, wd: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, betas=(0.9,0.99), eps=1e-8, weight_decay=wd):
    torch applies weight decay additively to the gradient BEFORE the moment
    updates, which is optax.add_decayed_weights placed before adam."""
    return optax.chain(
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8),
        optax.scale(-lr),
    )


def split_variables(variables) -> Tuple[Dict, Dict]:
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}
    return params, state


class Trainer:
    """Generic trainer for single-output and multi-tower models."""

    def __init__(self, model, config: Config, n_domain: int,
                 domain2group: Optional[np.ndarray] = None):
        self.model = model
        self.config = config
        self.n_domain = n_domain
        self.model_name = getattr(model, "model_name", type(model).__name__.lower())
        self.is_multi_tower = self.model_name in MULTI_TOWER_MODELS
        self.domain2group = domain2group
        self.optimizer = make_optimizer(config.lr, config.wd)
        self._train_step = None
        self._eval_step = None
        # early-stop state (reference run.py:99-103)
        self.trial_counter = 0
        self.best_auc, self.best_mean_auc = 0.0, 0.0
        self.best_loss, self.best_mean_loss = np.inf, np.inf
        self.best_checkpoint = None

    # ---------------------------------------------------------------- init
    def init(self, rng, sample_batch) -> Tuple[Dict, Dict, Any]:
        has_group = "group" in sample_batch
        model = self.model

        @jax.jit
        def _init(rng, x, group):
            kwargs = {"train": False}
            if group is not None:
                kwargs["group"] = group
            return model.init({"params": rng, "dropout": rng}, x, **kwargs)

        variables = _init(rng, jnp.asarray(sample_batch["x"]),
                          jnp.asarray(sample_batch["group"]) if has_group else None)
        params, state = split_variables(variables)
        opt_state = self.optimizer.init(params)
        return params, state, opt_state

    def _model_kwargs(self, batch, train: bool) -> Dict:
        kwargs: Dict[str, Any] = {"train": train}
        if train:
            kwargs["mask"] = jnp.asarray(batch["valid"])
        if "group" in batch:
            kwargs["group"] = jnp.asarray(batch["group"])
        return kwargs

    # ---------------------------------------------------------- jitted fns
    def _build_train_step(self):
        model, optimizer = self.model, self.optimizer
        reg_rules = type(self.model).REG_RULES
        is_multi_tower = self.is_multi_tower

        @jax.jit
        def train_step(params, state, opt_state, batch, rng):
            x, y, valid = batch["x"], batch["y"], batch["valid"]
            group = batch.get("group")

            def loss_fn(p):
                variables = {"params": p, **state}
                kwargs = {"train": True, "mask": valid}
                if group is not None:
                    kwargs["group"] = group
                out, new_state = model.apply(
                    variables, x, mutable=list(state.keys()),
                    rngs={"dropout": rng}, **kwargs)
                logit = out["logit"]
                if is_multi_tower and logit.ndim == 2:
                    logit = gather_group(logit, group if group is not None else batch["domain"])
                bce = masked_mean(bce_with_logits(logit, y), valid)
                loss = bce + regularization_loss(p, reg_rules)
                return loss, new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, dict(new_state), new_opt_state, loss

        return train_step

    def _build_eval_step(self):
        model = self.model
        is_multi_tower = self.is_multi_tower

        @jax.jit
        def eval_step(params, state, batch):
            variables = {"params": params, **state}
            kwargs: Dict[str, Any] = {"train": False}
            if "group" in batch:
                kwargs["group"] = batch["group"]
            out = model.apply(variables, batch["x"], **kwargs)
            prob = out["prob"]
            if is_multi_tower and prob.ndim == 2:
                prob = gather_group(prob, batch["group"])
            return prob

        return eval_step

    # ------------------------------------------------------------ training
    def train_epoch(self, params, state, opt_state, batcher: Iterable, rng,
                    log_every: int = 200):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        losses = []
        for i, batch in enumerate(batcher):
            rng, step_rng = jax.random.split(rng)
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            params, state, opt_state, loss = self._train_step(
                params, state, opt_state, jb, step_rng)
            losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        return params, state, opt_state, rng, mean_loss

    def evaluate(self, params, state, x: np.ndarray, y: np.ndarray,
                 domain_cnt_weight: np.ndarray) -> Dict:
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        bs = self.config.bs
        batcher = GlobalBatcher(x, y, bs, self.model.spec.domain_idx,
                                self.domain2group, shuffle=False)
        preds, targets, domains = [], [], []
        for batch in batcher:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            prob = np.asarray(self._eval_step(params, state, jb))
            n = int(batch["valid"].sum())
            preds.append(prob[:n])
            targets.append(batch["y"][:n])
            domains.append(batch["domain"][:n])
        preds = np.concatenate(preds)
        targets = np.concatenate(targets)
        domains = np.concatenate(domains)
        return metrics_lib.full_evaluation(
            targets, preds, domains, domain_cnt_weight,
            multi_domain=self.config.is_evaluate_multi_domain)

    def is_continuable(self, params, state, opt_state, result: Dict, epoch_i: int) -> bool:
        """Early stopping on mean_auc with patience (reference run.py:459-484)."""
        key = "mean_auc" if "mean_auc" in result and not np.isnan(result["mean_auc"]) \
            else "total_auc"
        best = self.best_mean_auc if key == "mean_auc" else self.best_auc
        if result[key] > best:
            self.trial_counter = 0
            self.best_auc = result["total_auc"]
            self.best_loss = result["total_loss"]
            if "mean_auc" in result:
                self.best_mean_auc = result["mean_auc"]
                self.best_mean_loss = result.get("mean_loss", np.inf)
            self.best_checkpoint = (
                jax.tree_util.tree_map(np.asarray, params),
                jax.tree_util.tree_map(np.asarray, state),
                epoch_i,
            )
            return True
        if self.trial_counter + 1 < self.config.early_stop:
            self.trial_counter += 1
            return True
        return False

    def fit(self, data: SplitData, rng=None, epochs: Optional[int] = None,
            verbose: bool = True) -> Dict:
        cfg = self.config
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        d2g = self.domain2group
        batcher = GlobalBatcher(data.train_x, data.train_y, cfg.bs,
                                data.spec.domain_idx, d2g, seed=cfg.seed)
        init_rng, rng = jax.random.split(rng)
        sample = next(iter(batcher))
        params, state, opt_state = self.init(init_rng, sample)

        history = []
        for epoch_i in range(epochs if epochs is not None else cfg.epoch):
            t0 = time.time()
            params, state, opt_state, rng, train_loss = self.train_epoch(
                params, state, opt_state, batcher, rng)
            result = self.evaluate(params, state, data.valid_x, data.valid_y,
                                   data.domain_cnt_weight)
            result["train_loss"] = train_loss
            result["epoch_time_s"] = time.time() - t0
            history.append(result)
            if verbose:
                msg = (f"epoch {epoch_i + 1}: train_loss={train_loss:.4f} "
                       f"valid auc={result['total_auc']:.4f} loss={result['total_loss']:.4f}")
                if "mean_auc" in result:
                    msg += f" mean_auc={result['mean_auc']:.4f}"
                print(msg)
            if not self.is_continuable(params, state, opt_state, result, epoch_i):
                break

        if self.best_checkpoint is not None:
            best_params, best_state, _ = self.best_checkpoint
            params = jax.tree_util.tree_map(jnp.asarray, best_params)
            state = jax.tree_util.tree_map(jnp.asarray, best_state)
        test_result = self.evaluate(params, state, data.test_x, data.test_y,
                                    data.domain_cnt_weight)
        return {"history": history, "test": test_result,
                "params": params, "state": state}
