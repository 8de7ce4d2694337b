"""Multi-chip training step: data-parallel batches + row-sharded embedding.

The jitted step is the SAME function as the single-chip trainer's — GSPMD
partitions it from the in/out shardings alone:
  * batch leading axis sharded over 'data' -> per-device microbatch; the
    loss mean and grads trigger psum over 'data' (inserted by XLA);
  * embedding table sharded P('model', None) -> the gather partitions into
    per-shard lookups + collective; its gradient scatter-add stays sharded;
  * all other params replicated.

This module wires shardings around aread_tpu.train.trainer's step; the
explicit shard_map lookup in embed_shard.py is the hand-tuned alternative
for when profiling shows GSPMD's choice suboptimal.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aread_tpu.models.base import gather_group, regularization_loss
from aread_tpu.parallel.mesh import batch_sharding, param_shardings, replicated
from aread_tpu.train.trainer import bce_with_logits, masked_mean


def shard_params(params, mesh: Mesh):
    """Place params on the mesh: tables row-sharded, rest replicated."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, s), params, shardings), shardings


def make_sharded_train_step(model, optimizer, mesh: Mesh, reg_rules,
                            is_multi_tower: bool,
                            embed_lookup: str = "gspmd",
                            a2a_capacity: int | None = None):
    """Build a pjit-ed train step with explicit input shardings.

    embed_lookup: 'gspmd' (default — XLA partitions the plain gather) or
      'a2a' (explicit dedup + all-to-all exchange, embed_shard.a2a_lookup;
      a2a_capacity is its static per-owner bucket bound, see
      a2a_required_capacity).
    """
    if embed_lookup not in ("gspmd", "a2a"):
        raise ValueError(f"embed_lookup={embed_lookup!r}")
    from aread_tpu.ops.embedding import lookup_override
    from aread_tpu.parallel.embed_shard import a2a_lookup
    from contextlib import nullcontext
    from functools import partial

    def trace_ctx():
        if embed_lookup == "a2a":
            return lookup_override(
                partial(a2a_lookup, mesh=mesh, capacity=a2a_capacity))
        return nullcontext()

    bsh = batch_sharding(mesh)
    rep = replicated(mesh)

    def step(params, state, opt_state, batch, rng):
        def loss_fn(p):
            kwargs = {"train": True, "mask": batch["valid"]}
            if "group" in batch:
                kwargs["group"] = batch["group"]
            out, new_state = model.apply({"params": p, **state}, batch["x"],
                                         mutable=list(state.keys()),
                                         rngs={"dropout": rng}, **kwargs)
            logit = out["logit"]
            if is_multi_tower and logit.ndim == 2:
                logit = gather_group(logit, batch["group"])
            bce = masked_mean(bce_with_logits(logit, batch["y"]), batch["valid"])
            return bce + regularization_loss(p, reg_rules), new_state

        with trace_ctx():
            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, dict(new_state), new_opt_state, loss

    def place_batch(batch: Dict[str, np.ndarray]):
        return {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()}

    return jax.jit(step, donate_argnums=(0, 2)), place_batch
