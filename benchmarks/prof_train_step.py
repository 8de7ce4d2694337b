"""Profile breakdown of the bench step: fp32 vs bf16, fwd / fwd+bwd / full."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json, time
from functools import partial
import numpy as np

import jax
import jax.numpy as jnp

from aread_tpu.models.aread import AREAD, full_mask
from aread_tpu.models.base import FeatureSpec, regularization_loss
from aread_tpu.train.trainer import (bce_with_logits, embedding_flat_ids,
                                     hybrid_init, hybrid_update_sparse,
                                     make_optimizer, masked_mean,
                                     merge_table, perturbation_zeros,
                                     split_table, split_variables,
                                     strip_table_rule, table_reg_value,
                                     matmul_precision_ctx)

bs, embed_dim = 1024, 32
spec = FeatureSpec(
    one_hot_dims=(1368287, 7, 25, 40, 11, 150000, 12),
    n_seq_fields=2, itemid_idx=0, domain_idx=2, seq_maxlen=5)
spec = spec.with_flat_table(embed_dim)
n_domain = 25
model = AREAD(spec=spec, embed_dim=embed_dim, n_tower=(3, 6, 12),
              n_domain=n_domain, base_model="mmoe",
              expert_dims=(256, 128, 64),
              tower_dims=((64, 32), (32, 16), (16, 8)), mmoe_n_expert=4)

rng = np.random.default_rng(0)
cols = [rng.integers(0, d, size=(bs, 1)) for d in spec.one_hot_dims]
seqs = rng.integers(0, spec.one_hot_dims[0], size=(bs, 10))
x = jnp.asarray(np.concatenate(cols + [seqs], axis=1).astype(np.int32))
y = jnp.asarray(rng.integers(0, 2, size=bs).astype(np.float32))
valid = jnp.ones((bs,), jnp.float32)
dm = tuple(jnp.asarray(m) for m in full_mask(model.n_tower))

variables = jax.jit(
    lambda r, xx: model.init({"params": r, "dropout": r}, xx, mode="wo_mask")
)(jax.random.PRNGKey(0), x)
params0, state0 = split_variables(variables)
optimizer = make_optimizer(1e-3)
opt_state0 = hybrid_init(optimizer, params0)
reg_rules = strip_table_rule(type(model).REG_RULES)
n_steps = 50


def build(mode, dtype):
    def one_step(carry, rng):
        params, state, opt_state = carry
        table, rest = split_table(params)

        def loss_fn(rest_p, pert):
            out, new_state = model.apply(
                {"params": merge_table(rest_p, table), "perturbations": pert,
                 **state}, x, domain_mask=dm,
                mode="domain_mask_bagging", train=True, mask=valid,
                mutable=list(state.keys()), rngs={"dropout": rng})
            per_leaf = jax.vmap(
                lambda lg: masked_mean(bce_with_logits(lg, y), valid),
                in_axes=1)(out["leaf_logit"])
            la = out["leaf_active"].astype(per_leaf.dtype)
            bce = jnp.sum(per_leaf * la) / jnp.maximum(la.sum(), 1e-8)
            loss = bce + regularization_loss(rest_p, reg_rules) \
                + table_reg_value(table)
            return loss, new_state

        pert0 = perturbation_zeros(spec, x, embed_dim)
        if mode == "fwd":
            loss, new_state = loss_fn(rest, pert0)
            return (params, dict(new_state), opt_state), loss
        (loss, new_state), (g_rest, g_pert) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(rest, pert0)
        if mode == "fwdbwd":
            leaves = jax.tree.leaves((g_rest, g_pert))
            loss = loss + sum(jnp.sum(l) * 0.0 for l in leaves)
            return (params, dict(new_state), opt_state), loss
        ids = embedding_flat_ids(spec, x)
        new_params, new_opt_state = hybrid_update_sparse(
            optimizer, 1e-3, 1e-8, params, g_rest, ids,
            g_pert["embedding"]["rows"], opt_state,
            table_shape=(int(np.sum(spec.one_hot_dims)), embed_dim))
        return (new_params, dict(new_state), new_opt_state), loss

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def run_steps(params, state, opt_state, keys):
        with matmul_precision_ctx(dtype):
            (params, state, opt_state), losses = jax.lax.scan(
                one_step, (params, state, opt_state), keys)
        return params, state, opt_state, losses[-1]
    return run_steps


for dtype in ("float32", "bfloat16"):
    for mode in ("fwd", "fwdbwd", "full"):
        run = build(mode, dtype)
        p = jax.tree.map(jnp.copy, params0)
        s = jax.tree.map(jnp.copy, state0)
        o = jax.tree.map(jnp.copy, opt_state0)
        keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
        p, s, o, loss = run(p, s, o, keys)
        _ = float(loss)
        keys = jax.random.split(jax.random.PRNGKey(2), n_steps)
        t0 = time.perf_counter()
        p, s, o, loss = run(p, s, o, keys)
        _ = float(loss)
        dt = time.perf_counter() - t0
        print(f"{dtype:9s} {mode:7s} {dt/n_steps*1e3:7.3f} ms/step "
              f"{bs*n_steps/dt:10.0f} ex/s")
