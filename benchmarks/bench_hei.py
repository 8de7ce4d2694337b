"""Measure the dense-masked HEI forward/backward vs what a block-skipping
Pallas kernel could save (VERDICT r1 item 4 — numbers, not assertions).

The claim to test (models/aread.py design note): at the reference topology
(3, 6, 12) the HEI tower stack is so small that computing ALL towers
densely and masking (static shapes, zero recompiles, MXU-friendly stacked
einsums) beats skipping pruned blocks. A Pallas block-skip kernel cannot
beat the measurement floor established here: a dense run on a topology
SHRUNK to the mask's active tower count is a strict UPPER bound on
block-skipping's win (the kernel still pays gather/scatter of ragged
active sets, pipeline bubbles, and a second compiled variant per mask
shape — the shrunk topology pays none of that).

Measures, per topology {(3,6,12) reference, (12,24,48) 4x}:
  dense_full      fwd+bwd, all edges active (warm-up phase shape)
  dense_masked    fwd+bwd, ~35%-active valid mask (HEMP steady state;
                  same FLOPs as dense_full by construction — asserts the
                  mask itself costs nothing)
  skip_bound      fwd+bwd on topology scaled to the active fraction —
                  the unreachable best case for a skipping kernel

Run on the real TPU: python benchmarks/bench_hei.py
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def measure(model, spec, x, y, dm, n_steps=30):
    import jax
    import jax.numpy as jnp

    from aread_tpu.models.base import regularization_loss
    from aread_tpu.train.trainer import bce_with_logits, masked_mean

    valid = jnp.ones((x.shape[0],), jnp.float32)
    variables = jax.jit(
        lambda r, xx: model.init({"params": r, "dropout": r}, xx,
                                 mode="wo_mask"))(jax.random.PRNGKey(0), x)
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, rng):
        out, _ = model.apply(
            {"params": p, **state}, x, domain_mask=dm,
            mode="domain_mask_bagging", train=True, mask=valid,
            mutable=list(state.keys()), rngs={"dropout": rng})
        per_leaf = jax.vmap(
            lambda lg: masked_mean(bce_with_logits(lg, y), valid),
            in_axes=1)(out["leaf_logit"])
        la = out["leaf_active"].astype(per_leaf.dtype)
        return jnp.sum(per_leaf * la) / jnp.maximum(la.sum(), 1e-8)

    def one(carry, rng):
        p, acc = carry
        l, g = jax.value_and_grad(loss_fn)(p, rng)
        # consume the grads so nothing is dead-code-eliminated
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)
        return (p, acc + l), ()

    @jax.jit
    def run(p, keys):
        (p, acc), _ = jax.lax.scan(one, (p, jnp.zeros(())), keys)
        return p, acc

    keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
    p, acc = run(params, keys)
    _ = float(acc)  # sync (block_until_ready returns early on the tunnel)
    t0 = time.perf_counter()
    p, acc = run(p, keys)
    _ = float(acc)
    return (time.perf_counter() - t0) / n_steps * 1e3  # ms/step


def main():
    import jax.numpy as jnp

    from aread_tpu.models.aread import AREAD, full_mask
    from aread_tpu.models.base import FeatureSpec
    from aread_tpu.utils.masks import HempMaskState

    bs, embed_dim = 1024, 32
    spec = FeatureSpec(
        one_hot_dims=(1368287, 7, 25, 40, 11, 150000, 12),
        n_seq_fields=2, itemid_idx=0, domain_idx=2, seq_maxlen=5
    ).with_flat_table(embed_dim)
    rng = np.random.default_rng(0)
    cols = [rng.integers(0, d, size=(bs, 1)) for d in spec.one_hot_dims]
    seqs = rng.integers(0, spec.one_hot_dims[0], size=(bs, 10))
    x = jnp.asarray(np.concatenate(cols + [seqs], axis=1).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 2, size=bs).astype(np.float32))

    def build(towers, tower_dims):
        return AREAD(spec=spec, embed_dim=embed_dim, n_tower=towers,
                     n_domain=25, base_model="mmoe",
                     expert_dims=(256, 128, 64), tower_dims=tower_dims,
                     mmoe_n_expert=4)

    active = 0.35
    topos = {
        "ref_3_6_12": ((3, 6, 12), ((64, 32), (32, 16), (16, 8))),
        "4x_12_24_48": ((12, 24, 48), ((64, 32), (32, 16), (16, 8))),
    }
    for name, (towers, tdims) in topos.items():
        model = build(towers, tdims)
        full = tuple(jnp.asarray(m) for m in full_mask(towers))
        ms = HempMaskState(towers, 25, seed=0)
        masked = tuple(jnp.asarray(np.asarray(m)) for m in ms.generate_mask(
            "rand", 0, init_active_percent=active, random_modify_sigma=0.0))
        skip_towers = tuple(max(1, int(round(t * active))) for t in towers)
        skip_model = build(skip_towers, tdims)
        skip_full = tuple(jnp.asarray(m) for m in full_mask(skip_towers))

        t_full = measure(model, spec, x, y, full)
        t_masked = measure(model, spec, x, y, masked)
        t_skip = measure(skip_model, spec, x, y, skip_full)
        print(json.dumps({
            "topology": name, "towers": towers,
            "dense_full_ms": round(t_full, 3),
            "dense_masked_ms": round(t_masked, 3),
            "skip_bound_ms": round(t_skip, 3),
            "skip_towers": skip_towers, "active_frac": active,
            "max_possible_saving_ms": round(t_masked - t_skip, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
