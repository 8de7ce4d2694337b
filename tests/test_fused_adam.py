"""Pallas fused Adam kernel vs. pure-jnp and optax ground truths.

The kernel implements torch.optim.Adam semantics (decay folded into the
gradient before moment updates — reference run.py:830's
Adam(weight_decay=1e-8) plus the manual L2 term layer.py:96-112), which
must match the trainer's optax chain (train/trainer.make_optimizer).
Runs in interpret mode so it works on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aread_tpu.ops.pallas.fused_adam import fused_adam_update, reference_adam_update
from aread_tpu.train.trainer import make_optimizer


@pytest.mark.parametrize("shape", [(1000, 33), (128,), (7, 5, 3)])
def test_fused_adam_matches_reference(shape):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=shape), jnp.float32)
    m = jnp.asarray(rng.normal(size=shape) * 0.1, jnp.float32)
    v = jnp.asarray(np.abs(rng.normal(size=shape)) * 0.01, jnp.float32)
    g = jnp.asarray(rng.normal(size=shape), jnp.float32)
    t = jnp.asarray(3, jnp.int32)
    out = fused_adam_update(w, m, v, g, t, lr=1e-3, l2=1e-5, interpret=True)
    ref = reference_adam_update(w, m, v, g, t, lr=1e-3, l2=1e-5)
    for a, b in zip(out, ref):
        assert a.shape == shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_adam_matches_optax_chain():
    """Multi-step agreement with the trainer's optimizer on the same
    gradient stream (weight decay only; l2=0 so optax sees the same
    effective gradient)."""
    rng = np.random.default_rng(1)
    shape = (64, 16)
    lr, wd = 1e-2, 1e-8
    w = jnp.asarray(rng.normal(size=shape), jnp.float32)
    opt = make_optimizer(lr, wd)
    opt_state = opt.init(w)
    w_opt = w
    w_k = w
    m = jnp.zeros(shape, jnp.float32)
    v = jnp.zeros(shape, jnp.float32)
    for t in range(1, 5):
        g = jnp.asarray(rng.normal(size=shape), jnp.float32)
        updates, opt_state = opt.update(g, opt_state, w_opt)
        w_opt = optax.apply_updates(w_opt, updates)
        w_k, m, v = fused_adam_update(
            w_k, m, v, g, jnp.asarray(t, jnp.int32), lr=lr,
            weight_decay=wd, interpret=True)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_opt),
                               rtol=1e-5, atol=1e-6)
