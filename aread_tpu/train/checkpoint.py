"""Checkpoint / resume.

Reference behavior (run.py:459-484, 835-840): torch.save of {epoch,
state_dict, optimizer, best metrics, preprocess_path, domain_mask} on every
improvement; reload best for test; ``is_increment`` warm-starts from a
previous checkpoint.

Here: Orbax for the array pytrees (params / BN stats / opt_state), a JSON
sidecar for scalars, and .npy-packed HEMP domain masks + schedule state —
everything needed to resume an AREAD run mid-training (params, opt state,
masks, HEMP sigma/active%/candidate schedule, RNG key).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np

import orbax.checkpoint as ocp


def _mask_to_flat(domain_mask) -> Dict[str, np.ndarray]:
    out = {}
    for d, mask in enumerate(domain_mask):
        if mask is None:
            continue
        for li, m in enumerate(mask):
            out[f"d{d}_l{li}"] = np.asarray(m)
    return out


def _mask_from_flat(flat: Dict[str, np.ndarray], n_domain: int) -> List:
    masks: List[Optional[List[np.ndarray]]] = [None] * n_domain
    for d in range(n_domain):
        levels = sorted((k for k in flat if k.startswith(f"d{d}_l")),
                        key=lambda k: int(k.split("_l")[1]))
        if levels:
            masks[d] = [np.asarray(flat[k]).astype(bool) for k in levels]
    return masks


def save_checkpoint(path: str, params, state, opt_state,
                    epoch: int, best_result: Optional[Dict] = None,
                    domain_mask=None, hemp_schedule: Optional[Dict] = None,
                    rng_key=None, spec=None, run_config=None,
                    n_domain: Optional[int] = None):
    """Write a full training checkpoint to ``path`` (a directory).

    ``spec`` (a models.base.FeatureSpec) and ``run_config`` (a
    config.Config) are serialized into meta.json so serving can rebuild
    the exact model from the checkpoint alone (serve.load_predictor) —
    the reference stores ``preprocess_path`` for the same purpose
    (run.py:466)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    tree: Dict[str, Any] = {
        "params": jax.tree_util.tree_map(np.asarray, params),
        "state": jax.tree_util.tree_map(np.asarray, state),
        "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
    }
    if rng_key is not None:
        tree["rng_key"] = np.asarray(rng_key)
    if domain_mask is not None:
        tree["domain_mask"] = _mask_to_flat(domain_mask)
    # crash-safe write (a crash mid-save is exactly what elastic recovery
    # exists for): save arrays into a tmp sibling, then atomically swap it
    # in; meta.json is written LAST so a surviving meta always describes
    # complete arrays
    import shutil
    arrays_dir = os.path.join(path, "arrays")
    tmp_dir = os.path.join(path, "arrays.tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    ckptr.save(tmp_dir, tree)
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        os.unlink(meta_path)  # old meta must not describe swapped arrays
    shutil.rmtree(arrays_dir, ignore_errors=True)
    os.replace(tmp_dir, arrays_dir)
    meta = {"epoch": epoch}
    if n_domain is not None:
        meta["n_domain"] = int(n_domain)
    if best_result is not None:
        meta["best_result"] = {
            k: (float(v) if isinstance(v, (int, float, np.floating)) else None)
            for k, v in best_result.items() if not isinstance(v, dict)}
    if hemp_schedule is not None:
        meta["hemp_schedule"] = hemp_schedule
    if spec is not None:
        import dataclasses
        meta["spec"] = {k: (list(v) if isinstance(v, tuple) else v)
                        for k, v in dataclasses.asdict(spec).items()}
    if run_config is not None:
        import dataclasses
        meta["config"] = {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in dataclasses.asdict(run_config).items()
            if isinstance(v, (int, float, str, bool, tuple, list,
                              type(None)))}
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)


def mask_template(n_tower, n_domain: int) -> Dict[str, np.ndarray]:
    """Flat domain-mask pytree template (all domains, all levels) for
    structure-exact orbax restore."""
    from aread_tpu.utils.masks import mask_shapes
    shapes = mask_shapes(n_tower)
    return {f"d{d}_l{li}": np.zeros(s, bool)
            for d in range(n_domain) for li, s in enumerate(shapes)}


def load_checkpoint(path: str, n_domain: Optional[int] = None,
                    template: Optional[Dict] = None) -> Dict:
    """``template``: optional pytree with the exact saved structure (e.g.
    {"params": ..., "opt_state": ...}); orbax then restores tuples /
    NamedTuples (optimizer states) natively instead of as nested dicts —
    required when resuming mid-training with an optimizer state."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    arrays_dir = os.path.join(path, "arrays")
    if template is not None:
        tree = ckptr.restore(arrays_dir, item=jax.tree_util.tree_map(
            np.asarray, template))
    else:
        tree = ckptr.restore(arrays_dir)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    out = dict(meta)
    out["params"] = tree["params"]
    out["state"] = tree.get("state", {})
    out["opt_state"] = tree.get("opt_state")
    if "rng_key" in tree:
        out["rng_key"] = tree["rng_key"]
    if "domain_mask" in tree and n_domain is not None:
        out["domain_mask"] = _mask_from_flat(tree["domain_mask"], n_domain)
    return out
