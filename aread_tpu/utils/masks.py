"""HEMP mask machinery — pure numpy on host.

The reference keeps per-domain boolean edge masks as lists of torch tensors
mutated on the module (aread.py:324-638). Masks are tiny ((1,3),(3,6),
(6,12),(12,1) for g=3), so all generation/validation/pruning runs on host
in numpy; the jitted forward receives them as static-shape runtime bool
arrays (no recompilation across mask updates).

Reproduced semantics, each citing its reference source:
  * create_single_full_mask       aread.py:548-568
  * validate_mask (worklist)      aread.py:570-605
  * generate_mask modes rand / mask_norm_rand / max_gate /
    max_gate_norm_rand / mask_max_gate        aread.py:432-532
  * prune (quantile threshold AND, revert-if-dead)  aread.py:357-381
  * gate-value accumulation + threshold       aread.py:383-430
  * best-candidate selection                  aread.py:330-355
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

Mask = List[np.ndarray]  # [1,T0], [T0,T1], ..., [T_last,1] boolean arrays


def mask_shapes(n_tower: Sequence[int]) -> List[Tuple[int, int]]:
    shapes = [(1, n_tower[0])]
    for l in range(1, len(n_tower)):
        shapes.append((n_tower[l - 1], n_tower[l]))
    shapes.append((n_tower[-1], 1))
    return shapes


def edge_num(n_tower: Sequence[int]) -> int:
    return int(sum(a * b for a, b in mask_shapes(n_tower)))


def count_active_edge(mask: Mask) -> int:
    return int(sum(int(np.sum(m)) for m in mask))


def create_single_full_mask(n_tower: Sequence[int], fill_value: float,
                            rng: np.random.Generator) -> Mask:
    """aread.py:548-568: all-zero / all-one / Bernoulli(fill_value) masks."""
    shapes = mask_shapes(n_tower)
    if fill_value == 0:
        return [np.zeros(s, bool) for s in shapes]
    if fill_value == 1:
        return [np.ones(s, bool) for s in shapes]
    if 0 < fill_value < 1:
        return [rng.random(s) < fill_value for s in shapes]
    raise ValueError("fill_value in mask must be 0 or 1 or (0, 1)")


def validate_mask(mask: Mask, add_input: bool = True, add_output: bool = True,
                  remove_hidden: bool = True) -> Mask:
    """Graph-consistency repair (aread.py:570-605): add input edges for live
    level-0 towers, add output edges for live leaves, iteratively sever
    hidden towers with no in- or out-edges (worklist)."""
    mask = [m.copy() for m in mask]
    n_level = len(mask) - 1
    n_tower = [m.shape[1] for m in mask[:-1]]
    if add_input:
        for t in range(n_tower[0]):
            if mask[1][t, :].any():
                mask[0][:, t] = True
    if add_output:
        for t in range(n_tower[-1]):
            if mask[-2][:, t].any():
                mask[-1][t, :] = True
    if remove_hidden:
        to_check = [(l, t) for l in range(1, n_level) for t in range(n_tower[l])]
        while to_check:
            l, t = to_check.pop(0)
            if not mask[l][:, t].any():
                mask[l + 1][t, :] = False
            if not mask[l + 1][t, :].any():
                if l > 1:
                    for prev_t in np.nonzero(mask[l][:, t])[0].tolist():
                        if (l - 1, prev_t) not in to_check:
                            to_check.append((l - 1, prev_t))
                mask[l][:, t] = False
    return mask


def has_output(mask: Mask) -> bool:
    return bool(mask[-1].any())


def validate_mask_jax(mask):
    """Device-side validate_mask on a tuple of bool jnp arrays: identical
    fixpoint as the host worklist (the removal operator is monotone, so
    processing order does not change the result; sweeps are bounded by the
    total tower count). Used inside the fused fast-adapt scan
    (train/hemp.py) so HEMP candidate pruning never leaves the device."""
    import jax
    import jax.numpy as jnp

    m = list(mask)
    n_level = len(m) - 1
    # add input edges for live level-0 towers (aread.py:573-576)
    m[0] = m[0] | m[1].any(axis=1)[None, :]
    # add output edges for live leaves (aread.py:578-581)
    m[-1] = m[-1] | m[-2].any(axis=0)[:, None]

    def sweep(_, mm):
        mm = list(mm)
        for l in range(1, n_level):
            has_in = mm[l].any(axis=0)           # [T_l]
            mm[l + 1] = mm[l + 1] & has_in[:, None]
            has_out = mm[l + 1].any(axis=1)      # [T_l]
            mm[l] = mm[l] & has_out[None, :]
        return tuple(mm)

    total = sum(int(x.shape[1]) for x in m[:-1])
    return jax.lax.fori_loop(0, total, sweep, tuple(m))


def prune_mask_jax(mask, gate_means, prun_ratio: float = 0.05):
    """Device-side prun_single_mask (aread.py:357-381): threshold the
    step's masked gate values at quantile(prun_ratio) over positive
    entries (np.quantile 'linear' semantics), AND into the hidden-level
    masks, validate, revert if the output dies or no positive gate value
    exists anywhere."""
    import jax
    import jax.numpy as jnp

    threshold = jnp.float32(jnp.inf)
    any_pos = jnp.bool_(False)
    for gv in gate_means:
        flat = jnp.sort(gv.reshape(-1))          # non-positives first
        n = flat.shape[0]
        npos = jnp.sum(flat > 1e-8)
        any_pos = any_pos | (npos > 0)
        start = n - npos
        q = prun_ratio * (npos - 1).astype(jnp.float32)
        lo = jnp.clip(jnp.floor(q).astype(jnp.int32), 0, n - 1)
        frac = q - lo.astype(jnp.float32)
        a = flat[jnp.clip(start + lo, 0, n - 1)]
        b = flat[jnp.clip(start + lo + 1, 0, n - 1)]
        lvl = jnp.where(npos > 0,
                        jnp.where(lo + 1 < npos, a * (1 - frac) + b * frac, a),
                        jnp.float32(jnp.inf))
        threshold = jnp.minimum(threshold, lvl)

    new = list(mask)
    for li, gv in enumerate(gate_means):
        new[li + 1] = new[li + 1] & (gv >= threshold)
    valid = validate_mask_jax(tuple(new))
    keep = any_pos & valid[-1].any()
    return tuple(jnp.where(keep, v, o) for v, o in zip(valid, mask))


def cluster_domain_masks(cluster_z: np.ndarray, n_tower: Sequence[int],
                         n_domain: int):
    """Initialize per-domain masks from a hierarchical-clustering linkage
    matrix (reference create_domain_mask, aread.py:607-638).

    ``cluster_z`` is a scipy-style linkage matrix: row i merges clusters
    ``int(z[i,0])`` and ``int(z[i,1])`` into new cluster ``n_domain + i``.
    Walking the merges from n_domain clusters down to n_tower[0], whenever
    the number of live clusters equals some level's tower count, those
    clusters become that level's towers; each domain then activates the
    outgoing edges of every tower whose cluster contains it, and
    validate_mask repairs input/output edges.

    Returns (masks, tower2cluster) where masks[d] is a valid Mask and
    tower2cluster[l][t] is the list of domain ids managed by tower t of
    level l.
    """
    n_tower = tuple(int(t) for t in n_tower)
    n_level = len(n_tower)
    shapes = mask_shapes(n_tower)
    masks: List[Mask] = [[np.zeros(s, bool) for s in shapes]
                         for _ in range(n_domain)]
    clusters: List[List[int]] = [[i] for i in range(n_domain)]
    cluster_exist: List[int] = list(range(n_domain))
    tower2cluster: List[Optional[List[int]]] = [None] * n_level
    # deviation from the reference (which only checks after each merge,
    # aread.py:624-625): if n_domain itself equals a level's tower count,
    # the identity clustering is that level's assignment
    if n_domain in n_tower:
        tower2cluster[n_tower.index(n_domain)] = list(cluster_exist)
    n_merge = n_domain - n_tower[0]
    if len(cluster_z) < n_merge:
        raise ValueError(
            f"linkage matrix has {len(cluster_z)} rows; need at least "
            f"{n_merge} (= n_domain - n_tower[0]) to reach {n_tower[0]} clusters")
    for i in range(n_merge):
        line = cluster_z[i]
        clusters.append(clusters[int(line[0])] + clusters[int(line[1])])
        cluster_exist.append(i + n_domain)
        cluster_exist.remove(int(line[0]))
        cluster_exist.remove(int(line[1]))
        if len(cluster_exist) in n_tower:
            tower2cluster[n_tower.index(len(cluster_exist))] = list(cluster_exist)
    for l in range(n_level):
        if tower2cluster[l] is None:
            raise ValueError(
                f"clustering never passed through {n_tower[l]} clusters for "
                f"level {l} (n_domain={n_domain}, n_tower={n_tower})")
    t2c_domains: List[List[List[int]]] = []
    for l in range(n_level):
        level_clusters = []
        for t in range(n_tower[l]):
            domain_cluster = clusters[tower2cluster[l][t]]
            level_clusters.append(list(domain_cluster))
            for d in domain_cluster:
                # outgoing edges of level-l tower t live in mask[l+1]
                masks[d][l + 1][t, :] = True
        t2c_domains.append(level_clusters)
    valid = [validate_mask(m) for m in masks]
    return valid, t2c_domains


@dataclasses.dataclass
class GateAccumulator:
    """Per-domain accumulation of mean gate values (the reference's
    domain_tower_gate_values lists, aread.py:383-430). Each record is a
    tuple of [T_{l-1}, T_l] matrices for levels 1..n_level-1."""

    n_tower: Tuple[int, ...]

    def __post_init__(self):
        self.reset()

    def reset(self):
        self._records: List[Tuple[np.ndarray, ...]] = []

    def add(self, gate_means: Sequence[np.ndarray]):
        self._records.append(tuple(np.asarray(g) for g in gate_means))

    def __len__(self):
        return len(self._records)

    def mean_values(self) -> List[np.ndarray]:
        """Level-indexed list: zeros for level 0 and the output level,
        mean-over-records matrices for levels 1..n_level-1
        (mean_domain_tower_gate_values, aread.py:403-423). A domain with no
        records yields all-zero matrices — the threshold then comes out
        None and mask generation falls back to 'rand', exactly the
        reference's no-gate-values path (aread.py:413-415, 504-507)."""
        n_level = len(self.n_tower)
        values = [np.zeros((1, self.n_tower[0]), np.float32)]
        for li in range(n_level - 1):
            if self._records:
                stacked = np.stack([r[li] for r in self._records], axis=0)
                values.append(stacked.mean(axis=0))
            else:
                values.append(np.zeros((self.n_tower[li], self.n_tower[li + 1]),
                                       np.float32))
        values.append(np.zeros((self.n_tower[-1], 1), np.float32))
        return values


def gate_threshold(mean_values: List[np.ndarray],
                   active_percent: float) -> Optional[float]:
    """Quantile(1 - active_percent) over positive mid-level gate means
    (aread.py:425-430). None if no positive values."""
    threshold = 1.0
    for ts in mean_values[1:-1]:
        pos = ts[ts > 1e-8]
        if pos.size:
            threshold = min(threshold, float(np.quantile(pos.ravel(), 1 - active_percent)))
    return None if threshold == 1.0 else threshold


class HempMaskState:
    """Host-side HEMP state for all domains: current masks, candidates,
    gate accumulators and eval losses (reference AREAD attributes
    domain_mask / candidate_domain_mask / domain_tower_gate_values /
    eval_loss, aread.py:61-68, reset at aread.py:383-401)."""

    def __init__(self, n_tower: Sequence[int], n_domain: int, seed: int = 0):
        self.n_tower = tuple(int(t) for t in n_tower)
        self.n_domain = n_domain
        self.rng = np.random.default_rng(seed)
        self.edge_num = edge_num(n_tower)
        self.domain_mask: List[Optional[Mask]] = [None] * n_domain
        self.reset_for_mask_update()
        # per-fast-adapt-step gate values (tmp_tower_gate_values)
        self.tmp_gate_record: Optional[Tuple[np.ndarray, ...]] = None

    def reset_for_mask_update(self, d: Optional[int] = None):
        if d is None:
            self.gate_acc = [GateAccumulator(self.n_tower) for _ in range(self.n_domain)]
            self.gate_value_threshold: List[Optional[float]] = [None] * self.n_domain
            self.candidate_domain_mask: List[List[Mask]] = [[] for _ in range(self.n_domain)]
            self.eval_loss: List[List[List[float]]] = [[] for _ in range(self.n_domain)]
        else:
            self.gate_acc[d] = GateAccumulator(self.n_tower)
            self.gate_value_threshold[d] = None
            self.candidate_domain_mask[d] = []
            self.eval_loss[d] = []

    # ------------------------------------------------------------ recording
    def record_gates(self, d: int, gate_means: Sequence[np.ndarray]):
        self.gate_acc[d].add(gate_means)

    def record_tmp_gates(self, gate_means: Sequence[np.ndarray], current_mask: Mask):
        """Record a single fast-adapt step's gate values (masked), the
        reference's tmp_memory_gate_value path (aread.py:290-292)."""
        rec = []
        for li, g in enumerate(gate_means):
            rec.append(np.asarray(g))  # already masked in the forward
        self.tmp_gate_record = tuple(rec)

    def add_eval_loss(self, loss_mean: float, d: int, mask_z: int):
        """aread.py:324-328."""
        if len(self.eval_loss[d]) <= mask_z:
            self.eval_loss[d].append([loss_mean])
        else:
            self.eval_loss[d][mask_z].append(loss_mean)

    # ----------------------------------------------------------- generation
    def generate_mask(self, generate_mode: str, d: int,
                      init_active_percent: float = 0.7,
                      random_modify_sigma: float = 0.2) -> Mask:
        rng = self.rng
        if generate_mode == "rand":
            while True:
                mask = create_single_full_mask(self.n_tower, init_active_percent, rng)
                valid = validate_mask(mask)
                if has_output(valid):
                    return valid
        if generate_mode == "mask_norm_rand":
            original = [m.copy() for m in self.domain_mask[d]]
            active = count_active_edge(original)
            while True:
                rand_percent = min(1.0, abs(rng.normal(0, random_modify_sigma)))
                mask = []
                for m in original:
                    r = rng.random(m.shape) < rand_percent
                    mask.append((m | r) if active < self.edge_num * rand_percent else (m ^ r))
                valid = validate_mask(mask)
                if has_output(valid) and any(
                        not np.array_equal(valid[l], original[l]) for l in range(len(original))):
                    return valid
        if generate_mode in ("max_gate", "max_gate_norm_rand", "mask_max_gate"):
            mean_values = self.gate_acc[d].mean_values()
            thr = gate_threshold(mean_values, init_active_percent)
            self.gate_value_threshold[d] = thr
            if thr is None:
                prun_mask = self.generate_mask("rand", d, init_active_percent,
                                               random_modify_sigma)
            else:
                prun_mask = [mv >= thr for mv in mean_values]
            if generate_mode == "max_gate":
                valid = validate_mask(prun_mask)
                if not has_output(valid):
                    raise ValueError(f"max_gate mask for domain {d} has no output")
                return valid
            if generate_mode == "max_gate_norm_rand":
                rand_percent = min(1.0, abs(rng.normal(0, random_modify_sigma)))
                while True:
                    mask = [m ^ (rng.random(m.shape) < rand_percent) for m in prun_mask]
                    valid = validate_mask(mask)
                    if has_output(valid):
                        return valid
            # mask_max_gate (the mode the trainer uses, run.py:628)
            rand_percent = min(1.0, abs(rng.normal(0, random_modify_sigma)))
            origin = self.domain_mask[d] if self.domain_mask[d] is not None else prun_mask
            is_nor = (count_active_edge(origin) / self.edge_num) > init_active_percent
            while True:
                mask = []
                for om, pm in zip(origin, prun_mask):
                    r = rng.random(om.shape) < rand_percent
                    base = om | pm
                    mask.append((base ^ r) if is_nor else (base | r))
                valid = validate_mask(mask)
                if has_output(valid) and any(
                        not np.array_equal(valid[l], origin[l]) for l in range(len(origin))):
                    return valid
        raise ValueError(f"unknown generate_mode {generate_mode}")

    # -------------------------------------------------------------- pruning
    def prun_single_mask(self, d: int, current_mask: Mask,
                         prun_ratio: float = 0.05) -> Mask:
        """Progressive pruning during fast adaptation (aread.py:357-381):
        threshold the last recorded step's gate values at quantile
        prun_ratio, AND into the mask, revert if the output dies."""
        if self.tmp_gate_record is None:
            raise ValueError("no tmp gate record for pruning")
        gate_values = list(self.tmp_gate_record)  # [T_{l-1}, T_l] per level
        threshold = 1.0
        for gv in gate_values:
            pos = gv[gv > 1e-8]
            if pos.size:
                threshold = min(threshold, float(np.quantile(pos.ravel(), prun_ratio)))
        if threshold == 1.0:
            raise ValueError("no valid tmp_tower_gate_values in candidate mask")
        before = [m.copy() for m in current_mask]
        new_mask = [m.copy() for m in current_mask]
        for li, gv in enumerate(gate_values):
            new_mask[li + 1] = new_mask[li + 1] & (gv >= threshold)
        valid = validate_mask(new_mask)
        self.tmp_gate_record = None
        return valid if has_output(valid) else before

    # ------------------------------------------------------------ selection
    def update_all_mask(self) -> None:
        """Pick the lowest-mean-eval-loss candidate per domain
        (aread.py:330-343)."""
        for d in range(self.n_domain):
            if not self.candidate_domain_mask[d]:
                continue
            loss_means = [float(np.mean(losses)) for losses in self.eval_loss[d]]
            best = int(np.argmin(loss_means))
            self.domain_mask[d] = self.candidate_domain_mask[d][best]

    def current_active_ratio(self) -> float:
        """aread.py:664-669."""
        total = 0.0
        for d in range(self.n_domain):
            if self.domain_mask[d] is not None:
                total += count_active_edge(self.domain_mask[d]) / self.edge_num
        return total / self.n_domain

    def init_full_masks(self):
        shapes = mask_shapes(self.n_tower)
        for d in range(self.n_domain):
            self.domain_mask[d] = [np.ones(s, bool) for s in shapes]

    def init_cluster_masks(self, cluster_z: np.ndarray):
        """Cluster-based mask initialization (reference create_domain_mask,
        aread.py:607-638; the optional init commented out at run.py:451-453).
        Returns tower2cluster (domain lists per level/tower)."""
        masks, tower2cluster = cluster_domain_masks(
            cluster_z, self.n_tower, self.n_domain)
        self.domain_mask = masks
        return tower2cluster
