"""Dynamic domain->group regrouping utilities.

Functional counterparts of the reference's ``Run.regroup_all_domain`` and
``Run.get_losses_tower_domain`` (run.py:514-550). In the reference these
are DEAD code — ``train_loss_domain_group`` is allocated (run.py:73) but
never populated, and nothing calls either method — yet they are public
trainer surface, so they exist here as tested host-side pure functions
that any schedule can call with a measured loss matrix.

Both operate on numpy; the loss matrix is tiny ([n_tower, n_domain]) and
the assignment logic is branch-heavy host work, exactly what should NOT
live under jit.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def get_losses_tower_domain(pred: np.ndarray, y: np.ndarray,
                            domains: np.ndarray, n_tower: int,
                            n_domain: int) -> np.ndarray:
    """Per-(tower, domain) mean BCE of multi-tower predictions.

    Reproduces run.py:539-550: pred [B, n_tower] are probabilities (the
    reference criterion is BCELoss on sigmoid outputs); a domain with no
    rows yields NaN, exactly like torch's mean over an empty mask.
    """
    pred = np.asarray(pred, np.float64)
    y = np.asarray(y, np.float64).reshape(-1)
    domains = np.asarray(domains).reshape(-1)
    eps = 1e-12  # torch BCELoss clamps log at -100; eps keeps finiteness
    p = np.clip(pred, eps, 1.0 - eps)
    bce = -(y[:, None] * np.log(p) + (1.0 - y[:, None]) * np.log(1.0 - p))
    out = np.full((n_tower, n_domain), np.nan)
    for d in range(n_domain):
        mask = domains == d
        if mask.any():
            out[:, d] = bce[mask].mean(axis=0)
    return out


def regroup_all_domain(train_loss_domain_group: np.ndarray,
                       regroup_mode: Sequence[str] = ("towerfirst",),
                       selected_domain: Optional[Sequence[int]] = None
                       ) -> np.ndarray:
    """Reassign every domain to a tower group from a loss matrix.

    Reproduces run.py:514-537:
      * 'served'     — pin each tower's previously selected domain first;
      * 'besttower'  — each unassigned domain takes its argmin-loss tower;
      * 'towerfirst' — each tower first claims its best domain (if still
        free), then remaining domains take their own best tower.
    Modes compose exactly as the reference's if/elif chain: 'served' is a
    prefix step; 'besttower' takes precedence over 'towerfirst'.
    """
    loss = np.asarray(train_loss_domain_group, np.float64)
    n_tower, n_domain = loss.shape
    domain2group = np.full(n_domain, -1, np.int64)
    if "served" in regroup_mode:
        if selected_domain is None:
            raise ValueError("'served' mode needs selected_domain")
        for g in range(n_tower):
            domain2group[selected_domain[g]] = g
    if "besttower" in regroup_mode:
        for d in range(n_domain):
            if domain2group[d] < 0:
                domain2group[d] = int(np.argmin(loss[:, d]))
    elif "towerfirst" in regroup_mode:
        for g in range(n_tower):
            best_d4g = int(np.argmin(loss[g, :]))
            if domain2group[best_d4g] < 0:
                domain2group[best_d4g] = g
        for d in range(n_domain):
            if domain2group[d] < 0:
                domain2group[d] = int(np.argmin(loss[:, d]))
    assert np.all(domain2group >= 0), "all domains must be grouped"
    return domain2group
