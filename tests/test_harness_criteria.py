"""select_hyperparameter criteria coverage (rmse / mse / fooling_rate)."""

import numpy as np
import pytest

from dl_attack_on_imagenet_tpu import evaluation as ev


class FakeAttack:
    """Deterministic attack stub with a controllable perturbation size."""

    def __init__(self, victim, scale):
        self.scale = scale
        self.victim = victim

    def __call__(self, x, y):
        import jax.numpy as jnp

        return jnp.clip(jnp.asarray(x) + self.scale, 0, 1)


@pytest.fixture(scope="module")
def victim():
    import jax

    from dl_attack_on_imagenet_tpu.models import create_model

    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def loader(victim):
    import jax

    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3)))
    y = np.asarray(victim.predict(x))
    return [(x, y)]


@pytest.mark.parametrize("criterion", ["rmse", "mse", "fooling_rate"])
def test_criteria_select_an_index(victim, loader, criterion):
    atks = {"fake": [FakeAttack(victim, 0.01), FakeAttack(victim, 0.2)]}
    selected, perf, validation = ev.select_hyperparameter(
        atks, victim, loader, budget=[0.5], criterion=criterion
    )
    key = next(iter(perf[0]["mse"]))
    assert len(selected[0][key]) == 1
    assert np.isfinite(perf[0]["mse"][key])


def test_mse_criterion_picks_closest(victim, loader):
    small, big = FakeAttack(victim, 0.01), FakeAttack(victim, 0.2)
    atks = {"fake": [small, big]}
    _, _, validation = ev.select_hyperparameter(
        atks, victim, loader, budget=[0.0], criterion="mse"
    )
    key = next(iter(validation["mse"]))
    mses = validation["mse"][key]
    assert mses[0] < mses[1]  # sanity: scale orders mse
    selected, perf, _ = ev.select_hyperparameter(
        atks, victim, loader, budget=[0.0], criterion="mse"
    )
    # budget 0 -> closest mse is the small attack
    assert perf[0]["mse"][key] == pytest.approx(mses[0])


def test_unknown_criterion_raises(victim, loader):
    atks = {"fake": [FakeAttack(victim, 0.01)]}
    with pytest.raises(ValueError):
        ev.select_hyperparameter(atks, victim, loader, [1.0], criterion="nope")
