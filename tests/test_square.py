"""Square Attack (l∞): schedule values, budgets, fooling, determinism,
acceptance monotonicity, and compile sharing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import Square
from dl_attack_on_imagenet_tpu.attacks.square import (
    _p_schedule, _sizes, square_linf,
)
from dl_attack_on_imagenet_tpu.models import create_model

EPS = 16 / 255


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def batch(victim):
    x = jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3))
    return x, victim.predict(x)


def test_p_schedule_matches_released_breakpoints():
    """p halves at the released fractions of the budget: at 10000 queries the
    raw thresholds {10,50,200,...,8000} apply directly."""
    p = _p_schedule(0.8, 10000)
    assert p[0] == 0.8 and p[10] == 0.8          # frac==10 not yet > 10
    assert p[11] == 0.4 and p[50] == 0.4
    assert p[51] == 0.2 and p[200] == 0.2
    assert p[201] == 0.1
    assert p[9999] == 0.8 / 512

    s = _sizes(0.8, 10000, 32, 32)
    assert s[0] == np.clip(round(np.sqrt(0.8 * 32 * 32)), 1, 31)
    assert s.min() >= 1 and s.max() <= 31


class TestSquare:
    def test_fools_within_budget(self, victim, batch):
        """The random-init tiny victim has near-flat logits (margins ~1e-2),
        so random search needs a wider ball than the gradient attacks'
        operating points to converge in a test-sized budget."""
        x, y = batch
        atk = Square(victim, eps=32 / 255, n_queries=600, loss="margin")
        adv = atk(x, y)
        assert float(jnp.max(jnp.abs(adv - x))) <= 32 / 255 + 1e-6
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        fool = float(jnp.mean((victim.predict(adv) != y).astype(jnp.float32)))
        assert fool >= 0.75

    def test_ce_loss_variant_fools(self, victim, batch):
        """The reference row's operating point: loss='ce'
        (demo_dL_attack.py:104). CE saturates where the margin objective
        doesn't (the paper's reason for preferring 'margin'), so the bar
        here is lower at the same budget."""
        x, y = batch
        adv = Square(victim, eps=32 / 255, n_queries=1500, loss="ce")(x, y)
        fool = float(jnp.mean((victim.predict(adv) != y).astype(jnp.float32)))
        assert fool >= 0.5

    def test_margin_never_increases(self, victim, batch):
        """Strict-improvement acceptance: the final objective is <= the
        stripe init's objective per image."""
        x, y = batch
        key = jax.random.PRNGKey(5)
        adv, margin = square_linf(victim.apply_fn, victim.variables, x, y,
                                  EPS, 150, loss="margin", key=key)
        # rebuild the init point (fold_in(key, 0) stripes) and its margin
        stripes = EPS * (2.0 * jax.random.bernoulli(
            jax.random.fold_in(key, 0), 0.5,
            (x.shape[0], 1, x.shape[2], x.shape[3])).astype(jnp.float32) - 1)
        x0 = jnp.clip(x + stripes, 0, 1)
        logits = victim(x0)
        one_hot = jax.nn.one_hot(y, logits.shape[-1])
        m0 = (jnp.sum(logits * one_hot, -1)
              - jnp.max(jnp.where(one_hot > 0, -jnp.inf, logits), -1))
        assert bool(jnp.all(margin <= m0 + 1e-5))

    def test_deterministic_per_seed(self, victim, batch):
        x, y = batch
        a = Square(victim, eps=EPS, n_queries=60, seed=4)(x, y)
        b = Square(victim, eps=EPS, n_queries=60, seed=4)(x, y)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eps_sweep_shares_compile(self, victim, batch):
        x, y = batch
        from dl_attack_on_imagenet_tpu.attacks.square import _square_cache

        _ = Square(victim, eps=8 / 255, n_queries=30)(x, y)
        fn = _square_cache(victim.apply_fn, 30, "ce", 0.8, False)
        n = fn._cache_size()
        _ = Square(victim, eps=32 / 255, n_queries=30)(x, y)
        assert fn._cache_size() == n, "eps sweep retraced Square"

    def test_l2_rejected(self, victim):
        with pytest.raises(ValueError):
            Square(victim, norm="L2")
