"""OnePixel DE attack: sparsity contract, monotone best energy, early-stop
freeze, determinism, population sizing, and compile sharing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import OnePixel
from dl_attack_on_imagenet_tpu.attacks.one_pixel import one_pixel_de
from dl_attack_on_imagenet_tpu.models import create_model


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def batch(victim):
    x = jax.random.uniform(jax.random.PRNGKey(3), (6, 32, 32, 3))
    return x, victim.predict(x)


def _n_changed_pixels(adv, x):
    """Per-image count of (row, col) sites where any channel differs."""
    diff = jnp.any(jnp.asarray(adv) != jnp.asarray(x), axis=-1)
    return np.asarray(jnp.sum(diff, axis=(1, 2)))


class TestOnePixel:
    def test_perturbation_is_pixel_sparse_and_in_box(self, victim, batch):
        """The reference row's operating point (pixels=5, inf_batch=50,
        demo_dL_attack.py:105): at most 5 pixel sites change, values stay
        in [0, 1], everything else is bit-identical to the input."""
        x, y = batch
        adv = OnePixel(victim, pixels=5, steps=6, popsize=10,
                       inf_batch=50)(x, y)
        assert adv.shape == x.shape
        assert (_n_changed_pixels(adv, x) <= 5).all()
        assert float(adv.min()) >= 0.0 and float(adv.max()) <= 1.0

    def test_best_energy_monotone_in_generations(self, victim, batch):
        """Greedy selection: with the same seed/init, more generations can
        only lower each image's best energy (true-class probability)."""
        x, y = batch
        key = jax.random.PRNGKey(11)
        kw = dict(pixels=3, pop=15, inf_batch=50, targeted=False, key=key)
        _, e0, _ = one_pixel_de(victim.apply_fn, victim.variables, x, y,
                                steps=0, **kw)
        _, e8, _ = one_pixel_de(victim.apply_fn, victim.variables, x, y,
                                steps=8, **kw)
        assert bool(jnp.all(e8 <= e0 + 1e-6))
        assert float(jnp.sum(e0 - e8)) > 0  # something actually improved

    def test_fools_pixel_sensitive_victim(self):
        """On a victim whose decision is a sum of per-pixel votes, DE finds
        pixels to overwrite and flips every image — the one-pixel threat
        model working end to end, with the internal fooled flag matching an
        external re-prediction."""

        def apply_fn(variables, x):
            s = jnp.sum(x[..., 0] - 0.5, axis=(1, 2)) * variables["w"]
            return jnp.stack([s, -s], axis=-1)

        variables = {"w": jnp.float32(4.0)}
        x = 0.5 + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                           (6, 8, 8, 3))
        x = jnp.clip(x, 0.0, 1.0)
        y = jnp.argmax(apply_fn(variables, x), axis=-1)
        adv, _, fooled = one_pixel_de(
            apply_fn, variables, x, y, steps=30, pixels=5, pop=25,
            inf_batch=50, targeted=False, key=jax.random.PRNGKey(2))
        repred = jnp.argmax(apply_fn(variables, adv), axis=-1)
        np.testing.assert_array_equal(np.asarray(fooled),
                                      np.asarray(repred != y))
        assert float(jnp.mean(fooled.astype(jnp.float32))) == 1.0

    def test_fooled_flag_matches_external_prediction(self, victim, batch):
        """The internal early-stop flag is exactly `predict(adv) != y` for
        the returned best member (the torchattacks callback's test)."""
        x, y = batch
        adv, _, fooled = one_pixel_de(
            victim.apply_fn, victim.variables, x, y, steps=10, pixels=3,
            pop=15, inf_batch=50, targeted=False, key=jax.random.PRNGKey(4))
        np.testing.assert_array_equal(
            np.asarray(fooled), np.asarray(victim.predict(adv) != y))

    def test_early_stop_freezes_fooled_images(self, victim, batch):
        """Once an image's best member fools, its rows stop evolving: the
        fooled flag and energy at a later step equal the earlier ones."""
        x, y = batch
        kw = dict(pixels=5, pop=25, inf_batch=50, targeted=False,
                  key=jax.random.PRNGKey(2))
        adv_a, e_a, f_a = one_pixel_de(victim.apply_fn, victim.variables,
                                       x, y, steps=25, **kw)
        adv_b, e_b, f_b = one_pixel_de(victim.apply_fn, victim.variables,
                                       x, y, steps=40, **kw)
        fa = np.asarray(f_a)
        np.testing.assert_array_equal(np.asarray(f_b)[fa], fa[fa])
        np.testing.assert_allclose(np.asarray(e_b)[fa], np.asarray(e_a)[fa],
                                   rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(adv_b)[fa],
                                      np.asarray(adv_a)[fa])

    def test_deterministic_per_seed(self, victim, batch):
        x, y = batch
        a = OnePixel(victim, pixels=2, steps=4, seed=9)(x, y)
        b = OnePixel(victim, pixels=2, steps=4, seed=9)(x, y)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_population_sizing_matches_torchattacks(self, victim):
        """pop = max(1, popsize // dims) * dims with dims = pixels*(2+C):
        the scipy multiplier exactly as torchattacks passes it."""
        assert OnePixel(victim, pixels=1, popsize=10).population(3) == 10
        assert OnePixel(victim, pixels=5, popsize=10).population(3) == 25
        assert OnePixel(victim, pixels=1, popsize=4).population(3) == 5

    def test_instances_share_compile(self, victim, batch):
        x, y = batch
        from dl_attack_on_imagenet_tpu.attacks.one_pixel import (
            _one_pixel_cache,
        )

        _ = OnePixel(victim, pixels=2, steps=3, popsize=10)(x, y)
        pop = OnePixel(victim, pixels=2, popsize=10).population(3)
        fn = _one_pixel_cache(victim.apply_fn, 3, 2, pop, 128, False, 1.0)
        n = fn._cache_size()
        _ = OnePixel(victim, pixels=2, steps=3, popsize=10, seed=5)(x, y)
        assert fn._cache_size() == n, "second OnePixel instance retraced"
