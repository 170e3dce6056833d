"""FGSM/BIM/PGD baseline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import BIM, FGSM, PGD
from dl_attack_on_imagenet_tpu.models import create_model


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def batch(victim):
    x = jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3))
    return x, victim.predict(x)


def _fooling(victim, x, adv, y):
    return float(jnp.mean((victim.predict(adv) != y).astype(jnp.float32)))


class TestPGD:
    def test_linf_budget_and_fooling(self, victim, batch):
        x, y = batch
        atk = PGD(victim, eps=16 / 255, alpha=4 / 255, steps=20)
        adv = atk(x, y)
        assert float(jnp.max(jnp.abs(adv - x))) <= 16 / 255 + 1e-6
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        assert _fooling(victim, x, adv, y) >= 0.5

    def test_l2_budget(self, victim, batch):
        x, y = batch
        atk = PGD(victim, eps=2.0, alpha=0.5, steps=20, norm="l2")
        adv = atk(x, y)
        norms = jnp.sqrt(jnp.sum((adv - x) ** 2, axis=(1, 2, 3)))
        assert bool(jnp.all(norms <= 2.0 + 1e-4))

    def test_targeted_moves_toward_target(self, victim, batch):
        x, y = batch
        atk = PGD(victim, eps=32 / 255, alpha=8 / 255, steps=30, targeted=True)
        adv = atk(x, y)
        # targeted aims at the 2nd most probable class (utils.py:164-174)
        logits = victim(x)
        target = jnp.argsort(logits, axis=-1)[:, -2]
        hit = float(jnp.mean((victim.predict(adv) == target).astype(jnp.float32)))
        assert hit >= 0.5

    def test_bim_no_random_start_deterministic(self, victim, batch):
        x, y = batch
        atk = BIM(victim, eps=16 / 255, alpha=4 / 255, steps=5)
        a = atk(x, y)
        b = atk(x, y)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFGSM:
    def test_one_step_budget(self, victim, batch):
        x, y = batch
        adv = FGSM(victim, eps=16 / 255)(x, y)
        assert float(jnp.max(jnp.abs(adv - x))) <= 16 / 255 + 1e-6

    def test_harness_integration(self, victim, batch):
        from dl_attack_on_imagenet_tpu import evaluation as ev

        x, y = batch
        atks = {"fgsm": [FGSM(victim, eps=16 / 255)],
                "pgd": [PGD(victim, eps=16 / 255, alpha=4 / 255, steps=5)]}
        out = ev.get_performance(atks, victim, [(np.asarray(x), np.asarray(y))])
        assert len(out["fooling_rate"]) == 2


class TestCompileReuse:
    """Baseline attacks share jitted kernels across instances — the
    reference driver's eps hyper-grids (performance.get_atks) must not
    retrace per combo (eps/alpha are traced args)."""

    def test_pgd_eps_sweep_shares_compile(self, victim, batch):
        from dl_attack_on_imagenet_tpu.attacks.pgd import _pgd_cache

        x, y = batch
        a1 = PGD(victim, eps=8 / 255, alpha=2 / 255, steps=3)
        _ = a1(x, y)
        fn = _pgd_cache(victim.apply_fn, 3, "linf", True, False)
        n = fn._cache_size()
        assert n >= 1
        a2 = PGD(victim, eps=32 / 255, alpha=8 / 255, steps=3)
        adv2 = a2(x, y)
        assert fn._cache_size() == n, "eps sweep retraced PGD"
        # eps really binds (traced, not baked)
        assert float(jnp.max(jnp.abs(adv2 - x))) <= 32 / 255 + 1e-6
        a3 = PGD(victim, eps=4 / 255, alpha=1 / 255, steps=3)
        adv3 = a3(x, y)
        assert fn._cache_size() == n
        assert float(jnp.max(jnp.abs(adv3 - x))) <= 4 / 255 + 1e-6

    def test_deepfool_instances_share_compile(self, victim, batch):
        from dl_attack_on_imagenet_tpu.attacks.deepfool import (
            DeepFool, cached_deepfool,
        )

        x, y = batch
        d1 = DeepFool(victim, num_classes=3, steps=4)
        _ = d1(x, y)
        fn = cached_deepfool(victim.apply_fn, 3, 0.02, 4)
        n = fn._cache_size()
        d2 = DeepFool(victim, num_classes=3, steps=4)
        _ = d2(x, y)
        assert fn._cache_size() == n, "second DeepFool instance retraced"
