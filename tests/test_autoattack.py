"""AutoAttack ensemble: sequencing, budget, robustness-mask semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import APGD, AutoAttack
from dl_attack_on_imagenet_tpu.models import create_model

EPS = 16 / 255


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def batch(victim):
    x = jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3))
    return x, victim.predict(x)


class TestAutoAttack:
    def test_standard_fools_within_budget(self, victim, batch):
        x, y = batch
        atk = AutoAttack(victim, eps=EPS, steps=20, n_queries=200,
                         n_classes=4)
        adv = atk(x, y)
        assert float(jnp.max(jnp.abs(adv - x))) <= EPS + 1e-5
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        fool = float(jnp.mean((victim.predict(adv) != y).astype(jnp.float32)))
        assert fool >= 0.75

    def test_at_least_as_strong_as_apgd_alone(self, victim, batch):
        x, y = batch
        aa = AutoAttack(victim, eps=EPS, steps=20, n_queries=200,
                        n_classes=4)(x, y)
        ap = APGD(victim, eps=EPS, steps=20)(x, y)
        fool_aa = float(jnp.mean(
            (victim.predict(aa) != y).astype(jnp.float32)))
        fool_ap = float(jnp.mean(
            (victim.predict(ap) != y).astype(jnp.float32)))
        assert fool_aa >= fool_ap

    def test_misclassified_inputs_keep_clean_images(self, victim, batch):
        """The published contract: an input the victim already gets wrong is
        returned untouched."""
        x, _ = batch
        wrong = (victim.predict(x) + 1) % 10  # all labels wrong on purpose
        adv = AutoAttack(victim, eps=EPS, steps=5, n_queries=20,
                         n_classes=3)(x, wrong)
        np.testing.assert_array_equal(np.asarray(adv), np.asarray(x))

    def test_rand_version_runs(self, victim, batch):
        x, y = batch
        adv = AutoAttack(victim, eps=EPS, version="rand", steps=10,
                         n_classes=4)(x, y)
        assert float(jnp.max(jnp.abs(adv - x))) <= EPS + 1e-5

    def test_subset_override(self, victim, batch):
        x, y = batch
        atk = AutoAttack(victim, eps=EPS, steps=10,
                         attacks_to_run=("apgd-ce",))
        assert [n for n, _ in atk._attacks] == ["apgd-ce"]
        adv = atk(x, y)
        assert float(jnp.max(jnp.abs(adv - x))) <= EPS + 1e-5
