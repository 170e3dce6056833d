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


@pytest.fixture(scope="module")
def victim_1000():
    """Cheap 1000-class 224² victim: one strided conv + pool + dense head.

    Production SHAPE (the reference row's n_classes=1000 at the blanket-224
    operating point, demo_dL_attack.py:137) without production COST — the
    members' shape-sensitive logic (9-of-1000 target-class selection, FAB's
    waterfill at d=150528, Square's schedule) runs for real on CPU.
    """
    import flax.linen as nn

    from dl_attack_on_imagenet_tpu.models import VictimModel

    class Small1000(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (8, 8), strides=(8, 8))(x)
            x = nn.relu(x)
            x = x.reshape(x.shape[0], -1)
            return nn.Dense(1000)(x)

    module = Small1000()
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3)))
    apply_fn = jax.jit(module.apply)
    return VictimModel(name="small1000", module=module, variables=variables,
                       input_size=224, num_classes=1000, apply_fn=apply_fn)


class TestAutoAttackProductionShape:
    """VERDICT r3 #2 (CI half): the ensemble at the reference row's SHAPE —
    n_classes=1000, 224² — at reduced steps, sequencing pinned."""

    def test_sequencing_matches_manual_member_merge(self, victim_1000):
        x = jax.random.uniform(jax.random.PRNGKey(5), (4, 224, 224, 3))
        y = victim_1000.predict(x)
        eps = 8 / 255
        kw = dict(norm="Linf", eps=eps, n_classes=1000, steps=2, n_queries=5)

        aa = AutoAttack(victim_1000, **kw)
        # the published standard suite, with APGD-T/FAB-T capped at 9
        # target classes even though n_classes=1000
        assert [n for n, _ in aa._attacks] == [
            "apgd-ce", "apgd-t", "fab-t", "square"]
        assert aa._attacks[1][1].n_classes == 10
        adv = aa(x, y)

        # Manual member-by-member merge per the documented sequencing: a
        # fresh ensemble (same seeds) must reproduce the output exactly.
        aa2 = AutoAttack(victim_1000, **kw)
        robust = victim_1000.predict(x) == y
        expect = x
        for _, atk in aa2._attacks:
            if not bool(jnp.any(robust)):
                break
            cand = atk(x, y)
            dist = jnp.max(jnp.abs(cand - x), axis=(1, 2, 3))
            fooled = (victim_1000.predict(cand) != y) & (dist <= eps + 1e-6)
            take = robust & fooled
            expect = jnp.where(take[:, None, None, None], cand, expect)
            robust = robust & ~fooled
        np.testing.assert_array_equal(np.asarray(adv), np.asarray(expect))

        assert float(jnp.max(jnp.abs(adv - x))) <= eps + 1e-6
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
