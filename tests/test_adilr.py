"""ADILR (regularized) solver + class tests on the tiny victim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import ADILR, RegularizedConfig
from dl_attack_on_imagenet_tpu.attacks.adil_regularized import (
    adil_fb,
    learn_coding_vectors,
    sadil,
    sadil_updated,
)
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def data(victim):
    key = jax.random.PRNGKey(3)
    images = jnp.asarray(jax.random.uniform(key, (12, 32, 32, 3)))
    labels = victim.predict(images)
    return images, labels


CFG = RegularizedConfig(
    lambda_l1=0.01, lambda_l2=0.1, n_atoms=4, steps=5, step_size=0.01,
    batch_size=4, targeted=False, trials=3,
)


class TestSolvers:
    def test_adil_fb_decreases_loss(self, victim, data, rng):
        images, labels = data
        d, v, track = adil_fb(
            victim.apply_fn, victim.variables, images, labels, CFG, rng, niter=5
        )
        assert d.shape == (4, 32, 32, 3)
        assert v.shape == (12, 4)
        track = np.asarray(track)
        valid = track[~np.isnan(track)]
        assert len(valid) >= 2
        assert valid[-1] <= valid[0] + 1e-3
        # dict atoms respect the l2 ball
        norms = jnp.linalg.norm(d.reshape(4, -1), axis=1)
        assert bool(jnp.all(norms <= 1.0 + 1e-4))

    def test_sadil_runs(self, victim, data, rng):
        images, labels = data
        d, v, losses = sadil(
            victim.apply_fn, victim.variables, images, labels, CFG, rng, nepochs=3
        )
        assert len(losses) >= 2
        assert losses[-1] <= losses[0] + 1e-3
        norms = jnp.linalg.norm(d.reshape(4, -1), axis=1)
        assert bool(jnp.all(norms <= 1.0 + 1e-4))

    def test_sadil_updated_runs(self, victim, data, rng):
        # CFG's lambda_l1=0.01 exceeds max|grad_v| at v=0 for this victim
        # (~0.002), making v=0 a genuine prox fixed point — use a lambda_l1
        # below the gradient scale so the solver actually moves.
        cfg = RegularizedConfig(
            lambda_l1=1e-4, lambda_l2=0.1, n_atoms=4, steps=5, step_size=1.0,
            batch_size=4, targeted=False, trials=3,
        )
        images, labels = data
        d, v, losses = sadil_updated(
            victim.apply_fn, victim.variables, images, labels, cfg, rng, nepochs=3
        )
        assert np.isfinite(losses[-1])
        assert bool(jnp.any(v != 0))

    def test_sadil_updated_skipped_d_step_keeps_training(self, victim, data, rng):
        """At this toy operating point every epoch's ||grad_D||_inf sits
        under the reference's 1e-4 threshold, so the D step is skipped the
        way the reference's ``continue`` does it (adil_regularized.py:463-465):
        no loss is appended and the |Δloss| check never runs — training must
        NOT spuriously stop, so v keeps moving across later epochs (the old
        duplicate-append made epoch 1 terminal)."""
        cfg = RegularizedConfig(
            lambda_l1=1e-4, lambda_l2=0.1, n_atoms=4, steps=5, step_size=1.0,
            batch_size=4, targeted=False, trials=3,
        )
        images, labels = data
        _, v1, losses1 = sadil_updated(
            victim.apply_fn, victim.variables, images, labels, cfg, rng, nepochs=1
        )
        _, v3, losses3 = sadil_updated(
            victim.apply_fn, victim.variables, images, labels, cfg, rng, nepochs=3
        )
        # Epoch 1's D step is skipped: nothing appended (no duplicate).
        assert len(losses1) == 1
        # Training continued past the skipped epoch (the old duplicate-append
        # made |Δloss| == 0 and stopped at epoch 1, leaving v3 == v1); later
        # epochs may legitimately run a D step once the accumulated gradient
        # crosses the reference's 1e-4 threshold.
        assert not np.allclose(np.asarray(v1), np.asarray(v3))

    def test_learn_coding_vectors_sparsifies(self, victim, data, rng):
        images, labels = data
        cfg = RegularizedConfig(
            lambda_l1=5.0, lambda_l2=0.1, n_atoms=4, targeted=False
        )
        d = jax.random.normal(rng, (4, 32, 32, 3)) * 0.01
        v = learn_coding_vectors(
            victim.apply_fn, victim.variables, d, images, labels, cfg,
            niter=10, step_size=1.0,
        )
        # Heavy l1 with near-zero dictionary benefit -> codes mostly zero.
        assert float(jnp.mean((jnp.abs(v) < 1e-6).astype(jnp.float32))) > 0.5

    def test_learn_coding_vectors_untargeted_attack_progress(self, victim, data, rng):
        images, labels = data
        cfg = RegularizedConfig(
            lambda_l1=1e-4, lambda_l2=1e-4, n_atoms=4, targeted=False
        )
        d, _, _ = adil_fb(
            victim.apply_fn, victim.variables, images, labels, cfg, rng, niter=3
        )
        v = learn_coding_vectors(
            victim.apply_fn, victim.variables, d, images, labels, cfg,
            niter=20, step_size=10.0,
        )
        assert bool(jnp.any(v != 0))


class TestADILRClass:
    def test_supervised_end_to_end(self, victim, data, tmp_path):
        images, labels = data
        ds = ArrayDataset(np.asarray(images), np.asarray(labels))
        cache = ArtifactCache(str(tmp_path))
        atk = ADILR(
            victim, steps=3, lambda_l1=0.01, lambda_l2=0.1, n_atoms=4,
            batch_size=4, data_train=ds, version="stochastic", targeted=False,
            cache=cache, model_name="reg",
        )
        adv = atk(images[:4], labels[:4])
        assert adv.shape == (4, 32, 32, 3)
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        # budget respected
        assert float(jnp.max(jnp.abs(adv - jnp.clip(images[:4], 0, 1)))) <= atk.cfg.budget + 1e-5

    @pytest.mark.parametrize("mode", ["none", "atoms", "labels_atoms", "predictions_atoms"])
    def test_unsupervised_modes(self, victim, data, tmp_path, mode):
        images, labels = data
        ds = ArrayDataset(np.asarray(images), np.asarray(labels))
        cache = ArtifactCache(str(tmp_path))
        atk = ADILR(
            victim, steps=2, lambda_l1=0.01, lambda_l2=0.1, n_atoms=4,
            batch_size=4, data_train=ds, version="stochastic", targeted=False,
            attack="unsupervised", attack_conditioned=mode, trials=2,
            cache=cache, model_name=f"reg_{mode}",
        )
        adv = atk(images[:4], labels[:4])
        assert adv.shape == (4, 32, 32, 3)
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1

    def test_unsupervised_without_fit_raises_informative(self, victim, data, tmp_path):
        """A supervised-configured instance against a cached dictionary never
        runs the Laplace fit; calling the unsupervised public API must raise
        the same informative RuntimeError the conditioned modes do, not a
        bare 'NoneType is not subscriptable' TypeError."""
        images, labels = data
        ds = ArrayDataset(np.asarray(images), np.asarray(labels))
        cache = ArtifactCache(str(tmp_path))
        kw = dict(
            steps=2, lambda_l1=0.01, lambda_l2=0.1, n_atoms=4, batch_size=4,
            version="stochastic", targeted=False, cache=cache,
            model_name="reg_guard",
        )
        ADILR(victim, data_train=ds, **kw)(images[:2], labels[:2])  # train+cache
        atk = ADILR(victim, attack="supervised", **kw)  # cache hit, no fit
        key = jax.random.PRNGKey(0)
        with pytest.raises(RuntimeError, match="none"):
            atk.forward_unsupervised(images[:2], key)
        with pytest.raises(RuntimeError, match="atoms"):
            atk.forward_unsupervised_conditioned_atoms(images[:2], key)

    def test_deterministic_version(self, victim, data, tmp_path):
        images, labels = data
        ds = ArrayDataset(np.asarray(images), np.asarray(labels))
        cache = ArtifactCache(str(tmp_path))
        atk = ADILR(
            victim, steps=3, lambda_l1=0.01, lambda_l2=0.1, n_atoms=4,
            data_train=ds, version="deterministic", targeted=True,
            cache=cache, model_name="det",
        )
        adv = atk(images[:2], labels[:2])
        assert adv.shape == (2, 32, 32, 3)


class TestFixedDictionary:
    def test_adil_fb_with_given_dictionary_keeps_it_frozen(self, victim, data, rng):
        """adil(dictionary=...) learns only v (adil_regularized.py:49-56,
        :116-118: grad_d is zeroed and d never updated)."""
        images, labels = data
        d0 = jax.random.normal(rng, (4, 32, 32, 3)) * 0.1
        d, v, track = adil_fb(
            victim.apply_fn, victim.variables, images, labels, CFG, rng,
            dictionary=d0, niter=4,
        )
        np.testing.assert_array_equal(np.asarray(d), np.asarray(d0))
        assert bool(jnp.any(v != 0))
