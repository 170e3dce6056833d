"""ADiL attack tests on the tiny CPU victim.

Checks training-loop mechanics (loss decreases, constraints hold after every
step), all three inference modes, artifact memoization, and reference-shaped
API behavior.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import ADIL, AdilConfig
from dl_attack_on_imagenet_tpu.attacks import adil_core as core
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def dataset():
    key = jax.random.PRNGKey(3)
    images = np.asarray(jax.random.uniform(key, (24, 32, 32, 3)))
    labels = np.zeros((24,), np.int32)  # re-labeled by the model anyway
    return ArrayDataset(images, labels)


CFG = AdilConfig(eps=8 / 255, norm="linf", n_atoms=5, loss="ce", steps=4,
                 batch_size=8, trials=3, steps_inference=5, steps_code=5)


class TestCore:
    def test_init_respects_constraints(self, rng):
        d = core.init_dictionary(rng, (32, 32, 3), CFG)
        assert d.shape == (5, 32, 32, 3)
        assert float(jnp.max(jnp.abs(d))) <= 1.0
        v = core.init_codes(rng, 10, CFG)
        assert float(jnp.max(jnp.sum(jnp.abs(v), axis=1))) <= CFG.eps + 1e-5

    def test_l2_init(self, rng):
        cfg = AdilConfig(norm="l2", n_atoms=4)
        d = core.init_dictionary(rng, (8, 8, 3), cfg)
        norms = jnp.linalg.norm(d.reshape(4, -1), axis=1)
        assert bool(jnp.all(norms <= 1.0 + 1e-4))

    def test_train_step_decreases_loss_and_projects(self, victim, dataset, rng):
        images = jnp.asarray(dataset.images)
        labels = core.predict_labels(victim.apply_fn, victim.variables, images)
        state = core.init_state(rng, dataset.image_shape, len(dataset), CFG)
        step = core.make_train_step(victim.apply_fn, CFG, "both")
        idx = jnp.arange(8)
        mask = jnp.ones((8,))
        losses = []
        for _ in range(6):
            state, loss, fooling = step(
                state, victim.variables, images[:8], labels[:8], idx, mask)
            losses.append(float(loss))
            # constraints hold after EVERY step
            assert float(jnp.max(jnp.abs(state.d))) <= 1.0 + 1e-6
            assert float(jnp.max(jnp.sum(jnp.abs(state.v), axis=1))) <= CFG.eps + 1e-4
        assert losses[-1] < losses[0]  # minimizing -CE

    def test_epoch_fn_matches_manual_batching(self, victim, dataset, rng):
        images = jnp.asarray(dataset.images)
        labels = core.predict_labels(victim.apply_fn, victim.variables, images)
        state = core.init_state(rng, dataset.image_shape, len(dataset), CFG)
        epoch = core.make_epoch_fn(victim.apply_fn, CFG, "both")
        batches = core.make_batches(rng, len(dataset), 8)
        assert batches.shape == (3, 8)
        state2, loss, fooling = epoch(state, victim.variables, images, labels, batches)
        assert np.isfinite(float(loss))
        assert 0 <= float(fooling) <= len(dataset)
        assert int(state2.epoch) == 1

    def test_make_batches_padding(self, rng):
        batches = core.make_batches(rng, 10, 4)
        assert batches.shape == (3, 4)
        flat = np.sort(np.asarray(batches).ravel())
        assert (flat[:2] == -1).all()  # 2 pad slots
        np.testing.assert_array_equal(flat[2:], np.arange(10))

    def test_ddrague_inference(self, victim, dataset, rng):
        d = core.init_dictionary(rng, dataset.image_shape, CFG)
        x = jnp.asarray(dataset.images[:6])
        adv = core.supervised_ddrague(victim.apply_fn, victim.variables, d, x, CFG)
        assert adv.shape == x.shape
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1

    def test_adamw_codes_inference(self, victim, dataset, rng):
        d = core.init_dictionary(rng, dataset.image_shape, CFG)
        x = jnp.asarray(dataset.images[:6])
        adv = core.supervised_adamw_codes(victim.apply_fn, victim.variables, d, x, CFG)
        assert adv.shape == x.shape
        # perturbation bounded by eps (linf budget via l1-ball codes)
        delta = jnp.abs(adv - jnp.clip(x, 0, 1))
        assert float(delta.max()) <= CFG.eps + 1e-4
        fooling = core.supervised_adamw_codes(
            victim.apply_fn, victim.variables, d, x, CFG, return_fooling=True
        )
        assert 0 <= int(fooling) <= 6

    def test_unsupervised_sampling(self, victim, dataset, rng):
        d = core.init_dictionary(rng, dataset.image_shape, CFG)
        x = jnp.asarray(dataset.images[:6])
        adv = core.unsupervised_sample(
            victim.apply_fn, victim.variables, d, x, rng, CFG
        )
        assert adv.shape == x.shape
        assert float(jnp.max(jnp.abs(adv - x))) <= CFG.eps + 1e-5

    def test_sample_sphere_linf_lands_on_l1_sphere(self, rng):
        v = core.sample_sphere(rng, 16, CFG)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(jnp.abs(v), axis=1)), CFG.eps, atol=1e-5
        )

    def test_sample_sphere_l2(self, rng):
        cfg = AdilConfig(norm="l2", n_atoms=10, eps=0.5)
        v = core.sample_sphere(rng, 16, cfg)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(v, axis=1)), 0.5, atol=1e-5
        )


class TestADILClass:
    def test_train_and_attack_supervised(self, victim, dataset, tmp_path):
        cache = ArtifactCache(str(tmp_path))
        atk = ADIL(
            victim, eps=8 / 255, steps=3, n_atoms=5, batch_size=8,
            data_train=dataset, data_val=None, loss="ce", method="gd",
            steps_inference=5, cache=cache, model_name="tinytest",
        )
        assert cache.exists("ImageNet", model="tinytest")
        assert len(atk.history["loss"]) >= 1
        x = jnp.asarray(dataset.images[:4])
        adv = atk(x, jnp.asarray(dataset.labels[:4]))
        assert adv.shape == x.shape
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1

    def test_memoization_skips_training(self, victim, dataset, tmp_path):
        cache = ArtifactCache(str(tmp_path))
        ADIL(victim, steps=2, n_atoms=5, batch_size=8, data_train=dataset,
             cache=cache, model_name="memo")
        # Second construction must not retrain (would raise if it tried to
        # use data_train=None).
        atk2 = ADIL(victim, steps=2, n_atoms=5, batch_size=8, data_train=None,
                    cache=cache, model_name="memo", steps_inference=3)
        adv = atk2(jnp.asarray(dataset.images[:2]))
        assert adv.shape == (2, 32, 32, 3)

    def test_alter_method(self, victim, dataset, tmp_path):
        cache = ArtifactCache(str(tmp_path))
        atk = ADIL(victim, steps=2, steps_in=1, n_atoms=5, batch_size=8,
                   data_train=dataset, cache=cache, model_name="alter",
                   method="alter")
        assert cache.exists("ImageNet", model="alter")

    def test_unsupervised_mode(self, victim, dataset, tmp_path):
        cache = ArtifactCache(str(tmp_path))
        atk = ADIL(victim, steps=2, n_atoms=5, batch_size=8, trials=3,
                   data_train=dataset, cache=cache, model_name="unsup",
                   attack="unsupervised")
        x = jnp.asarray(dataset.images[:4])
        adv = atk(x)
        assert adv.shape == x.shape

    def test_lazy_learning_on_forward(self, victim, dataset, tmp_path):
        cache = ArtifactCache(str(tmp_path))
        atk = ADIL(victim, steps=2, n_atoms=5, batch_size=4, cache=cache,
                   model_name="lazy", steps_inference=3)
        x = jnp.asarray(dataset.images[:8])
        adv = atk(x)  # must train on this batch, then attack
        assert adv.shape == x.shape
        assert cache.exists("ImageNet", model="lazy")

    def test_val_eval_runs(self, victim, dataset, tmp_path):
        cache = ArtifactCache(str(tmp_path))
        val = ArrayDataset(dataset.images[:8], dataset.labels[:8])
        atk = ADIL(victim, steps=2, n_atoms=5, batch_size=8, data_train=dataset,
                   data_val=val, cache=cache, model_name="withval")
        assert atk.history["val_fooling"] is not None

    def test_val_fooling_ragged_tail_pads_and_scales(self, victim, dataset,
                                                     tmp_path):
        """The ragged val tail is padded by cycling rows to keep ONE
        compiled val-solver shape, and its count is scaled back to the real
        row count: with a stub solver calling every row fooled, the rate
        must be exactly 1.0 (a missing k/b scale would report 1.6 for
        10 rows at batch 8)."""
        import jax.numpy as jnp

        atk = ADIL(victim, steps=2, n_atoms=5, batch_size=8,
                   cache=ArtifactCache(str(tmp_path)), model_name="ragged")
        val = ArrayDataset(dataset.images[:10], dataset.labels[:10])
        d = jnp.zeros((5, 32, 32, 3))
        seen = []

        def stub(variables, d_in, x):  # all rows fooled
            seen.append(int(x.shape[0]))
            return float(x.shape[0])

        atk._val_fn = stub
        assert atk._val_fooling(d, val) == 1.0
        assert seen == [8, 8]  # tail of 2 padded to the compiled shape
        atk._val_fn = lambda variables, d_in, x: 0.0  # none fooled
        assert atk._val_fooling(d, val) == 0.0
