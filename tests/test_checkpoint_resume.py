"""Mid-training checkpoint/resume tests (step-level, beyond the reference's
finished-dictionary warm start)."""

import jax
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import ADIL
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def dataset():
    key = jax.random.PRNGKey(3)
    images = np.asarray(jax.random.uniform(key, (16, 32, 32, 3)))
    return ArrayDataset(images, np.zeros((16,), np.int64))


class Boom(Exception):
    pass


def test_resume_after_interruption(victim, dataset, tmp_path):
    cache = ArtifactCache(str(tmp_path))
    val = ArrayDataset(dataset.images[:8], dataset.labels[:8])

    atk = ADIL(victim, steps=5, n_atoms=4, batch_size=8,
               cache=cache, model_name="ckpt", checkpoint_every=1, seed=0)
    calls = {"n": 0}
    real_val = atk._val_fooling

    def bomb(d, data_val):
        calls["n"] += 1
        if calls["n"] == 3:
            raise Boom()
        return 0.0

    atk._val_fooling = bomb
    with pytest.raises(Boom):
        atk.learn_dictionary(dataset, val)

    # A train-state checkpoint survived the crash (epochs 0 and 1 done).
    assert cache.exists("ImageNet", model="ckpt", kind="train_state")
    assert not cache.exists("ImageNet", model="ckpt")

    # Fresh run resumes from epoch 2 and finishes all 5 epochs.
    atk2 = ADIL(victim, steps=5, n_atoms=4, batch_size=8,
                cache=cache, model_name="ckpt", checkpoint_every=1,
                resume=True, data_train=dataset, seed=0, verbose=True)
    assert len(atk2.history["loss"]) == 5
    assert cache.exists("ImageNet", model="ckpt")
    # completed training clears the train-state checkpoint
    assert not cache.exists("ImageNet", model="ckpt", kind="train_state")


def test_resume_disabled_restarts(victim, dataset, tmp_path):
    cache = ArtifactCache(str(tmp_path))
    atk = ADIL(victim, steps=3, n_atoms=4, batch_size=8,
               cache=cache, model_name="nores", checkpoint_every=1, seed=0)
    # Manufacture a stale train-state checkpoint, then train with resume off.
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core

    state = core.init_state(jax.random.PRNGKey(0), (32, 32, 3), 16, atk.cfg)
    atk._save_train_state(state.replace(epoch=jax.numpy.asarray(99)),
                          jax.random.PRNGKey(1), [1.0], [0.0])
    atk.resume = False
    atk.learn_dictionary(dataset, None)
    # resume=False ignored the (epoch-99) checkpoint -> full fresh history
    assert len(atk.history["loss"]) == 3


def test_alter_resume_matches_uninterrupted(victim, dataset, tmp_path):
    """Kill-and-resume on method='alter' reproduces the straight-through run
    (round-1 gap: alter dropped checkpoint_every with a warning)."""
    def run(cache, bomb_at=None, **kw):
        atk = ADIL(victim, steps=4, steps_in=1, n_atoms=4, batch_size=8,
                   method="alter", cache=cache, model_name="alt",
                   checkpoint_every=1, seed=0, val_every=1, **kw)
        if bomb_at is not None:
            calls = {"n": 0}

            def bomb(d, data_val):
                calls["n"] += 1
                if calls["n"] == bomb_at:
                    raise Boom()
                return 0.0

            atk._val_fooling = bomb
        return atk

    val = ArrayDataset(dataset.images[:8], dataset.labels[:8])

    straight = run(ArtifactCache(str(tmp_path / "a")))
    straight.learn_dictionary(dataset, None)
    d_ref = np.asarray(straight.dictionary)

    cache_b = ArtifactCache(str(tmp_path / "b"))
    crashy = run(cache_b, bomb_at=2)
    with pytest.raises(Boom):
        crashy.learn_dictionary(dataset, val)
    assert cache_b.exists("ImageNet", model="alt", kind="train_state")

    resumed = run(cache_b)
    resumed.learn_dictionary(dataset, None)
    assert len(resumed.history["loss"]) == 4
    assert not cache_b.exists("ImageNet", model="alt", kind="train_state")
    np.testing.assert_allclose(np.asarray(resumed.dictionary), d_ref, atol=1e-6)


def test_mesh_resume_matches_uninterrupted(victim, dataset, tmp_path, devices, monkeypatch):
    """Kill-and-resume of the sharded (d, v, opt) state on the 8-device mesh
    (round-1 gap: the mesh path dropped checkpoint_every with a warning)."""
    from dl_attack_on_imagenet_tpu.parallel import adil_dp, data_mesh

    mesh = data_mesh(8)

    def run(cache, **kw):
        return ADIL(victim, steps=4, n_atoms=4, batch_size=16, mesh=mesh,
                    cache=cache, model_name="mdp", checkpoint_every=1,
                    seed=0, val_every=None, **kw)

    straight = run(ArtifactCache(str(tmp_path / "a")))
    straight.learn_dictionary(dataset, None)
    d_ref = np.asarray(straight.dictionary)
    assert len(straight.history["loss"]) == 4

    # Simulated kill: crash immediately after the 2nd checkpoint write.
    real_save = adil_dp._ckpt_save
    calls = {"n": 0}

    def crashing_save(*args, **kwargs):
        real_save(*args, **kwargs)
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom()

    cache_b = ArtifactCache(str(tmp_path / "b"))
    monkeypatch.setattr(adil_dp, "_ckpt_save", crashing_save)
    with pytest.raises(Boom):
        run(cache_b).learn_dictionary(dataset, None)
    monkeypatch.setattr(adil_dp, "_ckpt_save", real_save)
    assert cache_b.exists("ImageNet", model="mdp", kind="dp_train_state")

    resumed = run(cache_b)
    resumed.learn_dictionary(dataset, None)
    assert len(resumed.history["loss"]) == 4
    assert not cache_b.exists("ImageNet", model="mdp", kind="dp_train_state")
    np.testing.assert_allclose(np.asarray(resumed.dictionary), d_ref, atol=1e-6)


def test_state_roundtrip_preserves_optimizer(victim, dataset, tmp_path):
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core

    cache = ArtifactCache(str(tmp_path))
    atk = ADIL(victim, steps=2, n_atoms=4, batch_size=8, cache=cache,
               model_name="rt", checkpoint_every=1)
    state = core.init_state(jax.random.PRNGKey(0), (32, 32, 3), 16, atk.cfg)
    # advance one real step so moments are nonzero
    images = jax.numpy.asarray(dataset.images)
    labels = core.predict_labels(victim.apply_fn, victim.variables, images)
    step = core.make_train_step(victim.apply_fn, atk.cfg, "both")
    state, _, _ = step(state, victim.variables, images[:8], labels[:8],
                       jax.numpy.arange(8), jax.numpy.ones(8))
    atk._save_train_state(state, jax.random.PRNGKey(5), [0.1], [0.2])

    template = core.init_state(jax.random.PRNGKey(9), (32, 32, 3), 16, atk.cfg)
    restored, key, losses, fools = atk._restore_train_state(template)
    np.testing.assert_array_equal(np.asarray(restored.d), np.asarray(state.d))
    np.testing.assert_array_equal(np.asarray(restored.v), np.asarray(state.v))
    a = jax.tree_util.tree_leaves(restored.opt_state)
    b = jax.tree_util.tree_leaves(state.opt_state)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert losses == [0.1]
