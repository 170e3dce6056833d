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
