"""Depth-1 epoch pipelining (ADIL(pipeline_epochs=True), the default).

The pipelined resident-array training loop dispatches epoch t+1 before
reading back epoch t's loss, snapshotting epoch t's post-state before its
buffers are donated. These tests pin that the pipeline is a pure scheduling
change: trajectory, convergence-stop state, history, and checkpoint/resume
all match the serial loop exactly. Reference loop: adil.py:160-210.
"""

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
    labels = np.asarray(
        jax.random.randint(jax.random.PRNGKey(4), (16,), 0, 10), np.int64
    )
    return ArrayDataset(images, labels)


def _train(victim, dataset, tmp_path, tag, pipeline, **kw):
    cache = ArtifactCache(str(tmp_path))
    atk = ADIL(victim, steps=6, n_atoms=4, batch_size=8, cache=cache,
               model_name=tag, seed=0, val_every=None,
               pipeline_epochs=pipeline, **kw)
    atk.learn_dictionary(dataset, None)
    return atk


def test_pipelined_trajectory_equals_serial(victim, dataset, tmp_path):
    a = _train(victim, dataset, tmp_path / "p", "pipe", True)
    b = _train(victim, dataset, tmp_path / "s", "serial", False)
    np.testing.assert_array_equal(np.asarray(a.history["loss"]),
                                  np.asarray(b.history["loss"]))
    np.testing.assert_array_equal(np.asarray(a.history["fooling_rate"]),
                                  np.asarray(b.history["fooling_rate"]))
    np.testing.assert_array_equal(np.asarray(a.dictionary),
                                  np.asarray(b.dictionary))


def test_convergence_stop_returns_exact_serial_state(victim, dataset, tmp_path):
    # A large tol trips the |dloss| rule early (at some epoch t < steps);
    # the pipelined loop has already dispatched epoch t+1 by then and must
    # discard it, returning epoch t's state — byte-identical to serial.
    import dataclasses

    def make(tag, pipeline, path):
        cache = ArtifactCache(str(path))
        atk = ADIL(victim, steps=30, n_atoms=4, batch_size=8, cache=cache,
                   model_name=tag, seed=0, val_every=None,
                   pipeline_epochs=pipeline)
        atk.cfg = dataclasses.replace(atk.cfg, tol=1e-2)
        atk.learn_dictionary(dataset, None)
        return atk

    a = make("pipe", True, tmp_path / "p")
    b = make("serial", False, tmp_path / "s")
    assert len(a.history["loss"]) == len(b.history["loss"]) < 30
    np.testing.assert_array_equal(np.asarray(a.history["loss"]),
                                  np.asarray(b.history["loss"]))
    np.testing.assert_array_equal(np.asarray(a.dictionary),
                                  np.asarray(b.dictionary))


def test_pipelined_checkpoint_resume_matches_uninterrupted(
    victim, dataset, tmp_path
):
    # Checkpoints written by the pipelined loop (state + the post-split key
    # of the SAVED epoch, not the in-flight one) must resume onto the
    # uninterrupted trajectory.
    class Boom(Exception):
        pass

    cache = ArtifactCache(str(tmp_path / "ck"))
    atk = ADIL(victim, steps=5, n_atoms=4, batch_size=8, cache=cache,
               model_name="ckpt", checkpoint_every=1, seed=0,
               pipeline_epochs=True)
    calls = {"n": 0}

    def bomb(t, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise Boom()
        return orig(t, *a, **kw)

    orig = atk.metrics.log
    atk.metrics.log = bomb
    with pytest.raises(Boom):
        atk.learn_dictionary(dataset, None)
    assert cache.exists("ImageNet", model="ckpt", kind="train_state")

    atk2 = ADIL(victim, steps=5, n_atoms=4, batch_size=8, cache=cache,
                model_name="ckpt", checkpoint_every=1, resume=True,
                data_train=dataset, seed=0, pipeline_epochs=True)
    # Uninterrupted run at the same steps=5 config for comparison:
    cache_r = ArtifactCache(str(tmp_path / "r5"))
    ref5 = ADIL(victim, steps=5, n_atoms=4, batch_size=8, cache=cache_r,
                model_name="r5", seed=0, val_every=None,
                pipeline_epochs=True)
    ref5.learn_dictionary(dataset, None)
    assert len(atk2.history["loss"]) == 5
    np.testing.assert_allclose(np.asarray(atk2.history["loss"]),
                               np.asarray(ref5.history["loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(atk2.dictionary),
                               np.asarray(ref5.dictionary), rtol=1e-5,
                               atol=1e-7)


class TestAutoResolution:
    """pipeline_epochs='auto' (the default) enables the pipeline only when
    the doubled resident footprint clearly fits the device budget."""

    def test_small_dataset_resolves_true(self, victim, dataset, tmp_path):
        atk = ADIL(victim, steps=2, n_atoms=4, batch_size=8,
                   cache=ArtifactCache(str(tmp_path)), model_name="auto1")
        assert atk.pipeline_epochs == "auto"
        import jax.numpy as jnp
        from dl_attack_on_imagenet_tpu.attacks import adil_core as core
        images = jnp.zeros((16, 32, 32, 3))
        state = core.init_state(jax.random.PRNGKey(0), (32, 32, 3), 16,
                                atk.cfg)
        assert atk._resolve_pipeline(images, state) is True

    def test_memory_edge_resolves_false(self, victim, dataset, tmp_path,
                                        monkeypatch):
        from dl_attack_on_imagenet_tpu.attacks import adil as adil_mod

        monkeypatch.setattr(adil_mod, "_device_memory_budget",
                            lambda: 1 << 20)  # 1 MiB budget
        atk = ADIL(victim, steps=2, n_atoms=4, batch_size=8,
                   cache=ArtifactCache(str(tmp_path)), model_name="auto2")
        import jax.numpy as jnp
        from dl_attack_on_imagenet_tpu.attacks import adil_core as core
        images = jnp.zeros((16, 32, 32, 3))
        state = core.init_state(jax.random.PRNGKey(0), (32, 32, 3), 16,
                                atk.cfg)
        assert atk._resolve_pipeline(images, state) is False
        # explicit True still forces the pipeline at the edge
        atk.pipeline_epochs = True
        assert atk._resolve_pipeline(images, state) is True
