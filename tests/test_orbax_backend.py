"""Orbax ArtifactCache backend tests."""

import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.utils import ArtifactCache


def test_orbax_roundtrip(tmp_path):
    cache = ArtifactCache(str(tmp_path), backend="orbax")
    payload = {"d": np.random.default_rng(0).random((4, 8, 8, 3)).astype(np.float32),
               "loss": np.asarray([1.0, 0.5])}
    p = cache.save(payload, "ImageNet", model="x")
    assert cache.exists("ImageNet", model="x")
    out = cache.load("ImageNet", model="x")
    np.testing.assert_allclose(out["d"], payload["d"])
    np.testing.assert_allclose(out["loss"], payload["loss"])


def test_orbax_missing_returns_none(tmp_path):
    cache = ArtifactCache(str(tmp_path), backend="orbax")
    assert cache.load("ImageNet", model="nope") is None
    assert not cache.exists("ImageNet", model="nope")


def test_unknown_backend_raises(tmp_path):
    with pytest.raises(ValueError):
        ArtifactCache(str(tmp_path), backend="pickle")


def test_adil_with_orbax_cache(tmp_path):
    import jax

    from dl_attack_on_imagenet_tpu.attacks import ADIL
    from dl_attack_on_imagenet_tpu.data import ArrayDataset
    from dl_attack_on_imagenet_tpu.models import create_model

    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3)))
    cache = ArtifactCache(str(tmp_path), backend="orbax")
    atk = ADIL(victim, steps=2, n_atoms=4, batch_size=8,
               data_train=ArrayDataset(x, np.zeros(8, np.int64)),
               cache=cache, model_name="orb", steps_inference=3)
    # fresh instance loads the dictionary from the orbax artifact
    atk2 = ADIL(victim, steps=2, n_atoms=4, cache=cache, model_name="orb",
                steps_inference=3)
    adv = atk2(np.asarray(x[:2]))
    assert adv.shape == (2, 32, 32, 3)
