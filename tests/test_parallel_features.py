"""DP warm-start and validation-eval feature tests."""

import jax
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.parallel import data_mesh, learn_dictionary_distributed


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def dataset():
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (16, 32, 32, 3)))
    return ArrayDataset(images, np.zeros((16,), np.int64))


CFG = AdilConfig(eps=8 / 255, n_atoms=4, loss="ce", steps=2, batch_size=8,
                 steps_code=3)


def test_dp_warm_start_uses_d_init(victim, dataset, devices):
    mesh = data_mesh(8)
    d_init = np.full((4, 32, 32, 3), 0.123, np.float32)
    d, v, _ = learn_dictionary_distributed(
        victim, dataset, AdilConfig(eps=8 / 255, n_atoms=4, steps=0, batch_size=8),
        mesh, d_init=d_init,
    )
    np.testing.assert_allclose(np.asarray(d), d_init)  # 0 epochs: untouched


def test_dp_val_eval(victim, dataset, devices):
    mesh = data_mesh(8)
    val = ArrayDataset(dataset.images[:8], dataset.labels[:8])
    _, _, history = learn_dictionary_distributed(
        victim, dataset, CFG, mesh, data_val=val, val_every=1,
    )
    assert history["val_fooling"] is not None
    assert 0.0 <= history["val_fooling"] <= 1.0
