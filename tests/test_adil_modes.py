"""ADIL targeted and l2-norm mode coverage."""

import jax
import jax.numpy as jnp
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
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (16, 32, 32, 3)))
    return ArrayDataset(images, np.zeros((16,), np.int64))


def test_l2_norm_training_and_inference(victim, dataset, tmp_path):
    atk = ADIL(victim, eps=1.0, norm="l2", steps=3, n_atoms=4, batch_size=8,
               data_train=dataset, cache=ArtifactCache(str(tmp_path)),
               model_name="l2", steps_inference=5)
    # dictionary atoms live in the unit l2 ball under the l2 budget
    d = atk._load_dictionary()
    norms = jnp.linalg.norm(d.reshape(4, -1), axis=1)
    assert bool(jnp.all(norms <= 1.0 + 1e-4))
    x = jnp.asarray(dataset.images[:4])
    adv = atk(x)
    assert float(adv.min()) >= 0 and float(adv.max()) <= 1


def test_targeted_training_runs(victim, dataset, tmp_path):
    atk = ADIL(victim, eps=16 / 255, steps=3, n_atoms=4, batch_size=8,
               targeted=True, loss="logits", data_train=dataset,
               cache=ArtifactCache(str(tmp_path)), model_name="tgt",
               steps_inference=10)
    assert atk.cfg.coeff == 1.0  # targeted flips the CE sign convention
    x = jnp.asarray(dataset.images[:4])
    adv = atk(x, victim.predict(x))
    assert adv.shape == (4, 32, 32, 3)


def test_l2_unsupervised_sampling(victim, dataset, tmp_path):
    atk = ADIL(victim, eps=1.0, norm="l2", steps=2, n_atoms=4, batch_size=8,
               trials=3, attack="unsupervised", data_train=dataset,
               cache=ArtifactCache(str(tmp_path)), model_name="l2u")
    x = jnp.asarray(dataset.images[:4])
    adv = atk(x)
    assert adv.shape == x.shape
