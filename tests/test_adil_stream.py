"""Host-streamed dictionary learning: equivalence with the resident path."""

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
    key = jax.random.PRNGKey(3)
    images = np.asarray(jax.random.uniform(key, (20, 32, 32, 3)))
    return ArrayDataset(images, np.zeros((20,), np.int64))


def test_streamed_training_runs(victim, dataset, tmp_path):
    atk = ADIL(victim, steps=3, n_atoms=4, batch_size=8, data_train=dataset,
               cache=ArtifactCache(str(tmp_path)), model_name="stream",
               stream=True)
    assert len(atk.history["loss"]) >= 1
    # ragged final batch (20 = 8+8+4) handled via masking
    assert np.isfinite(atk.history["loss"][-1])
    adv = atk(jnp.asarray(dataset.images[:4]))
    assert adv.shape == (4, 32, 32, 3)


def test_streamed_loss_close_to_resident(victim, dataset, tmp_path):
    """Same algorithm, same shapes — first-epoch loss should be in the same
    ballpark as the resident path (batch order differs)."""
    a = ADIL(victim, steps=1, n_atoms=4, batch_size=10, data_train=dataset,
             cache=ArtifactCache(str(tmp_path / "a")), model_name="s1",
             stream=True, seed=0)
    b = ADIL(victim, steps=1, n_atoms=4, batch_size=10, data_train=dataset,
             cache=ArtifactCache(str(tmp_path / "b")), model_name="s2",
             stream=False, seed=0)
    la, lb = a.history["loss"][0], b.history["loss"][0]
    assert abs(la - lb) / max(abs(lb), 1e-9) < 0.25


def test_auto_stream_threshold(victim, dataset):
    atk = ADIL.__new__(ADIL)
    atk.stream = None
    assert not atk._should_stream(dataset)
    atk.stream = True
    assert atk._should_stream(dataset)
