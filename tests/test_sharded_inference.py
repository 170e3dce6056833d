"""Data-parallel inference: attack forward over row-sharded batches.

BASELINE config 4 requires full-ImageNet-val adversarial generation
data-parallel across chips; the jitted inference solvers are per-image
independent, so feeding row-sharded inputs lets XLA run them SPMD with no
code changes. These tests prove that on the virtual mesh and check the
outputs match single-device results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dl_attack_on_imagenet_tpu.attacks import ADIL
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.parallel import data_mesh
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


@pytest.fixture(scope="module")
def attack(tmp_path_factory):
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (16, 32, 32, 3)))
    cache = ArtifactCache(str(tmp_path_factory.mktemp("dicts")))
    return ADIL(victim, steps=3, n_atoms=4, batch_size=8, loss="logits",
                data_train=ArrayDataset(x, np.zeros(16, np.int64)),
                cache=cache, model_name="shardinf", steps_inference=5)


def test_supervised_inference_on_sharded_batch(attack, devices):
    mesh = data_mesh(8)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    adv_sharded = attack(xs)
    adv_single = attack(x)
    np.testing.assert_allclose(
        np.asarray(adv_sharded), np.asarray(adv_single), atol=1e-5
    )


def test_unsupervised_inference_on_sharded_batch(attack, devices):
    attack.attack_mode = "unsupervised"
    mesh = data_mesh(8)
    x = jax.random.uniform(jax.random.PRNGKey(2), (16, 32, 32, 3))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    adv = attack(xs)
    assert adv.shape == x.shape
    assert float(jnp.max(jnp.abs(adv - x))) <= attack.cfg.eps + 1e-5
    attack.attack_mode = "supervised"
