"""Data-parallel path tests on the virtual 8-device CPU mesh (SURVEY.md §4:
the JAX-native fake-backend equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.parallel import (
    data_mesh,
    distributed_env,
    learn_dictionary_distributed,
    make_dp_epoch_fn,
)
from dl_attack_on_imagenet_tpu.parallel.adil_dp import make_local_batches, shard_rows


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def dataset():
    key = jax.random.PRNGKey(3)
    images = np.asarray(jax.random.uniform(key, (32, 32, 32, 3)))
    return ArrayDataset(images, np.zeros((32,), np.int32))


CFG = AdilConfig(eps=8 / 255, n_atoms=5, loss="ce", steps=3, batch_size=16)


def test_data_mesh(devices):
    mesh = data_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    with pytest.raises(ValueError):
        data_mesh(999)


def test_distributed_env_defaults():
    env = distributed_env()
    assert not env.is_distributed
    assert env.process_id == 0


def test_make_local_batches_covers_all_rows():
    plans = make_local_batches(jax.random.PRNGKey(0), 30, 8, 16)
    assert plans.shape[0] == 8
    n_local = -(-30 // 8)  # 4
    for p in range(8):
        real = max(min(30 - p * n_local, n_local), 0)
        rows = plans[p][plans[p] >= 0]
        assert sorted(rows.tolist()) == list(range(real))


def test_shard_rows_pads(devices):
    mesh = data_mesh(8)
    arr = jnp.ones((30, 4))
    sharded = shard_rows(mesh, arr)
    assert sharded.shape == (32, 4)  # padded to multiple of 8


def test_dp_epoch_runs_and_replicates_d(victim, dataset, devices):
    mesh = data_mesh(8)
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = jax.random.PRNGKey(0)
    d = core.init_dictionary(key, dataset.image_shape, CFG)
    v = core.init_codes(key, 32, CFG, "distributed")
    images = shard_rows(mesh, jnp.asarray(dataset.images))
    labels = jax.device_put(
        core.predict_labels(victim.apply_fn, victim.variables, images),
        NamedSharding(mesh, P("data")),
    )
    v = jax.device_put(v, NamedSharding(mesh, P("data", None)))
    d = jax.device_put(d, NamedSharding(mesh, P(None, None, None, None)))
    opt = core.make_optimizer(CFG.step_size)
    od, ov = opt.init(d), opt.init(v)
    epoch_fn = make_dp_epoch_fn(victim.apply_fn, CFG, mesh)
    batches = jax.device_put(
        jnp.asarray(make_local_batches(key, 32, 8, 16)),
        NamedSharding(mesh, P("data", None, None)),
    )
    d2, od2, v2, ov2, loss, fool = epoch_fn(
        d, od, v, ov, images, labels, batches, victim.variables
    )
    assert np.isfinite(float(loss))
    # constraints hold
    assert float(jnp.max(jnp.abs(d2))) <= 1.0 + 1e-5
    assert float(jnp.max(jnp.sum(jnp.abs(v2), axis=1))) <= CFG.eps + 1e-4
    # d is replicated and consistent across devices
    shards = [np.asarray(s.data) for s in d2.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_learn_dictionary_distributed_end_to_end(victim, dataset, devices):
    mesh = data_mesh(8)
    d, v, history = learn_dictionary_distributed(
        victim, dataset, CFG, mesh, seed=0
    )
    assert d.shape == (5, 32, 32, 3)
    assert v.shape == (32, 5)
    assert len(history["loss"]) >= 1
    # training reduced the (maximization) objective
    assert history["loss"][-1] <= history["loss"][0]


def test_dp_matches_single_device_first_epoch_loss(victim, dataset, devices):
    """DP global metrics should be close to single-device on the same data
    (same algorithm; batching partition differs, so compare magnitudes)."""
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core

    mesh = data_mesh(8)
    cfg = AdilConfig(eps=8 / 255, n_atoms=5, loss="ce", steps=1, batch_size=32)
    d, v, hist_dp = learn_dictionary_distributed(victim, dataset, cfg, mesh, seed=0)

    images = jnp.asarray(dataset.images)
    labels = core.predict_labels(victim.apply_fn, victim.variables, images)
    state = core.init_state(jax.random.PRNGKey(0), dataset.image_shape, 32, cfg)
    epoch = core.make_epoch_fn(victim.apply_fn, cfg, "both")
    batches = core.make_batches(jax.random.PRNGKey(1), 32, 32)
    _, loss, _ = epoch(state, victim.variables, images, labels, batches)
    single = float(loss) / 32
    assert abs(hist_dp["loss"][0] - single) / max(abs(single), 1e-9) < 0.2
