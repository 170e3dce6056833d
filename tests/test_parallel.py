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


def test_dp_matches_partition_matched_serial_replay(victim, dataset, devices):
    """ADIL DP training == serial replay EXACTLY (VERDICT r3 missing #3).

    The serial replay runs the identical math on one device with each step's
    global batch being the union of the per-device local batches
    (``global_batches_from_local``), so the psum'd D-grad equals the serial
    sum and the whole (d, v, optimizer) trajectory must match to float
    tolerance over multiple epochs — replacing the old 20%-magnitude smoke
    check. Reference: adil.py:334-430.
    """
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core
    from dl_attack_on_imagenet_tpu.parallel.adil_dp import (
        global_batches_from_local,
        label_rows_sharded,
        make_dp_replay_epoch_fn,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = data_mesh(8)
    n_dev, n = 8, 32
    n_local = n // n_dev
    cfg = AdilConfig(eps=8 / 255, n_atoms=5, loss="ce", steps=3, batch_size=16)

    # Mirror learn_dictionary_distributed's init sequence exactly.
    key = jax.random.PRNGKey(0)
    kd, kv, key = jax.random.split(key, 3)
    d0 = core.init_dictionary(kd, dataset.image_shape, cfg).reshape(cfg.n_atoms, -1)
    v0 = core.init_codes(kv, n, cfg, mode="distributed")

    images = jnp.asarray(dataset.images, jnp.float32)
    images_dp = shard_rows(mesh, images)
    labels_dp = label_rows_sharded(victim.apply_fn, victim.variables, images_dp, mesh)
    labels = core.predict_labels(victim.apply_fn, victim.variables, images)
    np.testing.assert_array_equal(np.asarray(labels_dp), np.asarray(labels))

    opt_d = core.make_optimizer(cfg.step_size)
    opt_v = core.make_optimizer(cfg.step_size)

    d_dp = jax.device_put(d0, NamedSharding(mesh, P(None, None)))
    v_dp = jax.device_put(v0, NamedSharding(mesh, P("data", None)))
    od_dp, ov_dp = opt_d.init(d_dp), opt_v.init(v_dp)
    epoch_dp = make_dp_epoch_fn(victim.apply_fn, cfg, mesh)

    d_sr, v_sr = d0, v0
    od_sr, ov_sr = opt_d.init(d_sr), opt_v.init(v_sr)
    epoch_sr = make_dp_replay_epoch_fn(victim.apply_fn, cfg)

    key_epochs = jax.random.PRNGKey(42)
    for _ in range(cfg.steps):
        key_epochs, sub = jax.random.split(key_epochs)
        plans = make_local_batches(sub, n, n_dev, cfg.batch_size)
        batches_dp = jax.device_put(
            jnp.asarray(plans), NamedSharding(mesh, P("data", None, None))
        )
        d_dp, od_dp, v_dp, ov_dp, loss_dp, fool_dp = epoch_dp(
            d_dp, od_dp, v_dp, ov_dp, images_dp, labels_dp, batches_dp,
            victim.variables,
        )
        batches_sr = jnp.asarray(global_batches_from_local(plans, n_local))
        d_sr, od_sr, v_sr, ov_sr, loss_sr, fool_sr = epoch_sr(
            d_sr, od_sr, v_sr, ov_sr, images, labels, batches_sr,
            victim.variables,
        )
        np.testing.assert_allclose(
            float(loss_dp), float(loss_sr), rtol=1e-5, atol=1e-5
        )
        assert float(fool_dp) == float(fool_sr)
        np.testing.assert_allclose(
            np.asarray(d_dp), np.asarray(d_sr), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(v_dp), np.asarray(v_sr), atol=1e-5
        )
