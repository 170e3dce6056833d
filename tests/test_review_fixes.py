"""Regression tests for the round-1 code-review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import ADIL, PGD, RegularizedConfig
from dl_attack_on_imagenet_tpu.attacks.adil_regularized import sadil, sadil_updated
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


def test_pgd_random_start_differs_across_same_shape_calls(victim):
    """F6: equal-sized batches must draw different random restarts."""
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 3))
    atk = PGD(victim, eps=16 / 255, alpha=16 / 255, steps=1)
    a = atk(x)
    b = atk(x)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_sadil_trains_tail_rows(victim):
    """F4: images beyond the last full batch must still get nonzero codes."""
    x = jax.random.uniform(jax.random.PRNGKey(3), (10, 32, 32, 3))
    y = victim.predict(x)
    cfg = RegularizedConfig(lambda_l1=1e-6, lambda_l2=1e-6, n_atoms=4,
                            steps=5, step_size=300.0, batch_size=4,
                            targeted=False)
    for solver in (sadil, sadil_updated):
        d, v, _ = solver(victim.apply_fn, victim.variables, x, y, cfg,
                         jax.random.PRNGKey(0), nepochs=5)
        assert v.shape == (10, 4)
        tail = np.asarray(v[8:])
        assert np.abs(tail).max() > 0, f"{solver.__name__} left tail rows zero"


def test_streamed_checkpoint_resume(victim, tmp_path):
    """F5: checkpoint_every works on the streamed path."""
    cache = ArtifactCache(str(tmp_path))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (16, 32, 32, 3)))
    ds = ArrayDataset(x, np.zeros(16, np.int64))

    class Boom(Exception):
        pass

    atk = ADIL(victim, steps=5, n_atoms=4, batch_size=8, cache=cache,
               model_name="sck", checkpoint_every=1, stream=True)
    calls = {"n": 0}

    def bomb(d, dv):
        calls["n"] += 1
        if calls["n"] == 3:
            raise Boom()
        return 0.0

    atk._val_fooling = bomb
    with pytest.raises(Boom):
        atk.learn_dictionary(ds, ds)
    assert cache.exists("ImageNet", model="sck", kind="train_state")

    atk2 = ADIL(victim, steps=5, n_atoms=4, batch_size=8, cache=cache,
                model_name="sck", checkpoint_every=1, stream=True,
                data_train=ds)
    assert len(atk2.history["loss"]) == 5
    assert not cache.exists("ImageNet", model="sck", kind="train_state")


def test_performance_pads_to_stable_shape(victim):
    """F7: the attack must be called with the full batch shape even when
    some rows are filtered out."""
    from dl_attack_on_imagenet_tpu import evaluation as ev

    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3)))
    y = np.asarray(victim.predict(jnp.asarray(x))).copy()
    y[:3] = (y[:3] + 1) % 10  # 3 misclassified rows get filtered

    seen_shapes = []

    class Probe:
        def __call__(self, xi, yi):
            seen_shapes.append(tuple(xi.shape))
            return xi

    perf = ev.performance(Probe(), victim, [(x, y)])
    assert perf["num_samples"] == 5
    assert seen_shapes == [(8, 32, 32, 3)]  # padded back to the batch shape
