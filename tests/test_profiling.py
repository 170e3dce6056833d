"""Profiling utility tests."""

import time

import numpy as np

from dl_attack_on_imagenet_tpu.utils import StepTimer, annotate, trace


def test_step_timer_excludes_warmup():
    t = StepTimer(warmup=1)
    for delay in (0.05, 0.01, 0.01):
        with t.step():
            time.sleep(delay)
    assert t.summary()["steps"] == 2
    assert t.mean < 0.03  # warmup 0.05s excluded


def test_step_timer_empty():
    t = StepTimer()
    assert np.isnan(t.summary()["mean_s"])


def test_annotate_and_trace_noop():
    with annotate("test/span"):
        pass
    with trace(None):
        pass


def test_adil_records_timing(tmp_path):
    import jax

    from dl_attack_on_imagenet_tpu.attacks import ADIL
    from dl_attack_on_imagenet_tpu.data import ArrayDataset
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.utils import ArtifactCache

    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3)))
    ds = ArrayDataset(images, np.zeros(8, np.int64))
    atk = ADIL(victim, steps=3, n_atoms=4, batch_size=8, data_train=ds,
               cache=ArtifactCache(str(tmp_path)), model_name="timing")
    assert atk.timing["steps"] >= 1
    assert atk.timing["steps_per_sec"] > 0
