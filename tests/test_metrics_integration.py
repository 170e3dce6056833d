"""ADIL metrics_log integration."""

import json

import jax
import numpy as np

from dl_attack_on_imagenet_tpu.attacks import ADIL
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


def test_adil_writes_metric_stream(tmp_path):
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3)))
    log_path = str(tmp_path / "metrics.jsonl")
    ADIL(victim, steps=3, n_atoms=4, batch_size=8,
         data_train=ArrayDataset(x, np.zeros(8, np.int64)),
         cache=ArtifactCache(str(tmp_path)), model_name="m",
         metrics_log=log_path)
    records = [json.loads(l) for l in open(log_path)]
    assert len(records) == 3
    assert {"step", "loss", "fooling", "val_fooling", "time"} <= set(records[0])
