"""Integration smoke tests mirroring the BASELINE.json benchmark configs
(scaled down to CPU-test size):

- config 1: pretrained-dictionary generation on a small val batch
- config 3: multi-model fooling + accuracy eval
- config 5: ViT attack + cross-architecture transfer sweep
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu import evaluation as ev
from dl_attack_on_imagenet_tpu.attacks import ADIL
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


def test_config1_pretrained_dict_generation(tmp_path):
    """Train once, persist, attack from the artifact in a fresh instance."""
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    cache = ArtifactCache(str(tmp_path))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (16, 32, 32, 3)))
    ds = ArrayDataset(x, np.zeros(16, np.int64))
    ADIL(victim, steps=3, n_atoms=4, batch_size=8, data_train=ds,
         cache=cache, model_name="c1")
    # "main.py parity": fresh attack object, dictionary loaded from disk
    atk = ADIL(victim, steps=3, n_atoms=4, cache=cache, model_name="c1",
               steps_inference=5)
    adv = atk(jnp.asarray(x[:4]))
    assert adv.shape == (4, 32, 32, 3)
    assert float(jnp.max(jnp.abs(adv - jnp.clip(jnp.asarray(x[:4]), 0, 1)))) > 0


def test_config5_vit_attack_and_transfer(tmp_path):
    """ADiL against a ViT victim + transfer matrix over CNN and ViT."""
    vit = create_model("vit_tiny", num_classes=10, rng=jax.random.PRNGKey(1),
                       input_size=32)
    cnn = create_model("tiny", rng=jax.random.PRNGKey(7))
    cache = ArtifactCache(str(tmp_path))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (12, 32, 32, 3)))
    ds = ArrayDataset(x, np.zeros(12, np.int64))

    atk = ADIL(vit, steps=3, n_atoms=4, batch_size=6, data_train=ds,
               cache=cache, model_name="vit", steps_inference=5)
    labels = np.asarray(vit.predict(jnp.asarray(x)))
    out = ev.get_transfer_performance(
        {"adil": [atk]}, {"vit": vit, "cnn": cnn}, [(x[:6], labels[:6])]
    )
    assert set(out["adil"].keys()) == {"vit", "cnn"}
    for perf in out["adil"].values():
        assert 0.0 <= perf["fooling_rate"] <= 1.0


def test_config3_multi_model_fooling_and_accuracy_drop(tmp_path):
    """Attack one victim, measure fooling + accuracy drop on several models
    (BASELINE config 3: 'multi-model eval: fooling rate + accuracy drop')."""
    from dl_attack_on_imagenet_tpu.attacks import PGD

    victims = {
        "a": create_model("tiny", rng=jax.random.PRNGKey(7)),
        "b": create_model("tiny", rng=jax.random.PRNGKey(8)),
    }
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (16, 32, 32, 3)))
    labels = np.asarray(victims["a"].predict(jnp.asarray(x)))
    ds = ArrayDataset(x, labels)

    atk = PGD(victims["a"], eps=16 / 255, alpha=4 / 255, steps=20)
    adv = np.asarray(atk(jnp.asarray(x), jnp.asarray(labels)))
    adv_ds = ArrayDataset(adv, labels)

    clean_acc = {n: ev.model_accuracy(ds, v) for n, v in victims.items()}
    adv_acc = {n: ev.model_accuracy(adv_ds, v) for n, v in victims.items()}
    fooling = {
        n: ev.compute_fooling_rate(v, adv, x, reduction="mean")
        for n, v in victims.items()
    }
    # White-box victim: strong fooling and a real accuracy drop.
    assert fooling["a"] >= 0.5
    assert adv_acc["a"] <= clean_acc["a"] - 0.5
    # Transfer victim: metrics defined and bounded.
    assert 0.0 <= fooling["b"] <= 1.0
    assert 0.0 <= adv_acc["b"] <= 1.0
