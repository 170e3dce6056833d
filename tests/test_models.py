"""Model-zoo tests: shapes, jit, determinism, gradient flow to the input.

Full-size zoo members are exercised at reduced input sizes where the
architecture allows it to keep CPU time sane; the attack-critical property —
gradients flowing through the frozen model to the image — is checked
explicitly (the defining compute pattern, SURVEY.md §1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.models import MODEL_REGISTRY, create_model


def test_registry_covers_reference_victims():
    # main.py:41-52 names; plus ViT (BASELINE.json config 5) and test tiny.
    for name in ["resnet", "densenet", "googlenet", "inception", "mobilenet", "vgg", "vit", "tiny"]:
        assert name in MODEL_REGISTRY


def test_unknown_name_raises():
    with pytest.raises(ValueError):
        create_model("nope")


@pytest.mark.parametrize("name,size", [("tiny", 32), ("vit_tiny", 32)])
def test_small_models_forward(name, size, rng):
    m = create_model(name, num_classes=10, rng=rng, input_size=size)
    x = jax.random.uniform(rng, (2, size, size, 3))
    logits = m(x)
    assert logits.shape[0] == 2
    assert jnp.all(jnp.isfinite(logits))


def test_tiny_deterministic(rng):
    m = create_model("tiny", rng=rng)
    x = jax.random.uniform(rng, (2, 32, 32, 3))
    np.testing.assert_array_equal(np.asarray(m(x)), np.asarray(m(x)))


def test_grad_flows_to_input_not_params(rng):
    m = create_model("tiny", rng=rng)
    x = jax.random.uniform(rng, (2, 32, 32, 3))

    def loss(img):
        return jnp.sum(m.apply_fn(m.variables, img))

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert float(jnp.max(jnp.abs(g))) > 0


def test_normalization_changes_logits(rng):
    # With normalization in-graph, shifting the input by mean should matter.
    m_norm = create_model("resnet18", num_classes=10, rng=rng, input_size=64)
    m_raw = create_model(
        "resnet18", num_classes=10, rng=rng, input_size=64, normalize=False,
        variables=m_norm.variables,
    )
    x = jax.random.uniform(rng, (1, 64, 64, 3))
    a = np.asarray(m_norm(x))
    b = np.asarray(m_raw(x))
    assert not np.allclose(a, b)


@pytest.mark.parametrize(
    "name,size",
    [
        ("resnet18", 64),
        ("resnet50", 64),
        ("vgg11", 32),
        ("densenet121", 64),
        ("mobilenet_v2", 64),
        ("googlenet", 64),
        ("inception_v3", 96),
        ("vit_b16", 32),
    ],
)
def test_zoo_architectures_build_and_run(name, size, rng):
    m = create_model(name, num_classes=10, rng=rng, input_size=size)
    x = jax.random.uniform(rng, (1, size, size, 3))
    logits = jax.jit(m.apply_fn)(m.variables, x)
    assert logits.shape == (1, 10)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_predict_returns_labels(rng):
    m = create_model("tiny", rng=rng)
    x = jax.random.uniform(rng, (4, 32, 32, 3))
    labels = m.predict(x)
    assert labels.shape == (4,)
    assert labels.dtype in (jnp.int32, jnp.int64)
