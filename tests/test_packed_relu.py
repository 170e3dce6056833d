"""Bit-packed relu backward (ADIL_RELU=packed) — exactness pins.

The attack differentiates through a FROZEN victim wrt its input only
(adil.py:168-191 backward reaches D/v, never the weights), so saved
activations feed nothing but relu masks and the pool argmax. The packed
mode stores the x>0 mask 8-per-uint8 instead of letting autodiff save the
full-width pre-activation; these tests pin that the swap is bit-exact —
values AND gradients, including the x == 0 convention (zero gradient,
matching jax.nn.relu's custom_jvp) and bf16 activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.models import layers


@pytest.mark.parametrize("c", [1, 7, 8, 13, 64])
def test_pack_roundtrip(c):
    b = jax.random.bernoulli(jax.random.PRNGKey(c), 0.5, (3, 5, c))
    m = layers._pack_bits(b)
    assert m.dtype == jnp.uint8
    assert m.shape == (3, 5, -(-c // 8))
    assert (layers._unpack_bits(m, c) == b).all()


@pytest.mark.parametrize("fn", ["_packed_relu", "_bool_relu"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_mask_relu_bit_equal(fn, dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 5, 13)).astype(dtype)
    x = x.at[0, 0, 0, 0].set(0.0)  # the tie case: gradient must be 0
    y1, g1 = jax.value_and_grad(lambda x: jnp.sum(jax.nn.relu(x) ** 2))(x)
    y2, g2 = jax.value_and_grad(
        lambda x: jnp.sum(getattr(layers, fn)(x) ** 2))(x)
    assert y1 == y2
    assert (g1 == g2).all()
    assert g1[0, 0, 0, 0] == 0


def test_resnet_packed_mode_bit_equal(monkeypatch):
    """Model-level: the dispatcher's mask modes leave the victim function
    (and the attack-relevant input gradients) bit-identical."""
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    outs = {}
    for mode in ("plain", "packed", "bool"):
        monkeypatch.setattr(layers, "_RELU_MODE", mode)
        v = create_model("resnet18", rng=jax.random.PRNGKey(0),
                         dtype=jnp.float32, stem_s2d=True, fold_bn=True)
        logits = v.apply_fn(v.variables, x)
        grad = jax.grad(lambda x: v.apply_fn(v.variables, x).sum())(x)
        outs[mode] = (logits, grad)
    for mode in ("packed", "bool"):
        assert (outs["plain"][0] == outs[mode][0]).all()
        assert (outs["plain"][1] == outs[mode][1]).all()
