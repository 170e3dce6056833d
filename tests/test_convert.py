"""Weight-converter tests: round trips through torch-style state dicts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.models.convert import (
    convert_torch_state_dict,
    convert_vit_state_dict,
    flax_to_torch_state_dict,
)


@pytest.mark.parametrize(
    "name,size",
    [("resnet18", 64), ("vgg11", 32), ("mobilenet_v2", 64), ("densenet121", 64),
     ("googlenet", 64)],
)
def test_sequence_roundtrip(name, size, rng):
    """flax -> torch-style dict -> flax must reproduce identical logits."""
    m = create_model(name, num_classes=10, rng=rng, input_size=size)
    sd = flax_to_torch_state_dict(m.variables)
    # Scramble: rebuild variables from a fresh init, then convert sd onto it.
    m2 = create_model(name, num_classes=10, rng=jax.random.PRNGKey(123), input_size=size)
    restored = convert_torch_state_dict(sd, m2.variables)
    x = jax.random.uniform(rng, (1, size, size, 3))
    a = np.asarray(m.module.apply(m.variables, x))
    b = np.asarray(m.module.apply(restored, x))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_real_torchvision_resnet18_key_order(rng):
    """Conversion must work with a state_dict in GENUINE torchvision order
    and naming — conv before bn, stem first, downsample last per block,
    num_batches_tracked interleaved (the review-found failure mode: the old
    alphabetical walk paired the stem conv with a block BatchNorm)."""
    m = create_model("resnet18", num_classes=10, rng=rng, input_size=64)

    # torchvision resnet18 key order:
    keys = ["conv1.weight"] + [f"bn1.{s}" for s in
            ("weight", "bias", "running_mean", "running_var", "num_batches_tracked")]
    blocks = {1: 2, 2: 2, 3: 2, 4: 2}
    for layer, nblocks in blocks.items():
        for b in range(nblocks):
            pre = f"layer{layer}.{b}"
            for conv in (1, 2):
                keys.append(f"{pre}.conv{conv}.weight")
                keys += [f"{pre}.bn{conv}.{s}" for s in
                         ("weight", "bias", "running_mean", "running_var",
                          "num_batches_tracked")]
            if layer > 1 and b == 0:
                keys.append(f"{pre}.downsample.0.weight")
                keys += [f"{pre}.downsample.1.{s}" for s in
                         ("weight", "bias", "running_mean", "running_var",
                          "num_batches_tracked")]
    keys += ["fc.weight", "fc.bias"]

    # Values: take our model's tensors in execution order (the inverse
    # transform emits exactly the torch-layout sequence).
    seq = list(flax_to_torch_state_dict(m.variables).values())
    sd = {}
    it = iter(seq)
    for k in keys:
        if k.endswith("num_batches_tracked"):
            sd[k] = np.zeros((), np.int64)
        else:
            sd[k] = next(it)
    assert next(it, None) is None  # consumed everything

    m2 = create_model("resnet18", num_classes=10, rng=jax.random.PRNGKey(42),
                      input_size=64)
    restored = convert_torch_state_dict(sd, m2.variables)
    x = jax.random.uniform(rng, (1, 64, 64, 3))
    np.testing.assert_allclose(
        np.asarray(m.module.apply(m.variables, x)),
        np.asarray(m.module.apply(restored, x)),
        atol=1e-5,
    )


def test_count_mismatch_raises(rng):
    m = create_model("tiny", rng=rng)
    sd = flax_to_torch_state_dict(m.variables)
    sd.pop(next(iter(sd)))
    with pytest.raises(ValueError, match="count mismatch"):
        convert_torch_state_dict(sd, m.variables)


def test_shape_mismatch_raises(rng):
    m = create_model("tiny", rng=rng)
    sd = flax_to_torch_state_dict(m.variables)
    k = next(iter(sd))
    sd[k] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError):
        convert_torch_state_dict(sd, m.variables)


def test_vit_converter_roundtrip(rng):
    """Build a torchvision-style vit state_dict from flax params, convert,
    and check logits match."""
    m = create_model("vit_tiny", num_classes=10, rng=rng, input_size=32)
    p = jax.tree_util.tree_map(np.asarray, m.variables["params"])
    d = p["cls_token"].shape[-1]
    heads = 4
    hd = d // heads
    sd = {}
    sd["class_token"] = p["cls_token"].reshape(1, 1, d)
    sd["conv_proj.weight"] = np.transpose(p["Conv_0"]["kernel"], (3, 2, 0, 1))
    sd["conv_proj.bias"] = p["Conv_0"]["bias"]
    sd["encoder.pos_embedding"] = p["pos_embedding"]
    n_layers = len([k for k in p if k.startswith("EncoderBlock_")])
    for i in range(n_layers):
        blk = p[f"EncoderBlock_{i}"]
        pre = f"encoder.layers.encoder_layer_{i}"
        sd[f"{pre}.ln_1.weight"] = blk["LayerNorm_0"]["scale"]
        sd[f"{pre}.ln_1.bias"] = blk["LayerNorm_0"]["bias"]
        sd[f"{pre}.ln_2.weight"] = blk["LayerNorm_1"]["scale"]
        sd[f"{pre}.ln_2.bias"] = blk["LayerNorm_1"]["bias"]
        attn = blk["MultiHeadDotProductAttention_0"]
        w = np.concatenate(
            [attn[proj]["kernel"].reshape(d, d).T for proj in ("query", "key", "value")]
        )
        b = np.concatenate(
            [attn[proj]["bias"].reshape(d) for proj in ("query", "key", "value")]
        )
        sd[f"{pre}.self_attention.in_proj_weight"] = w
        sd[f"{pre}.self_attention.in_proj_bias"] = b
        sd[f"{pre}.self_attention.out_proj.weight"] = attn["out"]["kernel"].reshape(d, d).T
        sd[f"{pre}.self_attention.out_proj.bias"] = attn["out"]["bias"]
        sd[f"{pre}.mlp.0.weight"] = blk["MlpBlock_0"]["Dense_0"]["kernel"].T
        sd[f"{pre}.mlp.0.bias"] = blk["MlpBlock_0"]["Dense_0"]["bias"]
        sd[f"{pre}.mlp.3.weight"] = blk["MlpBlock_0"]["Dense_1"]["kernel"].T
        sd[f"{pre}.mlp.3.bias"] = blk["MlpBlock_0"]["Dense_1"]["bias"]
    sd["encoder.ln.weight"] = p["LayerNorm_0"]["scale"]
    sd["encoder.ln.bias"] = p["LayerNorm_0"]["bias"]
    sd["heads.head.weight"] = p["Dense_0"]["kernel"].T
    sd["heads.head.bias"] = p["Dense_0"]["bias"]

    m2 = create_model("vit_tiny", num_classes=10, rng=jax.random.PRNGKey(5), input_size=32)
    restored = convert_vit_state_dict(sd, m2.variables, num_heads=heads)
    x = jax.random.uniform(rng, (1, 32, 32, 3))
    a = np.asarray(m.module.apply(m.variables, x))
    b = np.asarray(m.module.apply(restored, x))
    np.testing.assert_allclose(a, b, atol=1e-5)
