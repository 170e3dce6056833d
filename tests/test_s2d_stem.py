"""Space-to-depth stem: exact functional equivalence with the standard stem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.models import create_model


def _remap_params(std_vars):
    """Move the standard stem's params into the S2DStem layout."""
    import copy

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, std_vars["params"]))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, std_vars["batch_stats"]))
    stem = params.pop("ConvBN_0")
    stem_stats = stats.pop("ConvBN_0")
    params["S2DStem_0"] = {
        "kernel": stem["Conv_0"]["kernel"],
        "BatchNorm_0": stem["BatchNorm_0"],
    }
    stats["S2DStem_0"] = {"BatchNorm_0": stem_stats["BatchNorm_0"]}
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("size", [64, 224])
def test_s2d_stem_matches_standard(size, rng):
    if size == 224:
        pytest.skip("224 full-size covered on TPU drive; CPU test uses 64")
    std = create_model("resnet18", num_classes=10, rng=rng, input_size=size)
    import dataclasses

    from dl_attack_on_imagenet_tpu.models.resnet import resnet18

    s2d_module = resnet18(num_classes=10, stem_s2d=True)
    s2d_vars = _remap_params(std.variables)

    x = jax.random.uniform(rng, (2, size, size, 3))
    a = np.asarray(std.module.apply(std.variables, x))
    b = np.asarray(s2d_module.apply(s2d_vars, x))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_s2d_stem_gradient_matches(rng):
    """Input gradients (the attack-critical quantity) agree too."""
    std = create_model("resnet18", num_classes=10, rng=rng, input_size=64)
    from dl_attack_on_imagenet_tpu.models.resnet import resnet18

    s2d_module = resnet18(num_classes=10, stem_s2d=True)
    s2d_vars = _remap_params(std.variables)
    x = jax.random.uniform(rng, (2, 64, 64, 3))

    g_std = jax.grad(lambda x: jnp.sum(std.module.apply(std.variables, x)))(x)
    g_s2d = jax.grad(lambda x: jnp.sum(s2d_module.apply(s2d_vars, x)))(x)
    np.testing.assert_allclose(np.asarray(g_std), np.asarray(g_s2d), atol=2e-4)


def test_odd_input_falls_back(rng):
    """Odd spatial sizes can't be 2x2-blocked; the standard stem is used."""
    from dl_attack_on_imagenet_tpu.models.resnet import resnet18

    m = resnet18(num_classes=10, stem_s2d=True)
    x = jnp.zeros((1, 65, 65, 3))
    variables = m.init(rng, x)
    assert "ConvBN_0" in variables["params"]  # fell back
    out = m.apply(variables, x)
    assert out.shape == (1, 10)


# --- relu <-> max_pool commutation (the stem pool reorder in ResNet) --------


def test_relu_pool_commute_values_and_grads():
    """max_pool(relu(y)) == relu(max_pool(y)) exactly, values AND gradients.

    ResNet computes the stem relu after the pool (resnet.py) so the relu +
    activation save run at 56x56 instead of 112x112; this must be a pure
    graph reorder. Tie-heavy quantized inputs cover the subgradient edge
    cases (equal maxima, exact zeros).
    """
    import flax.linen as nn

    for seed, quantize in [(0, False), (1, True)]:
        y = jax.random.normal(jax.random.PRNGKey(seed), (2, 12, 12, 5))
        if quantize:
            y = jnp.round(y)  # exact ties incl. zeros

        def a(v):
            return nn.max_pool(nn.relu(v), window_shape=(3, 3),
                               strides=(2, 2), padding=((1, 1), (1, 1)))

        def b(v):
            return nn.relu(nn.max_pool(v, window_shape=(3, 3),
                                       strides=(2, 2), padding=((1, 1), (1, 1))))

        np.testing.assert_array_equal(np.asarray(a(y)), np.asarray(b(y)))
        co = jax.random.normal(jax.random.PRNGKey(seed + 10), a(y).shape)
        ga = jax.grad(lambda v: jnp.sum(a(v) * co))(y)
        gb = jax.grad(lambda v: jnp.sum(b(v) * co))(y)
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def _remap_densenet(std_vars):
    """DenseNet stem (top-level Conv_0 + BatchNorm_0) -> S2DStem layout."""
    import copy

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, std_vars["params"]))
    stats = copy.deepcopy(jax.tree_util.tree_map(np.asarray, std_vars["batch_stats"]))
    conv = params.pop("Conv_0")
    bn = params.pop("BatchNorm_0")
    bn_stats = stats.pop("BatchNorm_0")
    params["S2DStem_0"] = {"kernel": conv["kernel"], "BatchNorm_0": bn}
    stats["S2DStem_0"] = {"BatchNorm_0": bn_stats}
    # With the stem BN inside S2DStem, the final top-level BatchNorm is the
    # first (and only) auto-named one: BatchNorm_1 -> BatchNorm_0.
    params["BatchNorm_0"] = params.pop("BatchNorm_1")
    stats["BatchNorm_0"] = stats.pop("BatchNorm_1")
    return {"params": params, "batch_stats": stats}


def test_densenet_s2d_stem_matches_standard(rng):
    from dl_attack_on_imagenet_tpu.models.densenet import densenet121

    std = create_model("densenet121", num_classes=10, rng=rng, input_size=64)
    s2d_module = densenet121(num_classes=10, stem_s2d=True)
    s2d_vars = _remap_densenet(std.variables)
    x = jax.random.uniform(rng, (2, 64, 64, 3))
    a = np.asarray(std.module.apply(std.variables, x))
    b = np.asarray(s2d_module.apply(s2d_vars, x))
    np.testing.assert_allclose(a, b, atol=2e-4)
    g_std = jax.grad(lambda x: jnp.sum(std.module.apply(std.variables, x)))(x)
    g_s2d = jax.grad(lambda x: jnp.sum(s2d_module.apply(s2d_vars, x)))(x)
    np.testing.assert_allclose(np.asarray(g_std), np.asarray(g_s2d), atol=2e-4)


def test_googlenet_s2d_stem_matches_standard(rng):
    # Remap is identical to ResNet's (ConvBN_0 stem), but the stem BN runs
    # at BasicConv2d's eps=0.001 — S2DStem(bn_eps=1e-3) must match.
    from dl_attack_on_imagenet_tpu.models.googlenet import googlenet

    std = create_model("googlenet", num_classes=10, rng=rng, input_size=64)
    s2d_module = googlenet(num_classes=10, stem_s2d=True)
    s2d_vars = _remap_params(std.variables)
    # The two post-stem top-level ConvBNs renumber once the stem ConvBN is
    # replaced by S2DStem: ConvBN_1/2 -> ConvBN_0/1.
    for tree in (s2d_vars["params"], s2d_vars["batch_stats"]):
        tree["ConvBN_0"] = tree.pop("ConvBN_1")
        tree["ConvBN_1"] = tree.pop("ConvBN_2")
    x = jax.random.uniform(rng, (2, 64, 64, 3))
    a = np.asarray(std.module.apply(std.variables, x))
    b = np.asarray(s2d_module.apply(s2d_vars, x))
    np.testing.assert_allclose(a, b, atol=2e-4)
    g_std = jax.grad(lambda x: jnp.sum(std.module.apply(std.variables, x)))(x)
    g_s2d = jax.grad(lambda x: jnp.sum(s2d_module.apply(s2d_vars, x)))(x)
    np.testing.assert_allclose(np.asarray(g_std), np.asarray(g_s2d), atol=2e-4)
