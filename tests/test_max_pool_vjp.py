"""The custom max_pool VJP must match XLA's select_and_scatter EXACTLY.

jax.grad of a plain reduce-window max lowers to select_and_scatter; the
optional replacement in models/layers.py (ADIL_MAXPOOL_VJP=1) recomputes
the same first-match gradient with fusable elementwise ops. Ties are the dangerous case — ReLU outputs
are full of equal zeros — so inputs here are quantized to force heavy ties.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.models.layers import _max_pool_custom as max_pool

CASES = [
    ((3, 3), (2, 2), "SAME"),
    ((3, 3), (2, 2), ((1, 1), (1, 1))),  # torch MaxPool2d(3,2,1)
    ((2, 2), (2, 2), "VALID"),
    ((3, 3), (1, 1), "SAME"),
    ((3, 3), (2, 2), "VALID"),
]


def _check_grads(x, g_seed, window, strides, padding, rtol=2e-6):
    ref_fn = lambda v: nn.max_pool(v, window_shape=window, strides=strides,
                                   padding=padding)
    new_fn = lambda v: max_pool(v, window, strides, padding)
    y = ref_fn(x)
    np.testing.assert_array_equal(np.asarray(new_fn(x)), np.asarray(y))
    co = jax.random.normal(jax.random.PRNGKey(g_seed), y.shape, y.dtype)
    a = np.asarray(jax.grad(lambda v: jnp.sum(ref_fn(v) * co))(x))
    b = np.asarray(jax.grad(lambda v: jnp.sum(new_fn(v) * co))(x))
    # The gradient SUPPORT (which elements were selected — incl. ties) must
    # match select_and_scatter exactly; values only to fp tolerance because
    # contributions from overlapping windows accumulate in different orders.
    np.testing.assert_array_equal(a != 0, b != 0)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=1e-6)


@pytest.mark.parametrize("window,strides,padding", CASES)
def test_gradient_matches_select_and_scatter(window, strides, padding):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 12, 3))
    _check_grads(x, 1, window, strides, padding)


@pytest.mark.parametrize("window,strides,padding", CASES)
def test_gradient_matches_on_heavy_ties(window, strides, padding):
    # 3-level quantized (lots of exact ties, incl. relu-style zeros)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 13, 11, 4))
    x = jnp.maximum(jnp.round(x), 0.0)
    _check_grads(x, 3, window, strides, padding)


def test_gradient_matches_bf16():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 8), jnp.bfloat16)
    _check_grads(x, 5, (3, 3), (2, 2), ((1, 1), (1, 1)), rtol=0.1)  # bf16: ~1 ulp reorder noise


def test_second_order_input_grad_through_pool():
    # The attack differentiates wrt the IMAGE through the whole victim; make
    # sure grad-of-grad style use (jacobians in DeepFool) doesn't crash.
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 2))

    def f(v):
        return jnp.sum(max_pool(v, (2, 2), (2, 2), "VALID") ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape


# --- 'slices' mode: forward as a max-tree over window taps -----------------

from dl_attack_on_imagenet_tpu.models.layers import _max_pool_slices


@pytest.mark.parametrize("window,strides,padding", CASES)
def test_slices_forward_exact(window, strides, padding):
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 13, 11, 4))
    y = nn.max_pool(x, window_shape=window, strides=strides, padding=padding)
    np.testing.assert_array_equal(
        np.asarray(_max_pool_slices(x, window, strides, padding)),
        np.asarray(y),
    )


@pytest.mark.parametrize("window,strides,padding", CASES)
def test_slices_gradient_tie_free(window, strides, padding):
    # Continuous random inputs: window maxima are unique, so the max-tree
    # subgradient equals select_and_scatter exactly.
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 12, 12, 3))
    ref_fn = lambda v: nn.max_pool(v, window_shape=window, strides=strides,
                                   padding=padding)
    new_fn = lambda v: _max_pool_slices(v, window, strides, padding)
    co = jax.random.normal(jax.random.PRNGKey(9), ref_fn(x).shape)
    a = np.asarray(jax.grad(lambda v: jnp.sum(ref_fn(v) * co))(x))
    b = np.asarray(jax.grad(lambda v: jnp.sum(new_fn(v) * co))(x))
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-6)


@pytest.mark.parametrize("window,strides,padding", CASES)
def test_slices_gradient_conserved_on_ties(window, strides, padding):
    # On exact ties the max-tree SPLITS the gradient among maxima (a valid
    # subgradient) instead of first-match; per-window mass is conserved, so
    # the total gradient mass must equal select_and_scatter's.
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 13, 11, 4))
    x = jnp.maximum(jnp.round(x), 0.0)
    ref_fn = lambda v: nn.max_pool(v, window_shape=window, strides=strides,
                                   padding=padding)
    new_fn = lambda v: _max_pool_slices(v, window, strides, padding)
    y = ref_fn(x)
    co = jnp.ones_like(y)
    a = np.asarray(jax.grad(lambda v: jnp.sum(ref_fn(v) * co))(x))
    b = np.asarray(jax.grad(lambda v: jnp.sum(new_fn(v) * co))(x))
    np.testing.assert_allclose(a.sum(), b.sum(), rtol=1e-5)
