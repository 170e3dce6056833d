"""Blocked-layout (space-to-depth) training pipeline is exactly equivalent.

The attack can keep its perturbation state in the S2D stem's compute layout:
images fed as ``space_to_depth(x)`` and the dictionary's 150528 columns
permuted to the same blocked order. Because AdamW is elementwise and both
dictionary projections are column-permutation-invariant (linf = elementwise
clamp; l2 = per-row norm), the blocked trajectory is the standard trajectory
under a fixed permutation — no transpose/copy chain in the backward
(BENCHMARKS.md round 2). These tests pin that equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.attacks import adil_core as core
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.models.layers import depth_to_space, space_to_depth


def test_space_to_depth_roundtrip():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
    xb = space_to_depth(x)
    assert xb.shape == (2, 4, 4, 12)
    np.testing.assert_array_equal(np.asarray(depth_to_space(xb)), np.asarray(x))


@pytest.fixture(scope="module")
def victims():
    """Unblocked s2d resnet18 and its blocked-input twin, SAME variables."""
    v = create_model("resnet18", rng=jax.random.PRNGKey(0), input_size=32,
                     stem_s2d=True)
    vb = create_model("resnet18", rng=jax.random.PRNGKey(0), input_size=32,
                      blocked_input=True, variables=v.variables)
    return v, vb


def test_blocked_forward_matches(victims):
    v, vb = victims
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    logits = v.apply_fn(v.variables, x)
    logits_b = vb.apply_fn(vb.variables, space_to_depth(x))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_b), atol=2e-5
    )


@pytest.mark.parametrize("norm", ["linf", "l2"])
def test_blocked_training_trajectory_matches(victims, norm):
    v, vb = victims
    cfg = AdilConfig(eps=8 / 255, norm=norm, n_atoms=4, loss="logits",
                     kappa=5.0, batch_size=4)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 32, 3))
    labels = core.predict_labels(v.apply_fn, v.variables, x)
    idx = jnp.arange(4)
    mask = jnp.ones((4,))

    state = core.init_state(jax.random.PRNGKey(3), (32, 32, 3), 4, cfg)
    # Same initial dictionary, columns permuted to blocked order.
    d_blocked = space_to_depth(core.d_image(state.d, (32, 32, 3))).reshape(4, -1)
    state_b = core.init_state(
        jax.random.PRNGKey(3), (16, 16, 12), 4, cfg, d_init=d_blocked
    )
    np.testing.assert_array_equal(np.asarray(state.v), np.asarray(state_b.v))

    step = jax.jit(core.make_train_step(v.apply_fn, cfg, "both"))
    step_b = jax.jit(core.make_train_step(vb.apply_fn, cfg, "both"))
    xb = space_to_depth(x)
    for _ in range(3):
        state, loss, fool = step(state, v.variables, x, labels, idx, mask)
        state_b, loss_b, fool_b = step_b(state_b, vb.variables, xb, labels, idx, mask)
        np.testing.assert_allclose(float(loss), float(loss_b), rtol=2e-4)
        assert float(fool) == float(fool_b)

    # AdamW's first steps move every element by ~±lr regardless of gradient
    # magnitude, so float-reassociation noise on near-zero gradient elements
    # (different conv layouts sum in different orders) flips a small
    # fraction of update signs — the same tolerance regime as the
    # cross-framework torch-parity tests. Require the overwhelming bulk of
    # the dictionary to match tightly.
    d_img = np.asarray(core.d_image(state.d, (32, 32, 3)))
    d_img_b = np.asarray(
        depth_to_space(core.d_image(state_b.d, (16, 16, 12)))
    )
    frac_off = np.mean(np.abs(d_img_b - d_img) > 1e-3)
    assert frac_off < 0.02, f"{frac_off:.4f} of D elements off by >1e-3"
    np.testing.assert_allclose(
        np.asarray(state_b.v), np.asarray(state.v), atol=2e-3
    )


def test_blocked_gradients_match_exactly(victims):
    """The crisp claim: per-step gradients are the SAME up to permutation."""
    v, vb = victims
    cfg = AdilConfig(eps=8 / 255, norm="linf", n_atoms=4, loss="logits",
                     kappa=5.0, batch_size=4)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 32, 3))
    labels = core.predict_labels(v.apply_fn, v.variables, x)
    mask = jnp.ones((4,))

    state = core.init_state(jax.random.PRNGKey(3), (32, 32, 3), 4, cfg)
    d_blocked = space_to_depth(core.d_image(state.d, (32, 32, 3))).reshape(4, -1)
    xb = space_to_depth(x)

    def loss_std(d, vv):
        return core._batch_loss(v.apply_fn, v.variables, d, vv, x, labels,
                                mask, cfg)[0]

    def loss_blk(d, vv):
        return core._batch_loss(vb.apply_fn, vb.variables, d, vv, xb, labels,
                                mask, cfg)[0]

    gd, gv = jax.grad(loss_std, argnums=(0, 1))(state.d, state.v)
    gd_b, gv_b = jax.grad(loss_blk, argnums=(0, 1))(d_blocked, state.v)

    gd_b_img = np.asarray(depth_to_space(core.d_image(gd_b, (16, 16, 12))))
    gd_img = np.asarray(core.d_image(gd, (32, 32, 3)))
    scale = np.abs(gd_img).max()
    np.testing.assert_allclose(gd_b_img, gd_img, atol=2e-4 * scale)
    np.testing.assert_allclose(
        np.asarray(gv_b), np.asarray(gv),
        atol=2e-4 * np.abs(np.asarray(gv)).max(),
    )
