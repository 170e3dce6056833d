"""Chained-scan training paths are trajectory-identical to per-step dispatch.

``make_train_scan`` (n fixed-batch steps in one dispatch — the reference's
``steps_in`` inner repetitions, adil.py:265-316) and
``make_epoch_fn_presliced`` (epoch scan over pre-gathered batches) must
reproduce the exact per-step trajectory of ``make_train_step`` /
``make_epoch_fn`` — they are the bench/production fast paths
(BENCHMARKS.md round 2), so equality here is what licenses the headline
measurement protocol.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.attacks import adil_core as core
from dl_attack_on_imagenet_tpu.models import create_model

CFG = AdilConfig(eps=8 / 255, norm="linf", n_atoms=5, loss="logits",
                 kappa=5.0, steps=3, batch_size=8)


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def data(victim):
    images = jax.random.uniform(jax.random.PRNGKey(3), (20, 32, 32, 3))
    labels = core.predict_labels(victim.apply_fn, victim.variables, images)
    return images, labels


def _tree_close(a, b, atol=1e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_train_scan_matches_stepwise(victim, data):
    images, labels = data
    x, lab = images[:8], labels[:8]
    idx = jnp.arange(8)
    mask = jnp.ones((8,))

    state = core.init_state(jax.random.PRNGKey(0), (32, 32, 3), 20, CFG)
    step = jax.jit(core.make_train_step(victim.apply_fn, CFG, "both"))
    ref_losses = []
    ref_state = state
    for _ in range(3):
        ref_state, loss, fooling = step(ref_state, victim.variables, x, lab, idx, mask)
        ref_losses.append(float(loss))

    state2 = core.init_state(jax.random.PRNGKey(0), (32, 32, 3), 20, CFG)
    scan = core.make_train_scan(victim.apply_fn, CFG, "both", n_steps=3)
    out_state, losses, foolings = scan(state2, victim.variables, x, lab, idx, mask)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses), rtol=1e-5)
    _tree_close((out_state.d, out_state.v), (ref_state.d, ref_state.v))


def test_uap_presliced_epoch_matches_gather_epoch(victim, data):
    from dl_attack_on_imagenet_tpu.attacks.uap_pgd import (
        UAPPGD,
        make_uap_epoch_fn,
        make_uap_epoch_fn_presliced,
    )

    images, labels = data
    uap = UAPPGD(victim, steps=1, batch_size=8, eps=0.05, norm="linf")
    batches = core.make_batches(jax.random.PRNGKey(4), 20, 8)
    e0 = jnp.zeros((1, 32, 32, 3))
    opt0 = uap.make_optimizer().init(e0)

    fn = make_uap_epoch_fn(victim.apply_fn, uap, None)
    e_a, _, loss_a, fool_a = fn(e0, opt0, images, labels, batches)

    fn_p = make_uap_epoch_fn_presliced(victim.apply_fn, uap)
    xs, ys, idx_b = core.preslice_epoch(images, labels, batches)
    e_b, _, loss_b, fool_b = fn_p(e0, opt0, xs, ys, idx_b)

    np.testing.assert_allclose(np.asarray(e_a), np.asarray(e_b), atol=1e-6)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    assert float(fool_a) == float(fool_b)


def test_presliced_epoch_matches_gather_epoch(victim, data):
    images, labels = data
    # 20 images, batch 8 -> 3 batches with 4 padded (-1) slots: exercises
    # the mask path in both epoch variants.
    batches = core.make_batches(jax.random.PRNGKey(11), 20, 8)
    assert int(jnp.sum(batches < 0)) == 4

    state_a = core.init_state(jax.random.PRNGKey(5), (32, 32, 3), 20, CFG)
    epoch = core.make_epoch_fn(victim.apply_fn, CFG, "both")
    state_a, loss_a, fool_a = epoch(state_a, victim.variables, images, labels, batches)

    state_b = core.init_state(jax.random.PRNGKey(5), (32, 32, 3), 20, CFG)
    epoch_p = core.make_epoch_fn_presliced(victim.apply_fn, CFG, "both")
    xs, labels_b, idx_b = core.preslice_epoch(images, labels, batches)
    assert xs.shape == (3, 8, 32, 32, 3)
    state_b, loss_b, fool_b = epoch_p(state_b, victim.variables, xs, labels_b, idx_b)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    assert float(fool_a) == float(fool_b)
    _tree_close((state_a.d, state_a.v), (state_b.d, state_b.v))
    assert int(state_b.epoch) == 1
