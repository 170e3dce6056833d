"""ADIL eps/kappa hyper sweeps share one compiled epoch.

`make_epoch_fn_presliced_swept` binds eps/kappa as traced args over a
module-cached jitted epoch, so the reference's grid sweep
(demo_dL_attack.py:88-94 — kappa and eps vary, shapes don't) compiles
once. Trajectory equality with the statically-baked epoch is also pinned.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.attacks import adil_core as core
from dl_attack_on_imagenet_tpu.models import create_model

CFG = AdilConfig(eps=8 / 255, norm="linf", n_atoms=4, loss="logits",
                 kappa=10.0, batch_size=8)


@pytest.fixture(scope="module")
def setup():
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    images = jax.random.uniform(jax.random.PRNGKey(3), (16, 32, 32, 3))
    labels = core.predict_labels(victim.apply_fn, victim.variables, images)
    return victim, images, labels


def _one_epoch(epoch_fn, victim, images, labels, cfg):
    state = core.init_state(jax.random.PRNGKey(5), (32, 32, 3), 16, cfg)
    batches = core.make_batches(jax.random.PRNGKey(11), 16, 8)
    xs, lb, ib = core.preslice_epoch(images, labels, batches)
    return epoch_fn(state, victim.variables, xs, lb, ib)


def test_swept_epoch_matches_static(setup):
    victim, images, labels = setup
    st_a, loss_a, fool_a = _one_epoch(
        core.make_epoch_fn_presliced(victim.apply_fn, CFG, "both"),
        victim, images, labels, CFG,
    )
    st_b, loss_b, fool_b = _one_epoch(
        core.make_epoch_fn_presliced_swept(victim.apply_fn, CFG, "both"),
        victim, images, labels, CFG,
    )
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    assert float(fool_a) == float(fool_b)
    np.testing.assert_allclose(np.asarray(st_a.d), np.asarray(st_b.d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_a.v), np.asarray(st_b.v), atol=1e-5)


def test_eps_kappa_sweep_shares_compile(setup):
    victim, images, labels = setup
    _one_epoch(
        core.make_epoch_fn_presliced_swept(victim.apply_fn, CFG, "both"),
        victim, images, labels, CFG,
    )
    cached = core._swept_epoch_cache(
        victim.apply_fn, dataclasses.replace(CFG, eps=-1.0, kappa=-1.0), "both"
    )
    n_compiled = cached._cache_size()
    assert n_compiled >= 1

    losses = []
    for eps, kappa in ((4 / 255, 5.0), (16 / 255, 50.0), (2 / 255, 0.0)):
        cfg = dataclasses.replace(CFG, eps=eps, kappa=kappa)
        _, loss, _ = _one_epoch(
            core.make_epoch_fn_presliced_swept(victim.apply_fn, cfg, "both"),
            victim, images, labels, cfg,
        )
        losses.append(float(loss))
    assert cached._cache_size() == n_compiled, "eps/kappa sweep retraced"
    # Hypers flow: different budgets give different losses.
    assert len(set(np.round(losses, 4))) > 1

    # Budget actually enforced per combo: eps=2/255 run projects v tighter.
    cfg_small = dataclasses.replace(CFG, eps=2 / 255)
    st, _, _ = _one_epoch(
        core.make_epoch_fn_presliced_swept(victim.apply_fn, cfg_small, "both"),
        victim, images, labels, cfg_small,
    )
    assert float(jnp.max(jnp.sum(jnp.abs(st.v), axis=1))) <= 2 / 255 + 1e-5


def test_blocked_twin_memoized_across_instances():
    """Sweep combos share the victim's blocked twin (and therefore its
    apply_fn — the swept-epoch compile-cache key). Round-2 review finding:
    rebuilding the twin per training call defeated the sweep reuse."""
    from dl_attack_on_imagenet_tpu.attacks import ADIL

    victim = create_model("resnet18", rng=jax.random.PRNGKey(0),
                          input_size=32, stem_s2d=True)
    a = ADIL(victim, n_atoms=4, eps=4 / 255, kappa=5.0)
    b = ADIL(victim, n_atoms=4, eps=16 / 255, kappa=50.0)
    twin_a = a._blocked_victim((32, 32, 3))
    twin_b = b._blocked_victim((32, 32, 3))
    assert twin_a is not None
    assert twin_a is twin_b
    assert twin_a.apply_fn is twin_b.apply_fn


def test_inference_solver_sweep_reuse(setup):
    """The class's jitted inference solvers are shared across instances and
    across eps/kappa combos (module-level cache, traced hypers)."""
    from dl_attack_on_imagenet_tpu.attacks import ADIL
    from dl_attack_on_imagenet_tpu.attacks.adil import _solver_cache

    victim, images, labels = setup
    d = jax.random.uniform(jax.random.PRNGKey(8), (4, 32, 32, 3),
                           minval=-1.0, maxval=1.0)
    x = images[:4]

    a = ADIL(victim, n_atoms=4, eps=4 / 255, kappa=5.0, steps_inference=3)
    adv_a = a._ddrague_fn(victim.variables, d, x)
    fns = _solver_cache(victim.apply_fn, a.cfg)
    n_compiled = fns["ddrague"]._cache_size()
    assert n_compiled >= 1

    b = ADIL(victim, n_atoms=4, eps=16 / 255, kappa=50.0, steps_inference=3)
    adv_b = b._ddrague_fn(victim.variables, d, x)
    assert fns["ddrague"]._cache_size() == n_compiled, "eps/kappa retraced"
    # eps really flows: the wider budget moves further from the originals.
    da = float(jnp.abs(adv_a - x).max())
    db = float(jnp.abs(adv_b - x).max())
    assert db > da
