"""ADILR solvers share ONE compile across hyper-parameter sweeps.

The reference's primary workflow is a hyper grid sweep
(demo_dL_attack.py:88-94 / performance.get_atks); the solvers here take
lambda_l1 / lambda_l2 / step sizes as TRACED arguments and are jitted
through module-level caches, so sweeping hyper values must not retrace —
these are the framework's heaviest compiles (~36 s each on the TPU tunnel,
BENCHMARKS.md).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import adil_regularized as ar
from dl_attack_on_imagenet_tpu.models import create_model

CFG = ar.RegularizedConfig(
    lambda_l1=0.1, lambda_l2=0.1, n_atoms=3, steps=2, step_size=0.01,
    batch_size=4, targeted=False, dict_set="l2ball",
)


@pytest.fixture(scope="module")
def setup():
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    images = jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3))
    labels = jnp.zeros((8,), jnp.int32)
    return victim, images, labels


def test_sadil_updated_sweep_no_retrace(setup):
    victim, images, labels = setup
    key = jax.random.PRNGKey(0)
    d1, v1, losses1 = ar.sadil_updated(
        victim.apply_fn, victim.variables, images, labels, CFG, key
    )
    epoch, d_update, full_loss = ar._sadil_updated_fns(
        victim.apply_fn, CFG.batch_size, CFG.dict_set
    )
    n_compiled = epoch._cache_size()
    assert n_compiled >= 1

    cfg2 = dataclasses.replace(CFG, lambda_l1=0.37, lambda_l2=0.02,
                               step_size=0.05)
    d2, v2, losses2 = ar.sadil_updated(
        victim.apply_fn, victim.variables, images, labels, cfg2, key
    )
    assert epoch._cache_size() == n_compiled, "hyper sweep retraced the epoch"

    # The hypers really flow through (traced, not baked): evaluating the
    # SAME jitted full_loss with different lam1 on a nonzero v must differ
    # by exactly (lam1_b - lam1_a) * ||v||_1.
    weights = jnp.ones((8,))
    v_nz = jnp.full((8, 3), 0.5)
    args = (victim.variables, images, labels, weights, d1, v_nz)
    la = float(full_loss(*args, jnp.float32(0.1), jnp.float32(0.1), jnp.float32(-1.0)))
    lb = float(full_loss(*args, jnp.float32(0.9), jnp.float32(0.1), jnp.float32(-1.0)))
    np.testing.assert_allclose(lb - la, 0.8 * float(jnp.sum(jnp.abs(v_nz))),
                               rtol=1e-4)
    assert full_loss._cache_size() <= 2  # one trace serves both evals


def test_adil_fb_sweep_no_retrace(setup):
    victim, images, labels = setup
    key = jax.random.PRNGKey(0)
    d1, v1, track1 = ar.adil_fb(
        victim.apply_fn, victim.variables, images, labels, CFG, key
    )
    run = ar._adil_fb_run(victim.apply_fn, CFG.dict_set, True, CFG.steps)
    n_compiled = run._cache_size()

    cfg2 = dataclasses.replace(CFG, lambda_l1=0.4, lambda_l2=0.3)
    d2, v2, track2 = ar.adil_fb(
        victim.apply_fn, victim.variables, images, labels, cfg2, key
    )
    assert run._cache_size() == n_compiled
    assert track1.shape == track2.shape == (CFG.steps,)


def test_learn_coding_vectors_shared_across_instances(setup):
    victim, images, labels = setup
    d = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3)) * 0.01
    v1 = ar.learn_coding_vectors(
        victim.apply_fn, victim.variables, d, images, labels, CFG, niter=5
    )
    run = ar._lcv_run(victim.apply_fn, 5)
    n_compiled = run._cache_size()
    # A near-zero vs huge l1 weight through the SAME compiled solver: the
    # strong threshold must keep v at zero while the weak one moves it.
    cfg_weak = dataclasses.replace(CFG, lambda_l1=1e-6)
    cfg_strong = dataclasses.replace(CFG, lambda_l1=1e6)
    v_weak = ar.learn_coding_vectors(
        victim.apply_fn, victim.variables, d, images, labels, cfg_weak, niter=5
    )
    v_strong = ar.learn_coding_vectors(
        victim.apply_fn, victim.variables, d, images, labels, cfg_strong, niter=5
    )
    assert run._cache_size() == n_compiled
    assert v1.shape == v_weak.shape == (8, 3)
    assert float(jnp.max(jnp.abs(v_strong))) == 0.0
    assert float(jnp.max(jnp.abs(v_weak))) > 0.0
