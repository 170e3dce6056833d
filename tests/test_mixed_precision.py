"""Mixed-precision (perturb_dtype='bfloat16') training-path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.attacks import adil_core as core
from dl_attack_on_imagenet_tpu.models import create_model


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


def test_bf16_step_trains_and_projects(victim, rng):
    cfg = AdilConfig(eps=8 / 255, n_atoms=4, loss="ce", batch_size=8,
                     perturb_dtype="bfloat16")
    x = jax.random.uniform(rng, (8, 32, 32, 3))
    labels = core.predict_labels(victim.apply_fn, victim.variables, x)
    state = core.init_state(rng, (32, 32, 3), 8, cfg)
    step = core.make_train_step(victim.apply_fn, cfg, "both")
    idx = jnp.arange(8)
    mask = jnp.ones((8,))
    losses = []
    for _ in range(5):
        state, loss, fooling = step(state, victim.variables, x, labels, idx, mask)
        losses.append(float(loss))
        # master state stays fp32 and projected
        assert state.d.dtype == jnp.float32
        assert state.v.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(state.d))) <= 1.0 + 1e-6
        assert float(jnp.max(jnp.sum(jnp.abs(state.v), axis=1))) <= cfg.eps + 1e-4
    assert losses[-1] < losses[0]


def test_bf16_close_to_fp32_trajectory(victim, rng):
    x = jax.random.uniform(rng, (8, 32, 32, 3))
    labels = core.predict_labels(victim.apply_fn, victim.variables, x)
    idx = jnp.arange(8)
    mask = jnp.ones((8,))
    losses = {}
    for dtype in ("float32", "bfloat16"):
        cfg = AdilConfig(eps=8 / 255, n_atoms=4, loss="ce", batch_size=8,
                         perturb_dtype=dtype)
        state = core.init_state(jax.random.PRNGKey(0), (32, 32, 3), 8, cfg)
        step = core.make_train_step(victim.apply_fn, cfg, "both")
        ls = []
        for _ in range(3):
            state, loss, _ = step(state, victim.variables, x, labels, idx, mask)
            ls.append(float(loss))
        losses[dtype] = ls
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"], rtol=0.02)


def test_bf16_inference_solvers_match_fp32(victim, rng):
    """perturb_dtype='bfloat16' inference: fp32 master/clamps, bf16 inner
    forward — adversaries stay close to the fp32 solver and the returned
    tensors are fp32 with budget/pixel invariants intact."""
    x = jax.random.uniform(rng, (6, 32, 32, 3))
    d = jax.random.uniform(jax.random.PRNGKey(5), (4, 32, 32, 3),
                           minval=-1.0, maxval=1.0)
    base = AdilConfig(eps=8 / 255, n_atoms=4, loss="ce", steps_inference=5,
                      steps_code=5)
    import dataclasses

    mixed = dataclasses.replace(base, perturb_dtype="bfloat16")

    adv_a = core.supervised_ddrague(victim.apply_fn, victim.variables, d, x, base)
    adv_b = core.supervised_ddrague(victim.apply_fn, victim.variables, d, x, mixed)
    assert adv_b.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(adv_a - adv_b))) < 0.05
    assert float(jnp.min(adv_b)) >= 0.0 and float(jnp.max(adv_b)) <= 1.0

    adv_a = core.supervised_adamw_codes(victim.apply_fn, victim.variables, d, x, base)
    adv_b = core.supervised_adamw_codes(victim.apply_fn, victim.variables, d, x, mixed)
    assert adv_b.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(adv_a - adv_b))) < 0.05
    # Hard-budget contract of the v-space solver holds in mixed precision:
    # the fp32 master v is projected onto the eps l1-ball and |D|<=1, so
    # ||adv - x||_inf <= eps (x is already in [0,1], so the pixel clip
    # cannot enlarge the difference).
    dv = adv_b - x
    assert float(jnp.max(jnp.abs(dv))) <= base.eps + 1e-5


def test_class_exposes_perturb_dtype(victim, tmp_path):
    """The ADIL ctor plumbs perturb_dtype into its config (round-2: the
    class previously could not reach the mixed-precision path at all)."""
    from dl_attack_on_imagenet_tpu.attacks import ADIL
    from dl_attack_on_imagenet_tpu.utils import ArtifactCache

    atk = ADIL(victim, n_atoms=4, perturb_dtype="bfloat16",
               cache=ArtifactCache(str(tmp_path)))
    assert atk.cfg.perturb_dtype == "bfloat16"
    assert ADIL(victim, n_atoms=4).cfg.perturb_dtype == "float32"


def test_perturb_dtype_validated():
    with pytest.raises(ValueError):
        AdilConfig(perturb_dtype="bf16")


def test_bf16_with_blocked_training_end_to_end(tmp_path):
    """blocked='auto' + perturb_dtype='bfloat16' together (the headline
    class configuration, benchmarks/class_e2e.py) trains and saves a
    presentation-shape artifact with constraints intact."""
    from dl_attack_on_imagenet_tpu.attacks import ADIL
    from dl_attack_on_imagenet_tpu.data import ArrayDataset
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.utils import ArtifactCache

    victim = create_model("resnet18", rng=jax.random.PRNGKey(0),
                          input_size=32, stem_s2d=True)
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (12, 32, 32, 3)))
    ds = ArrayDataset(images, np.zeros((12,), np.int32))
    atk = ADIL(victim, eps=8 / 255, steps=3, n_atoms=4, batch_size=6,
               loss="ce", cache=ArtifactCache(str(tmp_path)), val_every=None,
               perturb_dtype="bfloat16", blocked=True)
    atk.learn_dictionary(ds)
    payload = atk.cache.load("ImageNet", model=atk.model_name)
    d = payload["d"]
    assert d.shape == (4, 32, 32, 3)
    assert d.dtype == np.float32  # master state stayed fp32
    assert np.abs(d).max() <= 1.0 + 1e-6
    v = payload["v"]
    assert np.abs(v).sum(axis=1).max() <= 8 / 255 + 1e-4


def test_bf16_dp_training(victim):
    """The mesh path honors perturb_dtype through the shared _batch_loss."""
    from dl_attack_on_imagenet_tpu.data import ArrayDataset
    from dl_attack_on_imagenet_tpu.parallel import (
        data_mesh,
        learn_dictionary_distributed,
    )

    cfg = AdilConfig(eps=8 / 255, n_atoms=4, loss="ce", steps=1,
                     batch_size=8, perturb_dtype="bfloat16")
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (16, 32, 32, 3)))
    ds = ArrayDataset(images, np.zeros((16,), np.int32))
    d, v, hist = learn_dictionary_distributed(victim, ds, cfg, data_mesh(4))
    assert np.isfinite(hist["loss"][0])
    assert np.asarray(d).dtype == np.float32
    assert np.abs(np.asarray(d)).max() <= 1.0 + 1e-6
