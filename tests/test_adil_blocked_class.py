"""Class-level blocked-layout training: auto-dispatch + unblocked artifacts.

`ADIL(blocked='auto')` trains ResNet victims in the s2d compute layout
(see tests/test_blocked_pipeline.py for the core equivalence) but every
user-visible surface — saved dictionary, inference, val fooling — stays in
the standard (K, H, W, C) presentation. These tests pin the dispatch rules
and the boundary conversions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import ADIL
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


@pytest.fixture(scope="module")
def victim():
    return create_model("resnet18", rng=jax.random.PRNGKey(0), input_size=32,
                        stem_s2d=True)


@pytest.fixture(scope="module")
def dataset():
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (12, 32, 32, 3)))
    return ArrayDataset(images, np.zeros((12,), np.int32))


def _train(victim, dataset, tmp_path, tag, **kw):
    atk = ADIL(victim, eps=8 / 255, steps=3, n_atoms=4, batch_size=6,
               loss="ce", cache=ArtifactCache(str(tmp_path / tag)),
               val_every=None, seed=0, **kw)
    atk.learn_dictionary(dataset)
    payload = atk.cache.load("ImageNet", model=atk.model_name)
    return atk, payload


def test_blocked_dispatch_rules(victim, dataset):
    atk = ADIL(victim, n_atoms=4, blocked="auto")
    assert atk._blocked_victim((32, 32, 3)) is not None
    assert atk._blocked_victim((31, 32, 3)) is None  # odd spatial dim
    atk_off = ADIL(victim, n_atoms=4, blocked=False)
    assert atk_off._blocked_victim((32, 32, 3)) is None
    tiny = create_model("tiny", rng=jax.random.PRNGKey(1))
    atk_tiny = ADIL(tiny, n_atoms=4, blocked="auto")
    assert atk_tiny._blocked_victim((32, 32, 3)) is None  # unsupported model


def test_blocked_training_artifact_is_presentation_shape(
    victim, dataset, tmp_path
):
    atk_b, pay_b = _train(victim, dataset, tmp_path, "blocked", blocked=True)
    assert pay_b["d"].shape == (4, 32, 32, 3)
    atk_s, pay_s = _train(victim, dataset, tmp_path, "std", blocked=False)
    assert pay_s["d"].shape == (4, 32, 32, 3)

    # Same seed, same batches: trajectories agree up to AdamW float-noise
    # sign flips on near-zero gradients (see test_blocked_pipeline.py).
    np.testing.assert_allclose(pay_b["loss"], pay_s["loss"], rtol=2e-3)
    frac_off = np.mean(np.abs(pay_b["d"] - pay_s["d"]) > 1e-3)
    assert frac_off < 0.05, f"{frac_off:.4f} of D differs by >1e-3"

    # Inference consumes the saved dictionary through the STANDARD victim.
    x = jnp.asarray(dataset.images[:4])
    adv = atk_b(x, jnp.zeros((4,), jnp.int32))
    assert adv.shape == x.shape
    assert bool(jnp.all(adv >= 0)) and bool(jnp.all(adv <= 1))


def test_plain_resnet_victim_falls_back_to_standard(dataset, tmp_path):
    """A ConvBN-stem ResNet (stem_s2d=False) has no S2DStem in its
    parameter tree — blocked='auto' must NOT build a twin for it
    (round-2 review finding: the twin crashed on apply)."""
    plain = create_model("resnet18", rng=jax.random.PRNGKey(2), input_size=32)
    atk = ADIL(plain, n_atoms=4, blocked="auto")
    assert atk._blocked_victim((32, 32, 3)) is None
    # End-to-end: training runs on the standard path without error.
    atk2, payload = _train(plain, dataset, tmp_path, "plain")
    assert payload["d"].shape == (4, 32, 32, 3)


def test_blocked_twin_propagates_normalization(victim):
    """The twin must reproduce the victim's normalization settings
    (round-2 review finding: a normalize=False victim got a normalizing
    twin, silently training against a different function)."""
    raw = create_model("resnet18", rng=jax.random.PRNGKey(0), input_size=32,
                       stem_s2d=True, normalize=False)
    atk = ADIL(raw, n_atoms=4, blocked=True)
    twin = atk._blocked_victim((32, 32, 3))
    assert twin is not None and twin.normalize is False
    from dl_attack_on_imagenet_tpu.models.layers import space_to_depth

    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 32, 32, 3))
    np.testing.assert_allclose(
        np.asarray(raw.apply_fn(raw.variables, x)),
        np.asarray(twin.apply_fn(twin.variables, space_to_depth(x))),
        atol=2e-5,
    )


def test_blocked_checkpoint_kind_is_distinct(victim, dataset, tmp_path):
    atk, _ = _train(victim, dataset, tmp_path, "ck", blocked=True,
                    checkpoint_every=100)
    atk._train_blocked = True
    assert atk._train_ckpt_key()["kind"] == "train_state_s2d"
    atk._train_blocked = False
    assert atk._train_ckpt_key()["kind"] == "train_state"


def test_blocked_inference_matches_standard(victim, dataset, tmp_path):
    """Supervised inference routed through the blocked twin stays close to
    the standard-path solver (exact math under the column permutation;
    float reassociation only)."""
    atk_b, _ = _train(victim, dataset, tmp_path, "inf", blocked=True)
    # Same trained artifact, standard inference path.
    atk_s = ADIL(victim, eps=8 / 255, steps=3, n_atoms=4, batch_size=6,
                 loss="ce", cache=atk_b.cache, val_every=None, seed=0,
                 blocked=False)
    x = jnp.asarray(dataset.images[:6])
    y = jnp.zeros((6,), jnp.int32)

    # Measured deltas are ~1e-7 (CPU); 1e-4 is far inside the eps budget
    # (8/255 ≈ 0.031) while robust to platform reassociation.
    adv_b = np.asarray(atk_b(x, y))
    adv_s = np.asarray(atk_s(x, y))
    assert np.max(np.abs(adv_b - adv_s)) < 1e-4
    assert np.mean(np.abs(adv_b - adv_s)) < 1e-5

    sol_b = np.asarray(atk_b.forward_supervised_adamw(x))
    sol_s = np.asarray(atk_s.forward_supervised_adamw(x))
    assert np.max(np.abs(sol_b - sol_s)) < 1e-4
    assert np.mean(np.abs(sol_b - sol_s)) < 1e-5


def test_dp_blocked_matches_standard(victim, dataset):
    """The mesh path's blocked='auto' layout produces the standard-path
    result (same d_init, same batches; psum of D-grads is elementwise so
    it commutes with the column permutation)."""
    import jax.numpy as jnp

    from dl_attack_on_imagenet_tpu.attacks import AdilConfig
    from dl_attack_on_imagenet_tpu.parallel import (
        data_mesh,
        learn_dictionary_distributed,
    )

    cfg = AdilConfig(eps=8 / 255, n_atoms=4, loss="ce", steps=2, batch_size=8)
    mesh = data_mesh(4)
    d_init = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(9), (4, 32, 32, 3),
                           minval=-1.0, maxval=1.0)
    )
    d_a, v_a, hist_a = learn_dictionary_distributed(
        victim, dataset, cfg, mesh, d_init=jnp.asarray(d_init), blocked=False,
    )
    d_b, v_b, hist_b = learn_dictionary_distributed(
        victim, dataset, cfg, mesh, d_init=jnp.asarray(d_init), blocked="auto",
    )
    assert d_b.shape == (4, 32, 32, 3)  # presentation restored
    # The history records which layout actually trained (mirrored into
    # ADIL.trained_blocked by the class mesh branch).
    assert hist_a["blocked"] is False and hist_b["blocked"] is True
    np.testing.assert_allclose(hist_a["loss"], hist_b["loss"], rtol=2e-3)
    frac_off = np.mean(np.abs(np.asarray(d_a) - np.asarray(d_b)) > 1e-3)
    assert frac_off < 0.05, f"{frac_off:.4f} of D differs by >1e-3"
    np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_b), atol=2e-3)


@pytest.mark.parametrize("name", ["densenet121", "googlenet"])
def test_blocked_pipeline_beyond_resnet(name, dataset, tmp_path):
    """DenseNet/GoogLeNet share ResNet's 7x7/s2 stem, so stem_s2d victims
    get the blocked training pipeline too (round 3). Twin == standard on
    the same variables, and blocked training reproduces the standard
    trajectory with unblocked artifacts."""
    from dl_attack_on_imagenet_tpu.models import blocked_twin
    from dl_attack_on_imagenet_tpu.models.layers import space_to_depth

    v = create_model(name, num_classes=10, rng=jax.random.PRNGKey(5),
                     input_size=32, stem_s2d=True)
    twin = blocked_twin(v)
    assert twin is not None
    x = jnp.asarray(dataset.images[:4])
    a = np.asarray(v(x))
    b = np.asarray(twin.apply_fn(twin.variables, space_to_depth(x)))
    np.testing.assert_allclose(a, b, atol=2e-4)

    atk_b, pay_b = _train(v, dataset, tmp_path, f"blk_{name}", blocked="auto")
    assert atk_b.trained_blocked
    assert pay_b["d"].shape == (4, 32, 32, 3)
    atk_s, pay_s = _train(v, dataset, tmp_path, f"std_{name}", blocked=False)
    np.testing.assert_allclose(pay_b["loss"], pay_s["loss"], rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(pay_b["d"], pay_s["d"], atol=2e-4)


def test_mesh_class_path_sets_trained_blocked(victim, dataset, tmp_path):
    """ADIL.learn_dictionary on a mesh mirrors the DP run's layout into
    trained_blocked (round-3 review finding: the mesh branch left the flag
    stale/False for blocked DP runs)."""
    from dl_attack_on_imagenet_tpu.parallel import data_mesh

    mesh = data_mesh(4)
    atk, _ = _train(victim, dataset, tmp_path, "mesh_blk", mesh=mesh,
                    blocked="auto")
    assert atk.trained_blocked is True
    atk_s, _ = _train(victim, dataset, tmp_path, "mesh_std", mesh=mesh,
                      blocked=False)
    assert atk_s.trained_blocked is False


def test_dp_blocked_beyond_resnet(dataset):
    """The mesh path's blocked='auto' works for the round-3 s2d victims
    (DenseNet shares ResNet's stem geometry) and reproduces the standard
    mesh trajectory."""
    import jax.numpy as jnp

    from dl_attack_on_imagenet_tpu.attacks import AdilConfig
    from dl_attack_on_imagenet_tpu.parallel import (
        data_mesh,
        learn_dictionary_distributed,
    )

    v = create_model("densenet121", num_classes=10, rng=jax.random.PRNGKey(6),
                     input_size=32, stem_s2d=True)
    cfg = AdilConfig(eps=8 / 255, n_atoms=4, loss="ce", steps=2, batch_size=8)
    mesh = data_mesh(4)
    d_init = jnp.asarray(
        np.asarray(jax.random.uniform(jax.random.PRNGKey(9), (4, 32, 32, 3),
                                      minval=-1.0, maxval=1.0))
    )
    d_a, v_a, hist_a = learn_dictionary_distributed(
        v, dataset, cfg, mesh, d_init=d_init, blocked=False,
    )
    d_b, v_b, hist_b = learn_dictionary_distributed(
        v, dataset, cfg, mesh, d_init=d_init, blocked="auto",
    )
    assert d_b.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(hist_a["loss"], hist_b["loss"], rtol=2e-3)
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), atol=2e-3)


@pytest.mark.parametrize("name", ["densenet121", "googlenet"])
def test_blocked_inference_beyond_resnet(name, dataset, tmp_path):
    """Supervised inference routes through the blocked twin for the new
    s2d victims and matches the standard-layout solve."""
    v = create_model(name, num_classes=10, rng=jax.random.PRNGKey(7),
                     input_size=32, stem_s2d=True)
    atk, payload = _train(v, dataset, tmp_path, f"inf_{name}",
                          blocked="auto", steps_inference=3)
    x = jnp.asarray(dataset.images[:4])
    adv_fast = atk(x)
    atk.blocked = False  # _blocked_victim now returns None -> standard path
    adv_std = atk(x)
    np.testing.assert_allclose(np.asarray(adv_fast), np.asarray(adv_std),
                               atol=2e-4)
