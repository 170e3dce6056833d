"""Tests for DeepFool, UAP-PGD, Fast-UAP, universal perturbation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import (
    DeepFool,
    DeepFoolCosinus,
    FastUAP,
    UAPPGD,
    deepfool_batch,
    universal_perturbation,
)
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def dataset(victim):
    key = jax.random.PRNGKey(3)
    images = np.asarray(jax.random.uniform(key, (16, 32, 32, 3)))
    labels = np.asarray(victim.predict(jnp.asarray(images)))
    return ArrayDataset(images, labels)


class TestDeepFool:
    def test_fools_most_images(self, victim, dataset):
        x = jnp.asarray(dataset.images[:8])
        r_tot, iters = deepfool_batch(
            victim.apply_fn, victim.variables, x, num_classes=5, max_iter=20
        )
        assert r_tot.shape == x.shape
        clean = victim.predict(x)
        adv = victim.predict(x + r_tot)
        fooled = float(jnp.mean((clean != adv).astype(jnp.float32)))
        assert fooled >= 0.5  # minimal-perturbation attack should mostly work
        assert bool(jnp.all(iters >= 1))

    def test_perturbation_is_small(self, victim, dataset):
        x = jnp.asarray(dataset.images[:8])
        r_tot, _ = deepfool_batch(
            victim.apply_fn, victim.variables, x, num_classes=5, max_iter=20
        )
        # DeepFool finds *minimal* perturbations — should be far below image norm
        rel = float(jnp.linalg.norm(r_tot) / jnp.linalg.norm(x))
        assert rel < 0.5

    def test_class_wrapper(self, victim, dataset):
        atk = DeepFool(victim, num_classes=5, steps=20)
        adv = atk(jnp.asarray(dataset.images[:4]))
        assert adv.shape == (4, 32, 32, 3)
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1

    def test_already_fooled_image_untouched(self, victim, dataset):
        # If max_iter=0 no perturbation is applied at all.
        x = jnp.asarray(dataset.images[:2])
        r_tot, iters = deepfool_batch(
            victim.apply_fn, victim.variables, x, num_classes=5, max_iter=0
        )
        np.testing.assert_array_equal(np.asarray(r_tot), 0)
        np.testing.assert_array_equal(np.asarray(iters), 0)


class TestUAPPGD:
    def test_learn_and_forward(self, victim, dataset, tmp_path):
        cache = ArtifactCache(str(tmp_path))
        atk = UAPPGD(
            victim, data_train=dataset, data_val=dataset, steps=3,
            batch_size=8, eps=0.1, norm="linf", step_size=0.05,
            cache=cache, model_name="uap",
        )
        assert cache.exists("UAPPGD", model="uap")
        e = atk.attack_vec
        assert e.shape == (1, 32, 32, 3)
        assert float(jnp.max(jnp.abs(e))) <= 0.1 + 1e-5
        adv = atk(jnp.asarray(dataset.images[:4]))
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        assert len(atk.history["fooling_rate"]) == 3

    def test_l2_projection(self, victim, dataset, tmp_path):
        cache = ArtifactCache(str(tmp_path))
        atk = UAPPGD(
            victim, data_train=dataset, steps=2, batch_size=8, eps=0.5,
            norm="l2", step_size=0.5, cache=cache, model_name="uapl2",
        )
        assert float(jnp.linalg.norm(atk.attack_vec)) <= 0.5 + 1e-4

    def test_epoch_compile_shared_across_instances(self, victim, dataset,
                                                   tmp_path):
        # The reference driver constructs one attack per victim/eps combo
        # (demo_dL_attack.py:71-90); instances with different beta/eps must
        # reuse ONE jitted epoch (beta/eps are traced args — the
        # per-instance re-trace cost ~15 s wall on the TPU tunnel,
        # BENCHMARKS.md round 3).
        from dl_attack_on_imagenet_tpu.attacks.uap_pgd import (
            _uap_epoch_cache, make_uap_epoch_fn,
        )

        cache = ArtifactCache(str(tmp_path))
        a1 = UAPPGD(victim, data_train=dataset, steps=2, batch_size=8,
                    eps=0.1, norm="linf", step_size=0.05, cache=cache,
                    model_name="u1")
        jitted = _uap_epoch_cache(victim.apply_fn, "adam", 0.05, "linf",
                                  None, "data")
        n = jitted._cache_size()
        assert n >= 1
        a2 = UAPPGD(victim, data_train=dataset, steps=2, batch_size=8,
                    eps=0.03, beta=4.0, norm="linf", step_size=0.05,
                    cache=cache, model_name="u2")
        assert jitted._cache_size() == n, "eps/beta sweep retraced the epoch"
        # eps really flows through (traced, not baked): the tighter budget
        # must bind.
        assert float(jnp.max(jnp.abs(a2.attack_vec))) <= 0.03 + 1e-5
        assert float(jnp.max(jnp.abs(a1.attack_vec))) <= 0.1 + 1e-5

    def test_distributed_mesh(self, victim, dataset, tmp_path, devices):
        from dl_attack_on_imagenet_tpu.parallel import data_mesh

        cache = ArtifactCache(str(tmp_path))
        atk = UAPPGD(
            victim, data_train=dataset, steps=2, batch_size=8, eps=0.1,
            norm="linf", step_size=0.05, cache=cache, model_name="uapdp",
            mesh=data_mesh(8),
        )
        assert atk.attack_vec.shape == (1, 32, 32, 3)
        assert float(jnp.max(jnp.abs(atk.attack_vec))) <= 0.1 + 1e-5


class TestFastUAP:
    def test_learn_and_forward(self, victim, dataset, tmp_path):
        cache = ArtifactCache(str(tmp_path))
        small = ArrayDataset(dataset.images[:6], dataset.labels[:6])
        atk = FastUAP(
            victim, data_train=small, data_val=small, steps=1,
            eps=0.3, norm="linf", steps_deepfool=10, cache=cache,
            model_name="fast", fooling_rate=2.0,  # never early-stop
        )
        assert cache.exists("FastUAP", model="fast")
        assert float(jnp.max(jnp.abs(atk.attack_vec))) <= 0.3 + 1e-5
        adv = atk(jnp.asarray(dataset.images[:4]))
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        # accumulated perturbation should fool something on train
        assert atk.history["fooling_rate"][-1] >= 0

    def test_l2_with_default_inf_eps_stays_finite(self, victim, dataset,
                                                  tmp_path):
        # FastUAP's default budget is eps=inf (reference fast_uap.py:40);
        # with norm='l2' the fold projection must be a no-op, not inf/inf
        # = NaN (l2_ball_project min(1, r/||x||) form).
        cache = ArtifactCache(str(tmp_path))
        small = ArrayDataset(dataset.images[:4], dataset.labels[:4])
        atk = FastUAP(
            victim, data_train=small, steps=1, norm="l2",
            steps_deepfool=10, cache=cache, model_name="fastl2",
            fooling_rate=2.0,
        )
        assert bool(jnp.all(jnp.isfinite(atk.attack_vec)))
        assert float(jnp.max(jnp.abs(atk.attack_vec))) > 0

    def test_ragged_tail_chunk_single_compile(self, victim, dataset,
                                              tmp_path):
        # n=6 with chunk=4 leaves a ragged tail of 2; the tail is padded to
        # the chunk shape so the jitted gate/DeepFool kernels keep ONE
        # compiled shape (the jacrev compile costs minutes on the TPU
        # tunnel).
        from dl_attack_on_imagenet_tpu.attacks.deepfool import (
            cached_deepfool, cached_predict_fn,
        )

        cache = ArtifactCache(str(tmp_path))
        small = ArrayDataset(dataset.images[:6], dataset.labels[:6])
        df = cached_deepfool(victim.apply_fn, 10, 0.02, 10)
        pf = cached_predict_fn(victim.apply_fn)
        df_before, pf_before = df._cache_size(), pf._cache_size()
        atk = FastUAP(
            victim, data_train=small, steps=1, eps=0.3, norm="linf",
            steps_deepfool=10, cache=cache, model_name="fastrag",
            fooling_rate=2.0, chunk=4,
        )
        assert bool(jnp.all(jnp.isfinite(atk.attack_vec)))
        # every DeepFool/predict call in the pass used the padded
        # (4, 32, 32, 3) shape — at most one NEW traced entry each
        assert df._cache_size() <= df_before + 1
        assert pf._cache_size() <= pf_before + 1

    def test_deepfool_cosinus(self, victim, dataset):
        atk = DeepFoolCosinus(victim, steps=10)
        x = jnp.asarray(dataset.images[:4])
        init = jnp.asarray(0.05 * np.random.default_rng(0).standard_normal((32, 32, 3)), jnp.float32)
        adv = atk(x, attack_init=init)
        assert adv.shape == x.shape
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1


class TestUniversalPert:
    def test_runs_and_projects(self, victim, dataset):
        small = ArrayDataset(dataset.images[:6], dataset.labels[:6])
        v, history = universal_perturbation(
            small, small, victim, delta=0.9, max_iter_uni=1,
            xi=0.2, p="linf", num_classes=5, max_iter_df=10,
        )
        assert v.shape == (32, 32, 3)
        assert float(jnp.max(jnp.abs(v))) <= 0.2 + 1e-5
        assert len(history) >= 1


def test_deepfool_active_init_masks_rows(victim, dataset):
    # Rows gated out via active_init must return zero delta and zero iters
    # (the chunked FastUAP/universal_pert gate, VERDICT round-2 #7).
    x = jnp.asarray(dataset.images[:4])
    gate = jnp.asarray([True, False, True, False])
    r, iters = deepfool_batch(
        victim.apply_fn, victim.variables, x, max_iter=5, active_init=gate
    )
    assert np.all(np.asarray(r[1]) == 0) and np.all(np.asarray(r[3]) == 0)
    assert int(iters[1]) == 0 and int(iters[3]) == 0
    # ...and match an unmasked solve on the active rows exactly.
    r_full, iters_full = deepfool_batch(
        victim.apply_fn, victim.variables, x[::2], max_iter=5
    )
    np.testing.assert_allclose(np.asarray(r[::2]), np.asarray(r_full), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(iters[::2]), np.asarray(iters_full))


def test_fold_increments_matches_sequential_fold():
    from dl_attack_on_imagenet_tpu.attacks.uap_pgd import (
        fold_increments,
        project_uap,
    )

    rng = np.random.default_rng(0)
    attack = jnp.asarray(rng.normal(size=(8, 8, 3)).astype(np.float32)) * 0.01
    deltas = jnp.asarray(rng.normal(size=(5, 8, 8, 3)).astype(np.float32)) * 0.05
    accept = jnp.asarray([True, False, True, True, False])
    got = fold_increments(attack, deltas, accept, jnp.float32(0.05), "linf")
    want = attack
    for j in range(5):
        if bool(accept[j]):
            want = project_uap(want + deltas[j], 0.05, "linf")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-7)


def test_universal_pert_chunked_matches_serial_semantics(victim, dataset):
    # chunk=1 IS the reference's sequential trajectory; a larger chunk must
    # still produce a working universal perturbation on the tiny victim.
    images, labels = dataset.images, dataset.labels
    v1, h1 = universal_perturbation(
        (images[:8], labels[:8]), (images[:8], labels[:8]), victim,
        delta=0.5, max_iter_uni=2, max_iter_df=5, chunk=1, seed=3,
    )
    vc, hc = universal_perturbation(
        (images[:8], labels[:8]), (images[:8], labels[:8]), victim,
        delta=0.5, max_iter_uni=2, max_iter_df=5, chunk=8, seed=3,
    )
    assert v1.shape == vc.shape == images.shape[1:]
    assert len(h1) >= 1 and len(hc) >= 1
    # Both reach a nonzero perturbation.
    assert float(jnp.max(jnp.abs(vc))) > 0
