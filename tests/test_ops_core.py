"""Golden-value tests for dictionary contraction, losses, and Laplace fits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from dl_attack_on_imagenet_tpu.ops import (
    attack_loss,
    codes_from_pinv,
    cross_entropy_mean,
    cross_entropy_sum,
    cw_margin_loss,
    dict_apply,
    dict_gram,
    dict_pinv,
    laplace_fit,
    laplace_fit_conditioned,
    laplace_fit_per_atom,
    laplace_sample,
)


class TestDictApply:
    def test_matches_einsum(self, rng):
        k1, k2 = jax.random.split(rng)
        d = jax.random.normal(k1, (8, 5, 5, 3))
        v = jax.random.normal(k2, (4, 8))
        out = dict_apply(v, d)
        expected = jnp.einsum("nk,khwc->nhwc", v, d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)

    def test_flat_dictionary(self, rng):
        k1, k2 = jax.random.split(rng)
        d = jax.random.normal(k1, (8, 75))
        v = jax.random.normal(k2, (4, 8))
        np.testing.assert_allclose(
            np.asarray(dict_apply(v, d)), np.asarray(v @ d), atol=1e-5
        )

    def test_gram(self, rng):
        d = jax.random.normal(rng, (6, 4, 4, 3))
        g = dict_gram(d)
        flat = np.asarray(d).reshape(6, -1)
        np.testing.assert_allclose(np.asarray(g), flat @ flat.T, atol=1e-4)

    def test_pinv_roundtrip(self, rng):
        # For z in span(D), codes_from_pinv recovers exact coefficients.
        k1, k2 = jax.random.split(rng)
        d = jax.random.normal(k1, (6, 8, 8, 3))
        v_true = jax.random.normal(k2, (3, 6))
        z = dict_apply(v_true, d)
        v_rec = codes_from_pinv(z, dict_pinv(d))
        np.testing.assert_allclose(np.asarray(v_rec), np.asarray(v_true), atol=1e-3)

    def test_codes_from_pinv_flat_matches_image_shaped(self, rng):
        # The image-shaped path contracts over the image axes directly (no
        # flatten — the round-4 relayout fix); it must agree exactly with
        # feeding the same z pre-flattened.
        k1, k2 = jax.random.split(rng)
        d = jax.random.normal(k1, (6, 8, 8, 3))
        z = jax.random.normal(k2, (3, 8, 8, 3))
        dp = dict_pinv(d)
        img = codes_from_pinv(z, dp)
        flat = codes_from_pinv(z.reshape(3, -1), dp)
        np.testing.assert_allclose(np.asarray(img), np.asarray(flat), atol=1e-5)

    def test_codes_from_pinv_compute_dtype(self, rng):
        # compute_dtype follows the dict_apply contract: bf16 inner loops
        # (DDrague's in-loop read-off) get a bf16 contraction + output; the
        # result must track the fp32 one within bf16 resolution.
        k1, k2 = jax.random.split(rng)
        d = jax.random.normal(k1, (6, 8, 8, 3))
        z = jax.random.normal(k2, (3, 8, 8, 3))
        dp = dict_pinv(d)
        lo = codes_from_pinv(z, dp, compute_dtype=jnp.bfloat16)
        hi = codes_from_pinv(z, dp)
        assert lo.dtype == jnp.bfloat16
        scale = float(jnp.max(jnp.abs(hi))) + 1e-9
        assert float(jnp.max(jnp.abs(lo.astype(jnp.float32) - hi))) / scale < 0.05

    def test_dict_apply_compute_dtype(self, rng):
        k1, k2 = jax.random.split(rng)
        d = jax.random.normal(k1, (8, 5, 5, 3))
        v = jax.random.normal(k2, (4, 8))
        lo = dict_apply(v, d, compute_dtype=jnp.bfloat16)
        hi = dict_apply(v, d)
        assert lo.dtype == jnp.bfloat16 and lo.shape == hi.shape
        scale = float(jnp.max(jnp.abs(hi))) + 1e-9
        assert float(jnp.max(jnp.abs(lo.astype(jnp.float32) - hi))) / scale < 0.05


class TestLosses:
    def test_cw_margin_untargeted(self):
        logits = jnp.array([[5.0, 2.0, 1.0], [0.0, 3.0, 4.0]])
        labels = jnp.array([0, 1])
        out = cw_margin_loss(logits, labels, kappa=50.0, targeted=False)
        # sample 0: true 5, runner-up 2 -> 3 ; sample 1: true 3, best other 4 -> -1
        np.testing.assert_allclose(np.asarray(out), [3.0, -1.0], atol=1e-6)

    def test_cw_margin_kappa_floor(self):
        logits = jnp.array([[0.0, 100.0]])
        labels = jnp.array([0])
        out = cw_margin_loss(logits, labels, kappa=50.0, targeted=False)
        np.testing.assert_allclose(np.asarray(out), [-50.0])

    def test_cw_margin_targeted(self):
        logits = jnp.array([[5.0, 2.0, 1.0]])
        # target class 1: max other (5) - logit[1] (2) = 3
        out = cw_margin_loss(logits, jnp.array([1]), kappa=50.0, targeted=True)
        np.testing.assert_allclose(np.asarray(out), [3.0])

    def test_cw_margin_zero_floor_reference_quirk(self):
        # Reference f_loss computes the runner-up as max((1-one_hot)*logits)
        # (adil.py:106): the zeroed true-class slot floors it at 0 when all
        # non-true logits are negative, and in that regime the runner-up term
        # carries NO gradient to any logit.
        logits = jnp.array([[4.0, -2.0, -3.0]])
        labels = jnp.array([0])
        out = cw_margin_loss(logits, labels, kappa=50.0, targeted=False)
        np.testing.assert_allclose(np.asarray(out), [4.0])  # 4 - 0, not 4-(-2)

        g = jax.grad(
            lambda lg: jnp.sum(cw_margin_loss(lg, labels, kappa=50.0))
        )(logits)
        np.testing.assert_allclose(np.asarray(g), [[1.0, 0.0, 0.0]], atol=1e-6)

    def test_cross_entropy_golden(self):
        logits = jnp.array([[2.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
        labels = jnp.array([0, 2])
        expected0 = -np.log(np.exp(2) / np.exp([2.0, 1.0, 0.0]).sum())
        expected1 = -np.log(1 / 3)
        np.testing.assert_allclose(
            float(cross_entropy_sum(logits, labels)), expected0 + expected1, rtol=1e-5
        )
        np.testing.assert_allclose(
            float(cross_entropy_mean(logits, labels)), (expected0 + expected1) / 2, rtol=1e-5
        )

    def test_attack_loss_ce_sign(self):
        logits = jnp.array([[2.0, 1.0, 0.0]])
        labels = jnp.array([0])
        untgt = float(attack_loss(logits, labels, loss="ce", targeted=False))
        tgt = float(attack_loss(logits, labels, loss="ce", targeted=True))
        assert untgt == pytest.approx(-tgt)
        assert tgt > 0  # CE is positive, targeted keeps +1 coeff

    def test_attack_loss_logits_reduction(self):
        logits = jnp.array([[5.0, 2.0, 1.0], [0.0, 3.0, 4.0]])
        labels = jnp.array([0, 1])
        total = float(attack_loss(logits, labels, loss="logits", kappa=50.0))
        assert total == pytest.approx(3.0 + -1.0)


class TestLaplace:
    def test_fit_matches_scipy(self, rng):
        x = jax.random.laplace(rng, (5000,)) * 0.7 + 0.3
        loc, scale = laplace_fit(x)
        sloc, sscale = scipy.stats.laplace.fit(np.asarray(x))
        np.testing.assert_allclose(float(loc), sloc, atol=1e-5)
        np.testing.assert_allclose(float(scale), sscale, atol=1e-5)

    def test_fit_min_scale(self):
        x = jnp.ones((100,))
        _, scale = laplace_fit(x, min_scale=1e-3)
        assert float(scale) == pytest.approx(1e-3)

    def test_per_atom_matches_scipy(self, rng):
        v = jax.random.laplace(rng, (2000, 4)) * jnp.array([0.1, 0.5, 1.0, 2.0])
        loc, scale = laplace_fit_per_atom(v)
        for kk in range(4):
            sloc, sscale = scipy.stats.laplace.fit(np.asarray(v)[:, kk])
            np.testing.assert_allclose(float(loc[kk]), sloc, atol=1e-5)
            np.testing.assert_allclose(float(scale[kk]), sscale, atol=1e-5)

    def test_conditioned_fit(self, rng):
        v = np.asarray(jax.random.laplace(rng, (300, 3)))
        groups = np.asarray(jax.random.randint(jax.random.PRNGKey(1), (300,), 0, 5))
        loc, scale = laplace_fit_conditioned(v, groups, num_groups=6)
        assert loc.shape == (6, 3) and scale.shape == (6, 3)
        # group 5 never sampled -> default
        np.testing.assert_allclose(loc[5], 0.0)
        np.testing.assert_allclose(scale[5], 1e-3)
        rows = v[groups == 2]
        np.testing.assert_allclose(loc[2], np.median(rows, axis=0), atol=1e-6)

    def test_sample_statistics(self, rng):
        s = laplace_sample(rng, 1.0, 0.5, (20000,))
        assert float(jnp.median(s)) == pytest.approx(1.0, abs=0.02)
        assert float(jnp.mean(jnp.abs(s - 1.0))) == pytest.approx(0.5, abs=0.02)
