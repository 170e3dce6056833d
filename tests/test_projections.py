"""Unit tests for projection/prox operators against closed-form KKT conditions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.ops import (
    clamp_image,
    l1_ball_project,
    l2_ball_project,
    l2_sphere_project,
    linf_clamp,
    project_atoms,
    project_codes,
    project_dictionary,
    soft_threshold,
)


def ref_l1_project_row(x, eps):
    """Scalar-reference Duchi projection for one vector (numpy, obvious code)."""
    x = np.asarray(x, dtype=np.float64)
    if np.abs(x).sum() < eps:
        return x
    mu = np.sort(np.abs(x))[::-1]
    cs = np.cumsum(mu)
    rho = np.max(np.where(mu * np.arange(1, len(x) + 1) > (cs - eps))[0]) + 1
    theta = (cs[rho - 1] - eps) / rho
    return np.sign(x) * np.maximum(np.abs(x) - theta, 0)


class TestL1Ball:
    def test_matches_scalar_reference(self, rng):
        x = jax.random.normal(rng, (16, 37)) * 3.0
        out = l1_ball_project(x, 1.5)
        for i in range(16):
            expected = ref_l1_project_row(np.asarray(x)[i], 1.5)
            np.testing.assert_allclose(np.asarray(out)[i], expected, atol=1e-5)

    def test_inside_ball_is_identity(self, rng):
        x = jax.random.normal(rng, (4, 10)) * 0.01
        out = l1_ball_project(x, 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-7)

    def test_result_on_ball_surface(self, rng):
        x = jax.random.normal(rng, (8, 100)) * 5.0
        out = l1_ball_project(x, 2.0)
        norms = jnp.sum(jnp.abs(out), axis=1)
        np.testing.assert_allclose(np.asarray(norms), 2.0, atol=1e-4)

    def test_kkt_sign_and_support(self, rng):
        # Projection preserves signs and never increases any coordinate.
        x = jax.random.normal(rng, (8, 50)) * 4.0
        out = l1_ball_project(x, 1.0)
        assert bool(jnp.all(jnp.abs(out) <= jnp.abs(x) + 1e-6))
        assert bool(jnp.all((jnp.sign(out) == jnp.sign(x)) | (out == 0)))

    def test_higher_rank_input(self, rng):
        x = jax.random.normal(rng, (3, 4, 20)) * 3.0
        out = l1_ball_project(x, 1.0)
        assert out.shape == x.shape
        flat = l1_ball_project(x.reshape(12, 20), 1.0)
        np.testing.assert_allclose(np.asarray(out).reshape(12, 20), np.asarray(flat))

    def test_jit(self, rng):
        x = jax.random.normal(rng, (4, 16))
        out = jax.jit(lambda a: l1_ball_project(a, 1.0))(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(l1_ball_project(x, 1.0)), atol=1e-6)


class TestL2:
    def test_ball_shrinks_outside(self, rng):
        x = jax.random.normal(rng, (5, 30)) * 10
        out = l2_ball_project(x, 1.0, axis=1)
        norms = jnp.linalg.norm(out, axis=1)
        assert bool(jnp.all(norms <= 1.0 + 1e-5))

    def test_ball_identity_inside(self, rng):
        x = jax.random.normal(rng, (5, 30)) * 1e-3
        out = l2_ball_project(x, 1.0, axis=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-7)

    def test_ball_inf_radius_is_noop(self, rng):
        # FastUAP defaults to eps=inf (fast_uap.py:40) and folds through
        # this projection — radius=inf must be an exact no-op, not inf/inf.
        x = jax.random.normal(rng, (5, 30)) * 10
        out = l2_ball_project(x, jnp.inf, axis=1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
        out_global = l2_ball_project(x, jnp.inf, axis=None)
        np.testing.assert_array_equal(np.asarray(out_global), np.asarray(x))

    def test_sphere_normalizes(self, rng):
        x = jax.random.normal(rng, (5, 30))
        out = l2_sphere_project(x, 2.0, axis=1)
        np.testing.assert_allclose(np.asarray(jnp.linalg.norm(out, axis=1)), 2.0, atol=1e-4)


class TestElementwise:
    def test_linf_clamp(self):
        x = jnp.array([-3.0, -0.5, 0.0, 0.5, 3.0])
        np.testing.assert_allclose(
            np.asarray(linf_clamp(x, 1.0)), [-1.0, -0.5, 0.0, 0.5, 1.0]
        )

    def test_clamp_image(self):
        x = jnp.array([-0.2, 0.3, 1.4])
        np.testing.assert_allclose(np.asarray(clamp_image(x)), [0.0, 0.3, 1.0])

    def test_soft_threshold(self):
        x = jnp.array([-2.0, -0.3, 0.0, 0.3, 2.0])
        np.testing.assert_allclose(
            np.asarray(soft_threshold(x, 0.5)), [-1.5, 0.0, 0.0, 0.0, 1.5]
        )

    def test_soft_threshold_is_prox(self, rng):
        # prox of lam*||.||_1: (x - p) in lam * subgrad(|p|)
        x = jax.random.normal(rng, (100,))
        lam = 0.3
        p = soft_threshold(x, lam)
        resid = np.asarray(x - p)
        pn = np.asarray(p)
        assert np.all(np.abs(resid) <= lam + 1e-6)
        nz = pn != 0
        np.testing.assert_allclose(resid[nz], lam * np.sign(pn[nz]), atol=1e-6)


class TestAtomProjections:
    def test_l2ball_atoms(self, rng):
        d = jax.random.normal(rng, (7, 4, 4, 3)) * 5
        out = project_atoms(d, "l2ball")
        norms = jnp.linalg.norm(out.reshape(7, -1), axis=1)
        assert bool(jnp.all(norms <= 1.0 + 1e-5))

    def test_l2sphere_atoms(self, rng):
        d = jax.random.normal(rng, (7, 4, 4, 3))
        out = project_atoms(d, "l2sphere")
        norms = jnp.linalg.norm(out.reshape(7, -1), axis=1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)

    def test_l1ball_atoms(self, rng):
        # per-CHANNEL l1 balls — the reference's constraint_dict l1ball
        # row view (utils.py:31-32, :56), pinned by executing the
        # reference's own code in test_reference_exec_utils.py
        d = jax.random.normal(rng, (7, 4, 4, 3)) * 5
        out = project_atoms(d, "l1ball")
        norms = jnp.sum(jnp.abs(out), axis=(1, 2))  # (K, C)
        assert bool(jnp.all(norms <= 1.0 + 1e-4))
        # flat atoms keep the whole-row projection (documented deviation)
        out2 = project_atoms(d.reshape(7, -1), "l1ball")
        norms2 = jnp.sum(jnp.abs(out2), axis=1)
        assert bool(jnp.all(norms2 <= 1.0 + 1e-4))

    def test_unknown_constraint_raises(self, rng):
        with pytest.raises(ValueError):
            project_atoms(jnp.zeros((2, 2, 2, 3)), "nope")


class TestBudgetProjections:
    def test_codes_linf_is_l1ball(self, rng):
        v = jax.random.normal(rng, (10, 20)) * 3
        out = project_codes(v, 0.05, "linf")
        assert bool(jnp.all(jnp.sum(jnp.abs(out), axis=1) <= 0.05 + 1e-5))

    def test_codes_l2(self, rng):
        v = jax.random.normal(rng, (10, 20)) * 3
        out = project_codes(v, 0.5, "l2")
        assert bool(jnp.all(jnp.linalg.norm(out, axis=1) <= 0.5 + 1e-5))

    def test_dict_linf_budget_guarantees_linf_bound(self, rng):
        # ||D||_inf <= 1 and ||v||_1 <= eps  =>  ||Dv||_inf <= eps.
        k1, k2 = jax.random.split(rng)
        d = project_dictionary(jax.random.normal(k1, (5, 3, 3, 3)) * 2, "linf")
        v = project_codes(jax.random.normal(k2, (6, 5)) * 2, 0.1, "linf")
        from dl_attack_on_imagenet_tpu.ops import dict_apply

        dv = dict_apply(v, d)
        assert bool(jnp.max(jnp.abs(dv)) <= 0.1 + 1e-5)
