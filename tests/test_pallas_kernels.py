"""Pallas kernel tests (interpret mode on the CPU mesh) vs jnp references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.ops.pallas_kernels import (
    fused_adamw_project,
    fused_adamw_project_reference,
    fused_perturb,
    fused_perturb_reference,
)


class TestFusedPerturb:
    def test_matches_reference(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        v = jax.random.normal(k1, (8, 16)) * 0.01
        d = jax.random.uniform(k2, (16, 8, 8, 3), minval=-1, maxval=1)
        x = jax.random.uniform(k3, (8, 8, 8, 3))
        eps = 8 / 255
        got = fused_perturb(v, d, x, eps, block_m=128, interpret=True)
        want = fused_perturb_reference(
            v, d.reshape(16, -1), x.reshape(8, -1), eps
        ).reshape(8, 8, 8, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_non_multiple_pixel_axis_padding(self, rng):
        # M = 8*8*3 = 192, block 128 -> padded path
        k1, k2, k3 = jax.random.split(rng, 3)
        v = jax.random.normal(k1, (4, 8)) * 0.1
        d = jax.random.uniform(k2, (8, 8, 8, 3), minval=-1, maxval=1)
        x = jax.random.uniform(k3, (4, 8, 8, 3))
        got = fused_perturb(v, d, x, 0.1, block_m=128, interpret=True)
        assert got.shape == x.shape
        want = fused_perturb_reference(v, d.reshape(8, -1), x.reshape(4, -1), 0.1)
        np.testing.assert_allclose(
            np.asarray(got).reshape(4, -1), np.asarray(want), atol=1e-6
        )

    def test_bounds_hold(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        v = jax.random.normal(k1, (4, 8)) * 10  # huge codes
        d = jax.random.uniform(k2, (8, 8, 8, 3), minval=-1, maxval=1)
        x = jax.random.uniform(k3, (4, 8, 8, 3))
        got = fused_perturb(v, d, x, 0.05, block_m=128, interpret=True)
        assert float(got.min()) >= 0 and float(got.max()) <= 1
        assert float(jnp.max(jnp.abs(got - jnp.clip(x, 0, 1)))) <= 0.05 + 1e-6

    def test_cpu_fallback(self, rng):
        # interpret=False on CPU silently uses the jnp reference
        k1, k2, k3 = jax.random.split(rng, 3)
        v = jax.random.normal(k1, (2, 4))
        d = jax.random.uniform(k2, (4, 4, 4, 3))
        x = jax.random.uniform(k3, (2, 4, 4, 3))
        got = fused_perturb(v, d, x, 0.1)
        assert got.shape == x.shape


class TestFusedAdamW:
    def test_matches_optax_adamw_plus_clamp(self, rng):
        import optax

        k1, k2 = jax.random.split(rng)
        p = jax.random.normal(k1, (300,)) * 0.5
        g = jax.random.normal(k2, (300,))
        opt = optax.adamw(0.01, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2)
        state = opt.init(p)
        mu = jnp.zeros_like(p)
        nu = jnp.zeros_like(p)

        p_ours, mu1, nu1 = fused_adamw_project(
            p, g, mu, nu, step=1, lr=0.01, clip_val=1.0, interpret=True
        )
        upd, state = opt.update(g, state, p)
        p_optax = jnp.clip(optax.apply_updates(p, upd), -1.0, 1.0)
        np.testing.assert_allclose(np.asarray(p_ours), np.asarray(p_optax), atol=1e-6)

    def test_two_steps_match(self, rng):
        import optax

        k1, k2, k3 = jax.random.split(rng, 3)
        p = jax.random.normal(k1, (257,)) * 0.5  # non-multiple-of-128 size
        g1 = jax.random.normal(k2, (257,))
        g2 = jax.random.normal(k3, (257,))
        opt = optax.adamw(0.02, weight_decay=1e-2)
        state = opt.init(p)
        p_ref = p
        for g in (g1, g2):
            upd, state = opt.update(g, state, p_ref)
            p_ref = jnp.clip(optax.apply_updates(p_ref, upd), -1.0, 1.0)

        mu = jnp.zeros_like(p)
        nu = jnp.zeros_like(p)
        p_ours = p
        for i, g in enumerate((g1, g2)):
            p_ours, mu, nu = fused_adamw_project(
                p_ours, g, mu, nu, step=i + 1, lr=0.02, interpret=True
            )
        np.testing.assert_allclose(np.asarray(p_ours), np.asarray(p_ref), atol=1e-5)

    def test_reference_impl_matches_kernel(self, rng):
        k1, k2 = jax.random.split(rng)
        p = jax.random.normal(k1, (4, 8, 8, 3))
        g = jax.random.normal(k2, (4, 8, 8, 3))
        mu = jnp.ones_like(p) * 0.1
        nu = jnp.ones_like(p) * 0.2
        a = fused_adamw_project(p, g, mu, nu, 3, 0.01, interpret=True)
        b = fused_adamw_project_reference(p, g, mu, nu, jnp.asarray(3.0), 0.01)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
