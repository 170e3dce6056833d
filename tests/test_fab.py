"""FAB: exact l∞ hyperplane∩box projection (optimality-checked against a
numeric bisection oracle), minimum-distortion behavior, and compile sharing.

No cross-framework oracle here: the attack's only nontrivial numerics is
the projection subroutine, which is pinned by exact optimality conditions
(feasibility, tightness |delta|_inf == t*, boundary attainment h(x+d) == 0,
and equality with an independent bisection solve) — stronger than a
trajectory diff against a second implementation of the same loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import FAB, PGD
from dl_attack_on_imagenet_tpu.attacks.fab import linf_hyperplane_box_project
from dl_attack_on_imagenet_tpu.models import create_model


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def batch(victim):
    x = jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3))
    return x, victim.predict(x)


def _bisect_t(x, w, hval, iters=80):
    """Independent solve of sum_i |w_i| min(t, room_i) = |hval| by bisection."""
    s = -np.sign(hval) * np.sign(w)
    room = np.where(s > 0, 1 - x, np.where(s < 0, x, np.inf))
    room = np.where(np.abs(w) > 0, room, np.inf)
    a = np.abs(w)

    def g(t):
        return float(np.sum(a * np.minimum(t, room)))

    target = abs(float(hval))
    finite = np.isfinite(room)
    gmax = float(np.sum(a[finite] * room[finite]) + np.sum(a[~finite]) * 1e9)
    if gmax < target:
        return np.inf
    lo, hi = 0.0, 1e9
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        if g(mid) < target:
            lo = mid
        else:
            hi = mid
    return hi


class TestProjection:
    def test_optimality_against_bisection(self):
        rng = np.random.default_rng(0)
        for trial in range(20):
            d = 64
            x = rng.random(d).astype(np.float32)
            w = rng.standard_normal(d).astype(np.float32)
            w[rng.random(d) < 0.2] = 0.0  # dead coordinates
            hval = np.float32(rng.standard_normal() * 2)
            delta, t = linf_hyperplane_box_project(
                jnp.asarray(x)[None], jnp.asarray(w)[None],
                jnp.asarray(hval)[None])
            delta, t = np.asarray(delta[0]), float(t[0])
            t_ref = _bisect_t(x, w, hval)
            if not np.isfinite(t_ref):
                assert not np.isfinite(t)
                assert np.all(delta == 0)
                continue
            assert abs(t - t_ref) <= 1e-5 * max(1.0, t_ref), trial
            z = x + delta
            assert z.min() >= -1e-6 and z.max() <= 1 + 1e-6  # box
            assert np.max(np.abs(delta)) <= t + 1e-6          # tightness
            # boundary attained in the linear model
            assert abs(hval + float(w @ delta)) <= 5e-4 * max(1.0, abs(hval))

    def test_newton_twin_matches_sort_waterfill(self):
        """The memory-light safeguarded-Newton solver (the production path
        at the reference operating point) must agree with the exact
        sort/cumsum waterfill: same t*, same delta — including infeasible
        (+inf) and dead-coordinate cases."""
        from dl_attack_on_imagenet_tpu.attacks.fab import (
            linf_hyperplane_box_delta,
            linf_hyperplane_box_project_t,
        )

        rng = np.random.default_rng(1)
        n, k, d = 6, 4, 96
        x = rng.random((n, k, d)).astype(np.float32)
        w = rng.standard_normal((n, k, d)).astype(np.float32)
        w[rng.random((n, k, d)) < 0.2] = 0.0
        hval = (rng.standard_normal((n, k)) * 2).astype(np.float32)
        hval[0, 0] = 0.0  # already on the hyperplane
        hval[1, 1] = 1e4  # unreachable inside the box

        delta_s, t_s = linf_hyperplane_box_project(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(hval))
        t_b = linf_hyperplane_box_project_t(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(hval))
        delta_b = linf_hyperplane_box_delta(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(hval), t_b)

        t_s, t_b = np.asarray(t_s), np.asarray(t_b)
        # Feasibility can legitimately flip under f32 reduction order when
        # target == G_max within rounding (the hyperplane exactly grazes the
        # box corner); exempt those knife-edge elements, assert the rest.
        a64, room64 = np.abs(w).astype(np.float64), np.where(
            -np.sign(hval)[..., None] * np.sign(w) > 0, 1.0 - x,
            np.where(-np.sign(hval)[..., None] * np.sign(w) < 0, x, 0.0),
        ).astype(np.float64)
        gmax = (a64 * room64).sum(-1)
        knife_edge = np.abs(gmax - np.abs(hval)) <= 1e-4 * np.abs(hval)
        finite = np.isfinite(t_s)
        np.testing.assert_array_equal(
            finite[~knife_edge], np.isfinite(t_b)[~knife_edge])
        ok = finite & np.isfinite(t_b)
        np.testing.assert_allclose(t_b[ok], t_s[ok], rtol=1e-5, atol=1e-6)
        both = ok[..., None] & np.ones_like(w, bool)
        np.testing.assert_allclose(
            np.asarray(delta_b)[both], np.asarray(delta_s)[both],
            rtol=1e-5, atol=1e-6)

    def test_infeasible_and_zero_cases(self):
        x = jnp.full((1, 8), 0.5)
        w = jnp.ones((1, 8))
        # target decrease 100 >> reachable 0.5*8 = 4
        delta, t = linf_hyperplane_box_project(x, w, jnp.asarray([100.0]))
        assert not bool(jnp.isfinite(t[0]))
        assert float(jnp.max(jnp.abs(delta))) == 0.0
        # already on the hyperplane
        delta0, t0 = linf_hyperplane_box_project(x, w, jnp.asarray([0.0]))
        assert float(t0[0]) == 0.0
        assert float(jnp.max(jnp.abs(delta0))) == 0.0

    def test_infeasible_winner_saturates_not_freezes(self):
        """The run's call-site fallback for a box-unreachable winning
        boundary: capping t* at 1 (>= every room in the unit box) must
        yield the fully saturated move toward the hyperplane — the
        released code's Lagrangian projection has no infeasibility branch
        and returns exactly this point. A delta of 0 there would freeze
        the iterate on the same candidate forever (round-4 review fix)."""
        from dl_attack_on_imagenet_tpu.attacks.fab import (
            linf_hyperplane_box_delta,
            linf_hyperplane_box_project_t,
        )

        x = jnp.asarray([[0.25, 0.5, 0.9, 0.0]])
        w = jnp.asarray([[1.0, -2.0, 0.5, 1.0]])
        hval = jnp.asarray([100.0])  # unreachable: G_max << 100
        t = linf_hyperplane_box_project_t(x, w, hval)
        assert not bool(jnp.isfinite(t[0]))
        t_cap = jnp.where(jnp.isfinite(t), t, 1.0)
        delta = linf_hyperplane_box_delta(x, w, hval, t_cap)
        # every coordinate moves against sign(h)*sign(w) by its full room
        s = -jnp.sign(hval)[:, None] * jnp.sign(w)
        room = jnp.where(s > 0, 1.0 - x, jnp.where(s < 0, x, 0.0))
        np.testing.assert_allclose(np.asarray(delta), np.asarray(s * room),
                                   atol=1e-7)
        assert float(jnp.max(jnp.abs(delta))) > 0.0


class TestFAB:
    def test_fools_with_minimal_distortion(self, victim, batch):
        x, y = batch
        adv = FAB(victim, steps=20, n_classes=4)(x, y)
        pred = victim.predict(adv)
        fool = float(jnp.mean((pred != y).astype(jnp.float32)))
        assert fool >= 0.75
        # minimum-distortion property: the boundary sits far closer than a
        # PGD eps-ball attack's operating point on this near-flat victim
        dists = jnp.max(jnp.abs(adv - x), axis=(1, 2, 3))
        fooled = pred != y
        assert float(jnp.median(dists[fooled])) < 8 / 255

        adv_pgd = PGD(victim, eps=16 / 255, alpha=4 / 255, steps=20)(x, y)
        pgd_d = jnp.max(jnp.abs(adv_pgd - x), axis=(1, 2, 3))
        assert float(jnp.median(dists[fooled])) < float(jnp.median(pgd_d))

    def test_never_fooled_returns_clean(self, victim, batch):
        """steps=0 runs no iterations: nothing can be found, output == input."""
        x, y = batch
        adv = FAB(victim, steps=0)(x, y)
        np.testing.assert_array_equal(np.asarray(adv), np.asarray(x))

    def test_targeted_mode_runs_and_restarts_deterministic(self, victim,
                                                           batch):
        x, y = batch
        atk = FAB(victim, steps=10, n_classes=3, targeted=True, n_restarts=2,
                  seed=5)
        a = atk(x, y)
        atk2 = FAB(victim, steps=10, n_classes=3, targeted=True,
                   n_restarts=2, seed=5)
        b = atk2(x, y)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        fool = float(jnp.mean((victim.predict(a) != y).astype(jnp.float32)))
        assert fool >= 0.5

    def test_instances_share_compile(self, victim, batch):
        x, y = batch
        from dl_attack_on_imagenet_tpu.attacks.fab import _fab_cache

        _ = FAB(victim, steps=5, n_classes=4)(x, y)
        fn = _fab_cache(victim.apply_fn, 5, 3, False)
        n = fn._cache_size()
        _ = FAB(victim, steps=5, n_classes=4, eps=16 / 255)(x, y)
        assert fn._cache_size() == n, "second FAB instance retraced"

    def test_l2_rejected(self, victim):
        with pytest.raises(ValueError):
            FAB(victim, norm="L2")


class TestFabTSuccessCriterion:
    def test_fab_t_success_is_misclassification(self):
        """FAB-T counts ANY misclassification, not pred == target: the
        paper's targeted variant (Croce & Hein, ICML 2020, FAB-T) restricts
        only the boundary linearization to the target class; the success
        test stays pred != y (the authors' released targeted code records
        y1 != y). Victim geometry: class-2's region lies strictly between
        the clean point and the 0-vs-1 boundary, so attacking target 1
        lands in class 2 — which must be recorded as a success (under the
        old pred == target rule the attack would return the clean image)."""
        from dl_attack_on_imagenet_tpu.models import VictimModel

        d_axis = jnp.ones((16,)) / 16.0  # s = mean(x), 4x4x1 images

        def apply_fn(variables, x):
            s = x.reshape(x.shape[0], -1) @ d_axis
            z0 = jnp.zeros_like(s)
            z1 = 5.0 * (s - 0.8)    # 0-vs-1 boundary at s = 0.8 (target)
            z2 = 50.0 * (s - 0.65)  # class-2 region from s = 0.65 onward
            return jnp.stack([z0, z1, z2], axis=-1)

        victim = VictimModel(
            name="lin3", module=None, variables={}, input_size=4,
            num_classes=3, apply_fn=apply_fn, normalize=False,
        )
        x = jnp.full((2, 4, 4, 1), 0.5)
        labels = jnp.zeros((2,), jnp.int32)
        assert list(np.asarray(victim.predict(x))) == [0, 0]
        # n_classes=2 -> exactly one target set: the runner-up class 1
        atk = FAB(victim, steps=5, n_classes=2, targeted=True, seed=3)
        adv = atk(x, labels)
        pred = np.asarray(victim.predict(adv))
        assert np.all(pred != 0), "off-target misclassification must count"
        assert np.all(pred == 2)
        assert float(jnp.max(jnp.abs(adv - x))) > 1e-3
