"""CI-shape guards for the attack families' scale assumptions (VERDICT r3
next-round #8).

These tests never touch a chip and finish in seconds: they trace the
scale-sensitive attack math ABSTRACTLY at the reference operating shapes
(224², b64, 1000 classes — demo_dL_attack.py:96-143) and walk the jaxpr,
asserting the largest intermediate array stays within a documented bound.
A refactor that silently reintroduces an O(n·d²) intermediate (or defeats
OnePixel's inf_batch chunking) trips the bound at trace time instead of
OOMing the chip at bench time.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

D224 = 224 * 224 * 3  # 150528


def _iter_eqns(jaxpr):
    """All equations of a (closed) jaxpr, recursing into sub-jaxprs
    (while/scan/cond/pjit bodies)."""
    from jax._src import core

    if isinstance(jaxpr, core.ClosedJaxpr):
        jaxpr = jaxpr.jaxpr
    for eqn in jaxpr.eqns:
        yield eqn
        for p in eqn.params.values():
            stack = [p]
            while stack:
                item = stack.pop()
                if isinstance(item, (list, tuple)):
                    stack.extend(item)
                elif isinstance(item, (core.Jaxpr, core.ClosedJaxpr)):
                    yield from _iter_eqns(item)


def max_intermediate_bytes(jaxpr) -> int:
    """Largest single array produced by any equation in the trace."""
    best = 0
    for eqn in _iter_eqns(jaxpr):
        for var in eqn.outvars:
            aval = getattr(var, "aval", None)
            if aval is None or not hasattr(aval, "shape"):
                continue
            size = int(np.prod(aval.shape, dtype=np.int64)) if aval.shape else 1
            best = max(best, size * aval.dtype.itemsize)
    return best


def _linear_victim(num_classes: int = 1000):
    """Abstract-traceable stand-in victim: one flat matmul to n_classes.

    The guards bound the ATTACK math's intermediates; the victim's own
    activations are out of scope (measured on chip instead), so the
    stand-in keeps the trace small and fast.
    """

    def apply_fn(variables, x):
        flat = x.reshape(x.shape[0], -1)
        return flat @ variables["w"]

    return apply_fn


class TestFABWaterfill:
    def test_waterfill_intermediates_linear_in_input(self):
        """The sort/cumsum waterfill at the reference's worst case —
        b64 × 9 candidates × 150528 dims (fab.py docstring's ~2 GB sort
        problem) — must stay O(n·K·d): every intermediate within 4× the
        (n, K, d) operand (sort emits value+index pairs; 4× covers a
        value/index pair plus one fused temporary, not a d² blowup)."""
        from dl_attack_on_imagenet_tpu.attacks.fab import (
            linf_hyperplane_box_project,
        )

        n, k = 64, 9
        args = (
            jax.ShapeDtypeStruct((n, k, D224), jnp.float32),  # x
            jax.ShapeDtypeStruct((n, k, D224), jnp.float32),  # w
            jax.ShapeDtypeStruct((n, k), jnp.float32),  # hval
        )
        jaxpr = jax.make_jaxpr(linf_hyperplane_box_project)(*args)
        operand_bytes = n * k * D224 * 4
        assert max_intermediate_bytes(jaxpr) <= 4 * operand_bytes

    def test_fab_run_jacobian_is_the_largest_intermediate(self):
        """A full FAB body at the reference row (steps fori_loop, jacrev
        per candidate, bisection waterfill) holds at most the (n, K, d)
        jacobian plus one elementwise temporary — per-candidate deltas are
        never materialized and nothing is O(d²). The v5e device fault this
        bound guards against: the sort/cumsum waterfill's value+index
        temporaries at (64, 9, 150528) (BENCHMARKS.md round 4)."""
        from dl_attack_on_imagenet_tpu.attacks.fab import _fab_run

        n, k = 8, 9  # smaller n: jacrev tracing is host-RAM heavy
        apply_fn = _linear_victim()
        variables = {"w": jax.ShapeDtypeStruct((D224, 1000), jnp.float32)}
        img = jax.ShapeDtypeStruct((n, 224, 224, 3), jnp.float32)
        lab = jax.ShapeDtypeStruct((n,), jnp.int32)
        jaxpr = jax.make_jaxpr(
            lambda v, x, y, x0, t: _fab_run(
                apply_fn, v, x, y, x0, t, steps=3, n_cand=k, targeted=False
            )
        )(variables, img, lab, img, lab)
        jac_bytes = n * k * D224 * 4
        assert max_intermediate_bytes(jaxpr) <= 2 * jac_bytes


class TestSquareSchedule:
    def test_p_schedule_static_length_and_bounds(self):
        """The released p-schedule is precomputed per query index: exactly
        n_queries entries, sides within [1, h-1] (square.py:46-58)."""
        from dl_attack_on_imagenet_tpu.attacks.square import _p_schedule, _sizes

        p = _p_schedule(0.8, 5000)
        assert p.shape == (5000,)
        assert p[0] == 0.8 and p[-1] == pytest.approx(0.8 / 2**9)
        assert (np.diff(p) <= 0).all()
        s = _sizes(0.8, 5000, 224, 224)
        assert s.shape == (5000,)
        assert s.min() >= 1 and s.max() <= 223

    def test_square_intermediates_bounded_by_batch(self):
        """The 5000-query while_loop body at b64/224² carries only
        image-batch-sized arrays — every intermediate within 4× the batch."""
        from dl_attack_on_imagenet_tpu.attacks.square import square_linf

        n = 64
        apply_fn = _linear_victim()
        variables = {"w": jax.ShapeDtypeStruct((D224, 1000), jnp.float32)}
        img = jax.ShapeDtypeStruct((n, 224, 224, 3), jnp.float32)
        lab = jax.ShapeDtypeStruct((n,), jnp.int32)
        key = jax.ShapeDtypeStruct((2,), jnp.uint32)
        jaxpr = jax.make_jaxpr(
            lambda v, x, y, k: square_linf(
                apply_fn, v, x, y, 8 / 255, 5000, loss="ce", key=k
            )
        )(variables, img, lab, key)
        batch_bytes = n * D224 * 4
        assert max_intermediate_bytes(jaxpr) <= 4 * batch_bytes


class TestOnePixelPopulation:
    def test_population_math_at_reference_row(self):
        """torchattacks' scipy multiplier at the reference row
        (pixels=5, RGB): dims=25, popmul=max(1, 10//25)=1 -> pop=25."""
        from dl_attack_on_imagenet_tpu.attacks.one_pixel import OnePixel

        atk = OnePixel.__new__(OnePixel)
        atk.pixels, atk.popsize = 5, 10
        assert atk.population(3) == 25

    def test_inf_batch_bounds_live_candidates(self):
        """The DE loop at b64/224²/pop=25 with inf_batch=50 must never
        materialize the (n·pop, H, W, C) candidate tensor (~1.5 GB at the
        reference driver's operating point) — the largest intermediate is
        the inf_batch-chunked forward plus the class-prob table, bounded
        by 2× the INPUT batch (advisor round-3 medium fix)."""
        from dl_attack_on_imagenet_tpu.attacks.one_pixel import one_pixel_de

        n, pop = 64, 25
        apply_fn = _linear_victim()
        variables = {"w": jax.ShapeDtypeStruct((D224, 1000), jnp.float32)}
        img = jax.ShapeDtypeStruct((n, 224, 224, 3), jnp.float32)
        lab = jax.ShapeDtypeStruct((n,), jnp.int32)
        key = jax.ShapeDtypeStruct((2,), jnp.uint32)
        jaxpr = jax.make_jaxpr(
            lambda v, x, y, k: one_pixel_de(
                apply_fn, v, x, y, steps=10, pixels=5, pop=pop, inf_batch=50,
                targeted=False, key=k,
            )
        )(variables, img, lab, key)
        batch_bytes = n * D224 * 4  # the input images themselves
        full_candidate_bytes = n * pop * D224 * 4  # the pre-fix blowup
        peak = max_intermediate_bytes(jaxpr)
        assert peak <= 2 * batch_bytes
        assert peak < full_candidate_bytes // 10
