"""Vectorized class-conditioned Laplace fit == the per-group loop oracle.

VERDICT round-2 weak #5: ``laplace_fit_conditioned`` was a 1000-iteration
host Python loop; it is now a two-argsort + segment-sum formulation. These
tests pin exact agreement with the direct per-group fit (the reference's
formulation, attacks/utils.py:73-131), including empty groups, singleton
groups, even/odd group sizes, and the 1000-class shape.
"""

import numpy as np

from dl_attack_on_imagenet_tpu.ops.laplace import (
    laplace_fit_conditioned,
    laplace_fit_conditioned_direct,
)


def _check(v, groups, num_groups, min_scale=1e-3):
    loc_v, scale_v = laplace_fit_conditioned(v, groups, num_groups, min_scale)
    loc_d, scale_d = laplace_fit_conditioned_direct(v, groups, num_groups, min_scale)
    np.testing.assert_allclose(loc_v, loc_d, rtol=0, atol=1e-6)
    np.testing.assert_allclose(scale_v, scale_d, rtol=1e-6, atol=1e-7)


def test_matches_oracle_random_groups():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((200, 7)).astype(np.float32)
    groups = rng.integers(0, 10, size=200)
    _check(v, groups, 10)


def test_empty_and_singleton_groups():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((6, 3)).astype(np.float32)
    # group 0: 1 row; group 1: empty; group 2: 2 rows; group 3: 3 rows
    groups = np.array([0, 2, 2, 3, 3, 3])
    _check(v, groups, 5)
    loc, scale = laplace_fit_conditioned(v, groups, 5)
    assert np.all(loc[1] == 0) and np.all(scale[1] == 1e-3)  # empty group
    assert np.all(loc[4] == 0) and np.all(scale[4] == 1e-3)  # never seen


def test_even_odd_medians_and_min_scale():
    # Constant columns drive MAD to 0 -> clamped at min_scale.
    v = np.array(
        [[1.0, 5.0], [3.0, 5.0], [2.0, 5.0], [4.0, 5.0], [10.0, 5.0]],
        dtype=np.float32,
    )
    groups = np.array([0, 0, 0, 0, 1])
    loc, scale = laplace_fit_conditioned(v, groups, 2, min_scale=1e-3)
    assert loc[0, 0] == 2.5  # even-count midpoint median
    assert scale[0, 1] == 1e-3  # zero MAD clamped
    assert loc[1, 0] == 10.0  # singleton median is the value
    _check(v, groups, 2)


def test_out_of_range_groups_ignored():
    """Group ids outside [0, num_groups) are silently ignored, matching the
    per-group loop (``groups == g`` never selects them) — e.g. dataset
    labels beyond a reduced-class victim's ``num_classes``."""
    rng = np.random.default_rng(3)
    v = rng.standard_normal((30, 4)).astype(np.float32)
    groups = rng.integers(0, 10, size=30)
    groups[5] = 15   # above num_groups
    groups[11] = -1  # negative
    _check(v, groups, 10)
    # And all-out-of-range degenerates to the empty fit.
    loc, scale = laplace_fit_conditioned(v, np.full(30, 99), 10)
    assert np.all(loc == 0) and np.all(scale == 1e-3)


def test_config4_shape_runs_fast():
    """1000 classes at a config-4-like row count completes in one pass."""
    import time

    rng = np.random.default_rng(2)
    n, k, g = 50_000, 100, 1000
    v = rng.standard_normal((n, k)).astype(np.float32)
    groups = rng.integers(0, g, size=n)
    t0 = time.perf_counter()
    loc, scale = laplace_fit_conditioned(v, groups, g)
    dt = time.perf_counter() - t0
    assert loc.shape == (g, k) and scale.shape == (g, k)
    assert np.isfinite(loc).all() and (scale > 0).all()
    # Sanity-check a few groups against the oracle (full oracle is slow).
    for gid in (0, 499, 999):
        rows = v[groups == gid]
        med = np.median(rows, axis=0)
        np.testing.assert_allclose(loc[gid], med, atol=1e-6)
    # The loop took ~tens of seconds at this shape; the vectorized pass
    # must be well under 30 s even on a slow 1-core host.
    assert dt < 30.0
