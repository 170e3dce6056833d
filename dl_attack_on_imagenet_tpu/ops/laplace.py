"""Laplace distribution fitting and sampling for unsupervised ADiL inference.

The reference fits with ``scipy.stats.laplace.fit`` (attacks/utils.py:60-150),
whose MLE is closed form: loc = sample median, scale = mean absolute deviation
from the median. We implement that closed form directly — jit-friendly jnp for
the unconditioned / per-atom fits, and a host-side numpy path for the
class-conditioned fits (a one-time setup cost, as in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def laplace_fit(x: jax.Array, min_scale: float = 1e-3):
    """MLE Laplace fit over all elements of ``x``.

    Returns scalar (loc, scale). Reference: attacks/utils.py:139-145
    (conditioned='none' branch).
    """
    flat = x.reshape(-1)
    loc = jnp.median(flat)
    scale = jnp.mean(jnp.abs(flat - loc))
    return loc, jnp.maximum(scale, min_scale)


def laplace_fit_per_atom(v: jax.Array, min_scale: float = 1e-3):
    """Column-wise Laplace fit of codes ``v`` (N, K) -> loc (K,), scale (K,).

    Reference: attacks/utils.py:148-158 (``fit_laplace_multivariate``,
    conditioned='atoms'), vectorized over the atom loop.
    """
    loc = jnp.median(v, axis=0)
    scale = jnp.mean(jnp.abs(v - loc[None, :]), axis=0)
    return loc, jnp.maximum(scale, min_scale)


def laplace_fit_conditioned(
    v: np.ndarray,
    groups: np.ndarray,
    num_groups: int,
    min_scale: float = 1e-3,
):
    """Per-group, per-atom Laplace fit.

    Args:
      v: (N, K) codes (host array).
      groups: (N,) int group id per row — true labels ('labels_atoms') or
        model predictions ('predictions_atoms').
      num_groups: number of groups (e.g. 1000 classes).

    Returns:
      loc, scale: (num_groups, K) float arrays. Groups with no samples get
      loc=0, scale=min_scale.

    Reference: attacks/utils.py:73-131 (``fit_laplace_aux``, the
    'predictions_atoms' / 'labels_atoms' branches — per-class numpy stacking).

    Vectorized (no per-group Python loop — at config-4 scale this is
    50k rows × 1000 classes × K=100): rows are ordered by (group, value)
    per column with two stable argsorts, group medians read out at
    per-group center offsets, and the mean absolute deviation accumulated
    with one segment-sum. Equality with the direct per-group fit is pinned
    in tests/test_laplace_conditioned.py.
    """
    v = np.asarray(v, dtype=np.float64)
    groups = np.asarray(groups)
    # Rows whose group id falls outside [0, num_groups) contribute to no
    # group — matching the direct per-group loop (``groups == g`` never
    # selects them), e.g. dataset labels beyond a reduced-class victim.
    in_range = (groups >= 0) & (groups < num_groups)
    if not in_range.all():
        v = v[in_range]
        groups = groups[in_range]
    n, k = v.shape
    loc = np.zeros((num_groups, k), dtype=np.float32)
    scale = np.full((num_groups, k), min_scale, dtype=np.float32)
    if n == 0:
        return loc, scale

    counts = np.bincount(groups, minlength=num_groups)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    nonempty = counts > 0

    # Per-column row order sorted by (group, value): value-order first,
    # then a stable group sort preserves within-group value order.
    ord_v = np.argsort(v, axis=0, kind="stable")  # (N, K)
    ord_g = np.argsort(groups[ord_v], axis=0, kind="stable")  # (N, K)
    final = np.take_along_axis(ord_v, ord_g, axis=0)  # (N, K)
    sorted_vals = np.take_along_axis(v, final, axis=0)  # (N, K)

    # Median = midpoint of the two central elements of each group's run.
    cnz = np.maximum(counts, 1)
    # Clip for empty groups (their offset can be n when they trail the
    # last occupied group); their med rows are garbage and masked below.
    lo = np.minimum(offsets + (cnz - 1) // 2, n - 1)
    hi = np.minimum(offsets + cnz // 2, n - 1)
    med = 0.5 * (sorted_vals[lo, :] + sorted_vals[hi, :])  # (G, K)

    # Mean absolute deviation from the group median, one segment-sum.
    abs_dev = np.abs(v - med[groups])  # (N, K)
    seg = np.zeros((num_groups, k), dtype=np.float64)
    np.add.at(seg, groups, abs_dev)
    mad = seg[nonempty] / counts[nonempty, None]

    loc[nonempty] = med[nonempty].astype(np.float32)
    scale[nonempty] = np.maximum(mad, min_scale).astype(np.float32)
    return loc, scale


def laplace_fit_conditioned_direct(
    v: np.ndarray,
    groups: np.ndarray,
    num_groups: int,
    min_scale: float = 1e-3,
):
    """Per-group Python-loop oracle for :func:`laplace_fit_conditioned`
    (the formulation the reference uses, attacks/utils.py:73-131); kept for
    the equality test and for debugging."""
    v = np.asarray(v)
    groups = np.asarray(groups)
    k = v.shape[1]
    loc = np.zeros((num_groups, k), dtype=np.float32)
    scale = np.full((num_groups, k), min_scale, dtype=np.float32)
    for g in range(num_groups):
        rows = v[groups == g]
        if rows.shape[0] == 0:
            continue
        med = np.median(rows, axis=0)
        mad = np.mean(np.abs(rows - med[None, :]), axis=0)
        loc[g] = med
        scale[g] = np.maximum(mad, min_scale)
    return loc, scale


def laplace_sample(key: jax.Array, loc, scale, shape) -> jax.Array:
    """Sample Laplace(loc, scale) of the given shape via inverse CDF.

    ``loc``/``scale`` broadcast against ``shape``. Reference: the
    ``torch.distributions.laplace.Laplace(...).sample`` calls in
    adil_regularized.py:852-903.
    """
    u = jax.random.uniform(key, shape, minval=-0.5 + 1e-7, maxval=0.5 - 1e-7)
    return jnp.asarray(loc) - jnp.asarray(scale) * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))
