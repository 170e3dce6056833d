"""Projection and proximal operators for constrained attack optimization.

Semantics mirror the reference implementations (cited per-function below) but
are written as pure, batched, jit-friendly JAX: no Python loops over atoms or
images, static shapes everywhere, sort/cumsum formulated so XLA can tile them
on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clamp_image(image: jax.Array, min_val: float = 0.0, max_val: float = 1.0) -> jax.Array:
    """Clip an image to the valid pixel range.

    Reference: attacks/utils.py:17 (``clamp_image``).
    """
    return jnp.clip(image, min_val, max_val)


def linf_clamp(x: jax.Array, eps: float) -> jax.Array:
    """Project onto the l∞ ball of radius ``eps`` (elementwise clamp).

    Reference: adil.py:33 (``update_d``), adil.py:555 (z clamp).
    """
    return jnp.clip(x, -eps, eps)


def soft_threshold(x: jax.Array, lam) -> jax.Array:
    """Soft-thresholding operator, prox of ``lam * ||.||_1``.

    Reference: attacks/utils.py:159-161 (``get_prox_l1`` == torch Softshrink).
    """
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam, 0.0)


def l1_ball_project(x: jax.Array, eps: float) -> jax.Array:
    """Euclidean projection of each row of ``x`` onto the l1 ball of radius eps.

    Duchi et al. (ICML 2008) sort-based algorithm, batched over leading axes.
    Rows already inside the ball are returned unchanged.

    Reference: attacks/utils.py:21-41 (``project_onto_l1_ball``).

    Args:
      x: array of shape (..., d); the projection is applied to the last axis
         after flattening all leading axes into a batch.
      eps: radius of the l1 ball.

    Returns:
      Array of the same shape as ``x``.
    """
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1]) if x.ndim != 2 else x
    d = x2.shape[1]

    abs_x = jnp.abs(x2)
    inside = (jnp.sum(abs_x, axis=1, keepdims=True) < eps).astype(x2.dtype)

    # mu: row-wise descending sort of |x|; theta from the KKT conditions.
    mu = jnp.sort(abs_x, axis=1)[:, ::-1]
    cumsum = jnp.cumsum(mu, axis=1)
    arange = jnp.arange(1, d + 1, dtype=x2.dtype)
    # rho = largest index j with mu_j * j > cumsum_j - eps
    cond = (mu * arange > (cumsum - eps)).astype(x2.dtype) * arange
    rho = jnp.max(cond, axis=1)  # float valued count, >= 1 whenever outside
    rho_idx = jnp.maximum(rho.astype(jnp.int32) - 1, 0)
    theta = (jnp.take_along_axis(cumsum, rho_idx[:, None], axis=1)[:, 0] - eps) / jnp.maximum(rho, 1.0)
    proj = jnp.maximum(abs_x - theta[:, None], 0.0) * jnp.sign(x2)

    out = inside * x2 + (1.0 - inside) * proj
    return out.reshape(orig_shape)


def l1_ball_project_bisect(
    x: jax.Array, eps: float, iters: int = 50
) -> jax.Array:
    """l1-ball projection via bisection on the soft-threshold level theta.

    The projection is ``sign(x) * relu(|x| - theta)`` where theta >= 0
    solves ``sum(relu(|x| - theta)) = eps`` — monotone in theta, so bisection
    over [0, max|x|] converges to float32 precision in ~50 halvings of pure
    elementwise/reduce passes. On TPU this is the right formulation for
    long rows (the Duchi sort over a 224*224*3-dim vector maps poorly onto
    the hardware — SURVEY.md §7 hard part (e)); results match
    :func:`l1_ball_project` to ~1e-6.

    Same row convention as :func:`l1_ball_project`.
    """
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1]) if x.ndim != 2 else x

    abs_x = jnp.abs(x2)
    norms = jnp.sum(abs_x, axis=1)
    inside = norms < eps

    lo = jnp.zeros_like(norms)
    hi = jnp.max(abs_x, axis=1)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        s = jnp.sum(jnp.maximum(abs_x - mid[:, None], 0.0), axis=1)
        too_big = s > eps  # need larger theta
        lo = jnp.where(too_big, mid, lo)
        hi = jnp.where(too_big, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    theta = 0.5 * (lo + hi)
    proj = jnp.maximum(abs_x - theta[:, None], 0.0) * jnp.sign(x2)
    out = jnp.where(inside[:, None], x2, proj)
    return out.reshape(orig_shape)


def l2_ball_project(x: jax.Array, radius: float = 1.0, axis=None) -> jax.Array:
    """Project onto the l2 ball of the given radius.

    When ``axis`` is None the whole array is treated as one vector; otherwise
    the norm is taken over ``axis`` (tuple allowed) with broadcasting.

    Reference: attacks/utils.py:49-53 (l2ball branch of ``constraint_dict``)
    and adil.py:626-629 (``projection_v``, norm='l2').
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=axis is not None)
    norm = jnp.sqrt(jnp.maximum(sq, 1e-24))
    # min(1, r/||x||) rather than r/max(||x||, r): identical inside/outside
    # the ball, but stays a no-op (scale=1) for radius=inf, where the other
    # form hits inf/inf = NaN — FastUAP defaults to eps=inf (fast_uap.py:40)
    # and folds through this projection.
    scale = jnp.minimum(1.0, radius / norm)
    return x * scale


def l2_sphere_project(x: jax.Array, radius: float = 1.0, axis=None) -> jax.Array:
    """Project onto the l2 sphere (normalize to exactly ``radius``).

    Reference: attacks/utils.py:46-48 (l2sphere branch of ``constraint_dict``).
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=axis is not None)
    norm = jnp.sqrt(jnp.maximum(sq, 1e-24))
    return x * (radius / norm)


def project_atoms(d: jax.Array, constraint: str = "l2ball") -> jax.Array:
    """Per-atom projection of a dictionary ``d`` of shape (K, H, W, C) (or (K, M)).

    Each atom (row k) is projected independently:
      - 'l2sphere': ||d_k||_2 = 1
      - 'l2ball':   ||d_k||_2 <= 1
      - 'l1ball':   each CHANNEL of d_k onto the unit l1 ball

    Reference: attacks/utils.py:44-57 (``constraint_dict``; note the reference
    stores atoms on the LAST axis (C,H,W,K) and loops in Python — here atoms
    lead and the projection is batched). The l1ball branch calls
    ``project_onto_l1_ball(d[:, :, :, ind], eps=1)`` on a (C, H, W) slice,
    whose row view is PER-CHANNEL (utils.py:31-32) — so each (atom, channel)
    plane is projected to l1 <= 1, not the whole atom (executed-reference
    parity, tests/test_reference_exec_utils.py). A 2-D (K, M) input has no
    channel structure and keeps the whole-row projection (documented
    deviation; no reference path reaches l1ball with flat atoms).
    """
    k = d.shape[0]
    if constraint == "l1ball" and d.ndim == 4:
        kk, h, w, c = d.shape
        rows = d.transpose(0, 3, 1, 2).reshape(kk * c, h * w)
        if rows.shape[1] > 4096:
            out = l1_ball_project_bisect(rows, 1.0)
        else:
            out = l1_ball_project(rows, 1.0)
        return out.reshape(kk, c, h, w).transpose(0, 2, 3, 1)
    flat = d.reshape(k, -1)
    if constraint == "l2sphere":
        out = l2_sphere_project(flat, 1.0, axis=1)
    elif constraint == "l2ball":
        out = l2_ball_project(flat, 1.0, axis=1)
    elif constraint == "l1ball":
        # Atom rows are H*W*C-dimensional (~150k): bisection beats the
        # sort-based form on TPU (see l1_ball_project_bisect).
        if flat.shape[1] > 4096:
            out = l1_ball_project_bisect(flat, 1.0)
        else:
            out = l1_ball_project(flat, 1.0)
    else:
        raise ValueError(f"unknown dictionary constraint: {constraint}")
    return out.reshape(d.shape)


def project_codes(v: jax.Array, eps: float, norm: str = "linf") -> jax.Array:
    """Projection of coding vectors ``v`` (N, K) enforcing the attack budget.

    For an l∞ attack budget the codes live in an l1 ball of radius eps (so
    that ||D v||_inf <= eps when ||D||_inf <= 1); for an l2 budget they live
    in an l2 ball of radius eps.

    Reference: adil.py:625-633 (``projection_v``).
    """
    norm = norm.lower()
    if norm == "l2":
        return l2_ball_project(v, eps, axis=1)
    if norm == "linf":
        return l1_ball_project(v, eps)
    raise ValueError(f"unknown norm: {norm}")


def project_dictionary(d: jax.Array, norm: str = "linf") -> jax.Array:
    """Projection of the dictionary under the attack-budget norm.

    l∞ budget: atoms clamped to [-1, 1] elementwise; l2 budget: per-atom
    unit l2 ball.

    Reference: adil.py:635-642 (``projection_d``).
    """
    norm = norm.lower()
    if norm == "l2":
        return project_atoms(d, "l2ball")
    if norm == "linf":
        return jnp.clip(d, -1.0, 1.0)
    raise ValueError(f"unknown norm: {norm}")
