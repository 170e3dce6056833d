"""Dictionary contraction math: D·v as MXU matmuls.

The reference computes ``dv = torch.tensordot(v[index], D, dims=([1],[3]))``
with D stored (C, H, W, K) (adil.py:24-26). Here the dictionary is stored
atoms-first, (K, H, W, C) — or pre-flattened (K, M) with M = H*W*C — so the
contraction is a single (N, K) @ (K, M) matmul that XLA tiles directly onto
the MXU, and the pixel axis M is contiguous NHWC like the images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The dictionary contraction must run in true fp32: with the TPU default
# (bf16 MXU passes) the computed ||Dv||_inf can exceed the eps budget by
# ~1e-4, breaking the attack's constraint contract. The contraction is a
# negligible fraction of total FLOPs (the victim model dominates), so
# HIGHEST precision here is free in practice.
_PRECISION = jax.lax.Precision.HIGHEST


def dict_flatten(d: jax.Array) -> jax.Array:
    """(K, H, W, C) -> (K, M)."""
    return d.reshape(d.shape[0], -1)


def dict_unflatten(d_flat: jax.Array, image_shape) -> jax.Array:
    """(K, M) -> (K, H, W, C)."""
    return d_flat.reshape((d_flat.shape[0],) + tuple(image_shape))


def dict_apply(v: jax.Array, d: jax.Array, compute_dtype=None) -> jax.Array:
    """Compute perturbations ``dv`` for a batch of codes.

    Args:
      v: (N, K) coding vectors.
      d: dictionary, either (K, H, W, C) or flattened (K, M).
      compute_dtype: None (default) runs the contraction in true fp32
        (HIGHEST precision — required wherever dv feeds an eps-budget
        guarantee); a dtype (e.g. ``jnp.bfloat16``) runs it in that dtype —
        the mixed-precision INNER-forward path only (master state and every
        budget clamp must stay fp32 at the call site).

    Returns:
      (N, H, W, C) (or (N, M) if d was flat) perturbations.

    Reference: adil.py:25 (``torch.tensordot(self.v[index,:], self.d,
    dims=([1],[3]))``).
    """
    if compute_dtype is not None:
        v, d = v.astype(compute_dtype), d.astype(compute_dtype)
        precision, out_dtype = None, compute_dtype
    else:
        # promote, never truncate: f64 operands (the executed-reference
        # parity tests) keep an f64 accumulator/output; f32/bf16 inputs
        # keep the true-fp32 contraction as before
        precision = _PRECISION
        out_dtype = jnp.promote_types(jnp.float32, jnp.result_type(v, d))
    if d.ndim > 2:
        # Contract over the atom axis directly (image-shaped output, no
        # flatten): reshaping the (N, M) matmul result back to NHWC forced a
        # relayout copy per call inside conv-layout loops (BENCHMARKS.md
        # round 4, DDrague per-op trace).
        return jax.lax.dot_general(
            v, d, (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=out_dtype)
    return jnp.dot(v, d, precision=precision, preferred_element_type=out_dtype)


def dict_gram(d: jax.Array) -> jax.Array:
    """Gram matrix D Dᵀ of shape (K, K) over flattened atoms.

    Reference: adil.py:523 (``dtd = torch.tensordot(d, d, dims=([0,1,2],[0,1,2]))``).
    """
    d_flat = dict_flatten(d)
    out_dtype = jnp.promote_types(jnp.float32, d_flat.dtype)
    return jnp.dot(d_flat, d_flat.T, precision=_PRECISION,
                   preferred_element_type=out_dtype)


def dict_pinv(d: jax.Array, ridge: float = 0.0) -> jax.Array:
    """Pseudo-inverse contraction operator D† of shape (K, M).

    ``codes_from_pinv(z, d_pinv)`` then maps an image-shaped perturbation z to
    the least-squares codes v = (D Dᵀ)⁻¹ D z.

    Reference: adil.py:523-525 (dtd_inv / d_drg precompute; the reference
    materializes the explicit inverse — here the SPD Gram is solved directly,
    which is both better conditioned and far cheaper to compile on TPU).
    ``ridge`` adds a Tikhonov term for near-rank-deficient dictionaries (the
    reference inverts unregularized).
    """
    d_flat = dict_flatten(d)
    out_dtype = jnp.promote_types(jnp.float32, d_flat.dtype)
    gram = jnp.dot(d_flat, d_flat.T, precision=_PRECISION,
                   preferred_element_type=out_dtype)
    if ridge:
        gram = gram + ridge * jnp.eye(gram.shape[0], dtype=gram.dtype)
    # Solve the small (K, K) system against the identity, then one matmul.
    # Solving directly against the (K, M) RHS compiles pathologically slowly
    # on TPU for M ~ 150k; this form keeps the LU factor work at K×K.
    gram_inv = jnp.linalg.solve(gram, jnp.eye(gram.shape[0], dtype=gram.dtype))
    return jnp.dot(gram_inv, d_flat, precision=_PRECISION,
                   preferred_element_type=out_dtype)


def codes_from_pinv(z: jax.Array, d_pinv: jax.Array, compute_dtype=None) -> jax.Array:
    """v = z · D†ᵀ for image-shaped z (N, H, W, C) (or (N, M)).

    ``compute_dtype`` follows the :func:`dict_apply` contract: None runs the
    contraction in true fp32 (HIGHEST — the default, and required wherever
    the codes feed a budget guarantee or a reference-parity trajectory); a
    dtype (e.g. ``jnp.bfloat16``) runs it in that dtype for mixed-precision
    INNER loops whose master state stays fp32 (DDrague's in-loop read-off —
    the z eps-clamp, not v, carries that solver's only budget semantics,
    adil.py:536-541).

    Image-shaped z contracts over the image axes directly (one dot_general,
    ``d_pinv`` reshaped to z's trailing shape) instead of flattening z: the
    flatten forced XLA to materialize a relayout copy of the loop-carried
    NHWC z (and of its gradient) every solver iteration — ~1 ms/iter at the
    production (64, 112, 112, 12) shape (BENCHMARKS.md round 4, DDrague
    per-op trace).

    Reference: adil.py:534 (``v = torch.tensordot(z, d_drg, dims=([1,2,3],[1,2,3]))``).
    """
    if compute_dtype is not None:
        z, d_pinv = z.astype(compute_dtype), d_pinv.astype(compute_dtype)
        precision = None
        out_dtype = compute_dtype
    else:
        precision = _PRECISION
        out_dtype = jnp.promote_types(jnp.float32, jnp.result_type(z, d_pinv))
    if z.ndim > 2:
        d_img = d_pinv.reshape((d_pinv.shape[0],) + z.shape[1:])
        axes = tuple(range(1, z.ndim))
        return jax.lax.dot_general(
            z, d_img, (((axes), (axes)), ((), ())),
            precision=precision, preferred_element_type=out_dtype)
    return jnp.dot(z, d_pinv.T, precision=precision,
                   preferred_element_type=out_dtype)
