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
    k = d.shape[0]
    d_flat = d.reshape(k, -1)
    if compute_dtype is not None:
        dv = jnp.dot(v.astype(compute_dtype), d_flat.astype(compute_dtype))
    else:
        dv = jnp.dot(v, d_flat, precision=_PRECISION, preferred_element_type=jnp.float32)
    if d.ndim > 2:
        return dv.reshape((v.shape[0],) + d.shape[1:])
    return dv


def dict_gram(d: jax.Array) -> jax.Array:
    """Gram matrix D Dᵀ of shape (K, K) over flattened atoms.

    Reference: adil.py:523 (``dtd = torch.tensordot(d, d, dims=([0,1,2],[0,1,2]))``).
    """
    d_flat = dict_flatten(d)
    return jnp.dot(d_flat, d_flat.T, precision=_PRECISION, preferred_element_type=jnp.float32)


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
    gram = jnp.dot(d_flat, d_flat.T, precision=_PRECISION, preferred_element_type=jnp.float32)
    if ridge:
        gram = gram + ridge * jnp.eye(gram.shape[0], dtype=gram.dtype)
    # Solve the small (K, K) system against the identity, then one matmul.
    # Solving directly against the (K, M) RHS compiles pathologically slowly
    # on TPU for M ~ 150k; this form keeps the LU factor work at K×K.
    gram_inv = jnp.linalg.solve(gram, jnp.eye(gram.shape[0], dtype=gram.dtype))
    return jnp.dot(gram_inv, d_flat, precision=_PRECISION, preferred_element_type=jnp.float32)


def codes_from_pinv(z: jax.Array, d_pinv: jax.Array) -> jax.Array:
    """v = z · D†ᵀ for image-shaped z (N, H, W, C) (or (N, M)).

    Reference: adil.py:534 (``v = torch.tensordot(z, d_drg, dims=([1,2,3],[1,2,3]))``).
    """
    z_flat = z.reshape(z.shape[0], -1)
    return jnp.dot(z_flat, d_pinv.T, precision=_PRECISION, preferred_element_type=jnp.float32)
