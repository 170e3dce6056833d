"""Pallas TPU kernels: the native-kernel tier of the framework.

The reference consumes CUDA elementwise/sort kernels through torch
(SURVEY.md §2.3); here the hot fusions are written directly against the TPU
memory hierarchy:

- ``fused_perturb``: adv = clip(x + clamp(v @ D, ±eps), lo, hi) in ONE pass —
  the dictionary contraction runs on the MXU and the eps-clamp / image-add /
  pixel-clip tail is applied in VMEM before the tile is written back, so the
  (N, H*W*C) perturbation tensor never round-trips through HBM. Used by every
  inference path (adil.py:534-560, :460-506 compute pattern).
- ``fused_adamw_project``: one-pass AdamW + l∞ projection update for the
  dictionary: reads (d, g, mu, nu) and writes (d, mu, nu) once instead of
  XLA's multi-buffer optax chain. Projection semantics: optimizer step THEN
  clamp (adil.py:185-188).

Both have jnp reference implementations (``*_reference``) used as the
ground truth in tests and as the fallback on non-TPU backends.

STATUS — measured on a real v5e chip (production shapes: N=64, K=100,
M=150528; D update = 15.05M params):

  fused_perturb:        Pallas 1.89 ms vs XLA-fused 0.02 ms
  fused_adamw_project:  Pallas 54 ms  vs XLA-fused 1.3 ms

XLA's automatic fusion decisively wins both (the guide's "don't
hand-schedule what the compiler already does" rule, observed empirically),
so the default compute paths keep the jnp forms and these kernels remain an
optional, correctness-verified native tier (`pallas==xla` exact on TPU) —
the integration surface for future genuinely-fusion-resistant ops (e.g. a
VMEM-resident bitonic sort for atom-level l1 projections).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# fused_perturb: clip(x + clamp(vD, ±eps))
# ---------------------------------------------------------------------------


def fused_perturb_reference(v, d_flat, x_flat, eps, lo=0.0, hi=1.0):
    dv = jnp.dot(
        v, d_flat, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return jnp.clip(x_flat + jnp.clip(dv, -eps, eps), lo, hi)


def _perturb_kernel(eps_ref, v_ref, d_ref, x_ref, o_ref):
    eps = eps_ref[0]
    dv = jnp.dot(
        v_ref[:], d_ref[:], precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    dv = jnp.clip(dv, -eps, eps)
    o_ref[:] = jnp.clip(x_ref[:] + dv, 0.0, 1.0)


def fused_perturb(
    v: jax.Array,
    d: jax.Array,
    x: jax.Array,
    eps: float,
    block_m: int = 1536,
    interpret: bool = False,
) -> jax.Array:
    """adv = clip(x + clamp(v @ D, ±eps), 0, 1), fused.

    Args:
      v: (N, K) codes. d: (K, H, W, C) or (K, M) dictionary.
      x: images, same trailing shape as d's atoms.
      block_m: pixel-axis tile (multiple of 128).

    Grid tiles the M = H*W*C axis; each program computes an (N, block_m)
    output tile: one (N, K) x (K, block_m) MXU matmul + VPU tail, writing
    the final adversarial tile straight back to HBM.
    """
    orig_shape = x.shape
    n, k = v.shape
    d_flat = d.reshape(k, -1)
    m = d_flat.shape[1]
    x_flat = x.reshape(n, m)

    if not (_on_tpu() or interpret):
        return fused_perturb_reference(v, d_flat, x_flat, eps).reshape(orig_shape)

    block_m = min(block_m, m)
    pad = (-m) % block_m
    if pad:
        d_flat = jnp.pad(d_flat, ((0, 0), (0, pad)))
        x_flat = jnp.pad(x_flat, ((0, 0), (0, pad)))
    m_pad = m + pad
    grid = (m_pad // block_m,)

    out = pl.pallas_call(
        _perturb_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, k), lambda i, *_: (0, 0)),
                pl.BlockSpec((k, block_m), lambda i, *_: (0, i)),
                pl.BlockSpec((n, block_m), lambda i, *_: (0, i)),
            ],
            out_specs=pl.BlockSpec((n, block_m), lambda i, *_: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((n, m_pad), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([eps], jnp.float32), v.astype(jnp.float32), d_flat.astype(jnp.float32), x_flat.astype(jnp.float32))

    if pad:
        out = out[:, :m]
    return out.reshape(orig_shape)


# ---------------------------------------------------------------------------
# fused_adamw_project: one-pass AdamW + linf projection
# ---------------------------------------------------------------------------


def fused_adamw_project_reference(p, g, mu, nu, step, lr, b1=0.9, b2=0.999,
                                  eps=1e-8, wd=1e-2, clip_val=1.0):
    mu = b1 * mu + (1 - b1) * g
    nu = b2 * nu + (1 - b2) * g * g
    mu_hat = mu / (1 - b1**step)
    nu_hat = nu / (1 - b2**step)
    p = p - lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p)
    return jnp.clip(p, -clip_val, clip_val), mu, nu


def _adamw_kernel(scal_ref, p_ref, g_ref, mu_ref, nu_ref,
                  p_out, mu_out, nu_out):
    lr = scal_ref[0]
    bc1 = scal_ref[1]  # 1 - b1**t
    bc2 = scal_ref[2]  # 1 - b2**t
    clip_val = scal_ref[3]
    b1, b2, eps, wd = 0.9, 0.999, 1e-8, 1e-2
    g = g_ref[:]
    mu = b1 * mu_ref[:] + (1 - b1) * g
    nu = b2 * nu_ref[:] + (1 - b2) * g * g
    upd = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
    p = p_ref[:] - lr * (upd + wd * p_ref[:])
    p_out[:] = jnp.clip(p, -clip_val, clip_val)
    mu_out[:] = mu
    nu_out[:] = nu


def fused_adamw_project(
    p: jax.Array,
    g: jax.Array,
    mu: jax.Array,
    nu: jax.Array,
    step: jax.Array,
    lr: float,
    clip_val: float = 1.0,
    block: int = 65536,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One-pass AdamW(lr, torch defaults) + clamp to ±clip_val.

    Matches ``optax.adamw`` + ``project_dictionary(..., 'linf')`` (the 'gd'
    training update, adil.py:185-188) bit-for-bit-ish: bias correction uses
    the 1-indexed step like torch/optax.
    """
    shape = p.shape
    size = p.size
    step_f = jnp.asarray(step, jnp.float32)
    scal = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        1.0 - 0.9**step_f,
        1.0 - 0.999**step_f,
        jnp.asarray(clip_val, jnp.float32),
    ])

    if not (_on_tpu() or interpret):
        out = fused_adamw_project_reference(
            p, g, mu, nu, step_f, lr, clip_val=clip_val
        )
        return out

    flat = lambda a: a.reshape(-1)
    # Pad to a multiple of 8*128 so rows are sublane-aligned.
    pad = (-size) % 1024
    pf, gf, muf, nuf = (jnp.pad(flat(a), (0, pad)) for a in (p, g, mu, nu))
    total = size + pad
    rows = total // 128
    # Largest multiple-of-8 block that divides rows (<= requested block).
    block_rows = max(min(block // 128, rows) // 8 * 8, 8)
    while rows % block_rows:
        block_rows -= 8
    grid = (rows // block_rows,)
    spec = pl.BlockSpec((block_rows, 128), lambda i, *_: (i, 0))

    p2, mu2, nu2 = pl.pallas_call(
        _adamw_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec, spec, spec, spec],
            out_specs=[spec, spec, spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        ],
        interpret=interpret,
    )(scal, pf.reshape(rows, 128), gf.reshape(rows, 128),
      muf.reshape(rows, 128), nuf.reshape(rows, 128))

    unflat = lambda a: a.reshape(-1)[:size].reshape(shape)
    return unflat(p2), unflat(mu2), unflat(nu2)
