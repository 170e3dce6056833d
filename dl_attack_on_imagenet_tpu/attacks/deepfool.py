"""DeepFool: minimal-l2 perturbation via linearized decision boundaries.

TPU-native rework of /root/reference/attacks/attacks_classes/deepfool.py:9-69
(and the copy inside fast_uap.py:217-276): the reference runs one image at a
time with a Python while-loop doing ``num_classes`` sequential
``backward(retain_graph=True)`` passes; here the whole batch advances in
lockstep under a single ``lax.while_loop`` with an active mask, and the
per-class gradients come from one ``jacrev`` (k backward passes batched by
XLA, no retained graphs).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from ..models import VictimModel
from .base import Attack

ApplyFn = Callable[[Any, jax.Array], jax.Array]


@functools.lru_cache(maxsize=None)
def cached_deepfool(apply_fn: ApplyFn, num_classes: int = 10,
                    overshoot: float = 0.02, max_iter: int = 10):
    """Jitted :func:`deepfool_batch` shared across attack instances.

    DeepFool's jacrev-through-the-victim is one of the heaviest compiles in
    the framework; the reference driver builds one attack object per
    victim/eps combo (demo_dL_attack.py:71-90), so per-instance ``jax.jit``
    wrappers re-trace it per instance. Module-level cache = one compile per
    (victim, k, overshoot, iters) — the same pattern as adil.py's solver
    cache.
    """
    return jax.jit(partial(deepfool_batch, apply_fn, num_classes=num_classes,
                           overshoot=overshoot, max_iter=max_iter))


@functools.lru_cache(maxsize=None)
def cached_predict_fn(apply_fn: ApplyFn):
    """Jitted argmax-predict shared across attack instances."""

    @jax.jit
    def predict(variables, x):
        return jnp.argmax(apply_fn(variables, x).astype(jnp.float32), -1)

    return predict


def deepfool_batch(
    apply_fn: ApplyFn,
    variables: Any,
    images: jax.Array,
    num_classes: int = 10,
    overshoot: float = 0.02,
    max_iter: int = 10,
    active_init: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Batched DeepFool.

    Args:
      images: (N, H, W, C) in [0,1].
      num_classes: number of top logits to linearize against (reference
        default 10, deepfool.py:9).
      active_init: optional (N,) bool mask — rows starting False never
        iterate and return (0, 0). Lets callers batch a chunk while only
        solving its gated subset (the FastUAP/universal_pert "still
        fooled?" gates, fast_uap.py:80, universal_pert.py:79) without the
        masked-out rows extending the lockstep loop.

    Returns:
      (r_tot, iters): accumulated perturbations (N, H, W, C) already scaled
      by (1+overshoot) (deepfool.py:67), and per-image iteration counts —
      matching the reference's ``return r_tot, loop_i``.
    """
    n = images.shape[0]
    logits0 = apply_fn(variables, images).astype(jnp.float32)
    # Top-k candidate classes per image, original label first.
    _, top_idx = jax.lax.top_k(logits0, num_classes)  # (N, k)
    labels = top_idx[:, 0]

    def selected_logits(x_single, idx_single):
        lg = apply_fn(variables, x_single[None]).astype(jnp.float32)[0]
        return lg[idx_single], lg

    # Per-image Jacobian of the k selected logits wrt the image.
    jac_fn = jax.vmap(
        jax.jacrev(lambda x, i: selected_logits(x, i)[0], argnums=0),
        in_axes=(0, 0),
    )

    def cond(carry):
        _, active, it, _ = carry
        return jnp.logical_and(jnp.any(active), it < max_iter)

    def body(carry):
        r_tot, active, it, iters = carry
        pert = images + (1.0 + overshoot) * r_tot
        logits = apply_fn(variables, pert).astype(jnp.float32)
        k_i = jnp.argmax(logits, -1)
        still = k_i == labels  # not yet fooled
        active = active & still

        jac = jac_fn(pert, top_idx)  # (N, k, H, W, C)
        f = jnp.take_along_axis(logits, top_idx, axis=1)  # (N, k)
        w = jac[:, 1:] - jac[:, :1]  # (N, k-1, H, W, C)
        f_k = f[:, 1:] - f[:, :1]  # (N, k-1)
        w_norm = jnp.sqrt(jnp.sum(w**2, axis=(2, 3, 4)) + 1e-24)
        pert_k = jnp.abs(f_k) / w_norm
        best = jnp.argmin(pert_k, axis=1)  # (N,)
        w_best = jnp.take_along_axis(
            w, best[:, None, None, None, None], axis=1
        )[:, 0]
        pert_best = jnp.take_along_axis(pert_k, best[:, None], axis=1)[:, 0]
        w_best_norm = jnp.sqrt(jnp.sum(w_best**2, axis=(1, 2, 3), keepdims=True) + 1e-24)
        r_i = (pert_best[:, None, None, None] + 1e-4) * w_best / w_best_norm

        mask = active[:, None, None, None].astype(r_i.dtype)
        r_tot = r_tot + mask * r_i
        iters = iters + active.astype(iters.dtype)
        return (r_tot, active, it + 1, iters)

    r0 = jnp.zeros_like(images)
    if active_init is not None:
        active0 = jnp.asarray(active_init, jnp.bool_)
    else:
        active0 = jnp.ones((n,), jnp.bool_)
    iters0 = jnp.zeros((n,), jnp.int32)
    r_tot, _, _, iters = jax.lax.while_loop(
        cond, body, (r0, active0, jnp.zeros((), jnp.int32), iters0)
    )
    return (1.0 + overshoot) * r_tot, iters


class DeepFool(Attack):
    """Attack-class wrapper over :func:`deepfool_batch`."""

    def __init__(
        self,
        victim: VictimModel,
        num_classes: int = 10,
        overshoot: float = 0.02,
        steps: int = 10,
    ):
        super().__init__(victim, "DeepFool", targeted=False)
        self.num_classes = num_classes
        self.overshoot = overshoot
        self.steps = steps
        self._fn = cached_deepfool(victim.apply_fn, num_classes, overshoot,
                                   steps)

    def forward(self, images: jax.Array, labels: jax.Array) -> jax.Array:
        r_tot, _ = self._fn(self.victim.variables, images)
        return jnp.clip(images + r_tot, 0.0, 1.0)
