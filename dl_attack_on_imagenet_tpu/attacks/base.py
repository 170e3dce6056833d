"""Attack base class: frozen-victim plumbing shared by all attacks.

Replaces the reference's dependency on ``torchattacks.attack.Attack`` (the
base of every attack class, e.g. adil.py:37) with a minimal JAX-native
equivalent: a callable ``attack(images, labels) -> adv_images`` over NHWC
[0,1] arrays, with targeted-label selection helpers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models import VictimModel


class Attack:
    """Base for attacks on a frozen victim classifier."""

    def __init__(self, victim: VictimModel, name: str = "Attack", targeted: bool = False):
        self.victim = victim
        self.name = name
        self.targeted = targeted

    # -- label helpers ----------------------------------------------------

    def get_target(self, images: jax.Array, labels: jax.Array) -> jax.Array:
        """Targeted => second most probable class, else the given labels.

        Reference: attacks/utils.py:164-174 (``get_target``).
        """
        if not self.targeted:
            return labels
        logits = self.victim(images)
        order = jnp.argsort(logits, axis=-1)
        return order[:, -2]

    def predict(self, images: jax.Array) -> jax.Array:
        return self.victim.predict(images)

    # -- call protocol ----------------------------------------------------

    def forward(self, images: jax.Array, labels: jax.Array) -> jax.Array:
        raise NotImplementedError

    def __call__(self, images: jax.Array, labels: Optional[jax.Array] = None) -> jax.Array:
        images = jnp.asarray(images)
        if labels is None:
            labels = self.predict(images)
        return self.forward(images, jnp.asarray(labels))
