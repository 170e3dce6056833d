"""Small RNG helpers."""

from __future__ import annotations

import jax


def key_seq(key: jax.Array):
    """Infinite generator of fresh PRNG keys split from ``key``."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
