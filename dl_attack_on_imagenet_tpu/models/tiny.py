"""Tiny CNN victim for fast CPU tests.

The reference has no test models (SURVEY.md §4: no tests at all); this fills
that gap — a few-thousand-parameter classifier whose forward+backward runs in
milliseconds so attack loops are testable on the virtual CPU mesh.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import relu


class TinyCNN(nn.Module):
    num_classes: int = 10
    features: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
        x = relu(x)
        x = nn.Conv(self.features * 2, (3, 3), strides=(2, 2), dtype=self.dtype)(x)
        x = relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def tiny_cnn(num_classes: int = 10, dtype=jnp.float32) -> TinyCNN:
    return TinyCNN(num_classes=num_classes, dtype=dtype)
