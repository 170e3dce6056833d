"""VGG family (11/13/16/19) — Flax/NHWC victim classifiers.

Parity target: torchvision vgg11 (reference victim, main.py:51-52) and vgg16
(BASELINE.json multi-model eval config).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import max_pool, relu

CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    cfg: Sequence
    num_classes: int = 1000
    dtype: Any = jnp.float32
    hidden: int = 4096  # classifier width (torchvision: 4096)

    @nn.compact
    def __call__(self, x):
        for item in self.cfg:
            if item == "M":
                x = max_pool(x, (2, 2), (2, 2), padding="VALID")
            else:
                x = nn.Conv(item, (3, 3), padding="SAME", dtype=self.dtype)(x)
                x = relu(x)
        # torchvision applies adaptive avg-pool to 7x7 before the classifier;
        # at 224 input the spatial dims are already 7x7.
        if x.shape[1] != 7 or x.shape[2] != 7:
            x = nn.avg_pool(
                x,
                (max(x.shape[1] // 7, 1), max(x.shape[2] // 7, 1)),
                strides=(max(x.shape[1] // 7, 1), max(x.shape[2] // 7, 1)),
            )
        # Flatten in torch's channel-major (C, H, W) order so torchvision
        # classifier weights map onto Dense_0 by a pure transpose (the NHWC
        # flatten would silently permute the 25088 input features —
        # caught by tests/test_torch_forward_parity.py).
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def vgg11(num_classes: int = 1000, dtype=jnp.float32, hidden: int = 4096) -> VGG:
    return VGG(CFGS["vgg11"], num_classes, dtype, hidden)


def vgg16(num_classes: int = 1000, dtype=jnp.float32, hidden: int = 4096) -> VGG:
    return VGG(CFGS["vgg16"], num_classes, dtype, hidden)


def vgg19(num_classes: int = 1000, dtype=jnp.float32, hidden: int = 4096) -> VGG:
    return VGG(CFGS["vgg19"], num_classes, dtype, hidden)
