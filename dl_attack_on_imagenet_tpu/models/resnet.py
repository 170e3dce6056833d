"""ResNet family (18/34/50) — Flax/NHWC victim classifiers.

Architecture-parity targets torchvision's resnet18 (the reference's default
victim, main.py:41-42); layout and module structure are TPU-native NHWC.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, global_avg_pool, max_pool


class BasicBlock(nn.Module):
    features: int
    strides: tuple = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvBN(self.features, (3, 3), self.strides, dtype=self.dtype)(x)
        y = ConvBN(self.features, (3, 3), relu=False, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = ConvBN(
                self.features, (1, 1), self.strides, relu=False, dtype=self.dtype
            )(x)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: tuple = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvBN(self.features, (1, 1), dtype=self.dtype)(x)
        y = ConvBN(self.features, (3, 3), self.strides, dtype=self.dtype)(y)
        y = ConvBN(self.features * 4, (1, 1), relu=False, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = ConvBN(
                self.features * 4, (1, 1), self.strides, relu=False, dtype=self.dtype
            )(x)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block: Any
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBN(64, (7, 7), (2, 2), dtype=self.dtype)(x)
        x = max_pool(x, (3, 3), (2, 2))
        for i, size in enumerate(self.stage_sizes):
            for j in range(size):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = self.block(64 * 2**i, strides, dtype=self.dtype)(x)
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def resnet18(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    return ResNet([2, 2, 2, 2], BasicBlock, num_classes, dtype)


def resnet34(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    return ResNet([3, 4, 6, 3], BasicBlock, num_classes, dtype)


def resnet50(num_classes: int = 1000, dtype=jnp.float32) -> ResNet:
    return ResNet([3, 4, 6, 3], Bottleneck, num_classes, dtype)
