"""Inception v3 — Flax/NHWC victim classifier.

Parity target: torchvision inception_v3 (reference victim, main.py:47-48).
The reference feeds 224x224 crops despite Inception's native 299 (the repo
uses one blanket transform, DS_ImageNet.py:14-18); global average pooling
makes the head size-agnostic, so both input sizes work here.
Aux head omitted (eval-mode victims only, adil.py:68).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, global_avg_pool, max_pool


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), dtype=self.dtype)(x)
        b2 = ConvBN(48, (1, 1), dtype=self.dtype)(x)
        b2 = ConvBN(64, (5, 5), dtype=self.dtype)(b2)
        b3 = ConvBN(64, (1, 1), dtype=self.dtype)(x)
        b3 = ConvBN(96, (3, 3), dtype=self.dtype)(b3)
        b3 = ConvBN(96, (3, 3), dtype=self.dtype)(b3)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = ConvBN(self.pool_features, (1, 1), dtype=self.dtype)(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(384, (3, 3), (2, 2), padding="VALID", dtype=self.dtype)(x)
        b2 = ConvBN(64, (1, 1), dtype=self.dtype)(x)
        b2 = ConvBN(96, (3, 3), dtype=self.dtype)(b2)
        b2 = ConvBN(96, (3, 3), (2, 2), padding="VALID", dtype=self.dtype)(b2)
        b3 = max_pool(x, (3, 3), (2, 2), padding="VALID")
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), dtype=self.dtype)(x)
        b2 = ConvBN(c7, (1, 1), dtype=self.dtype)(x)
        b2 = ConvBN(c7, (1, 7), dtype=self.dtype)(b2)
        b2 = ConvBN(192, (7, 1), dtype=self.dtype)(b2)
        b3 = ConvBN(c7, (1, 1), dtype=self.dtype)(x)
        b3 = ConvBN(c7, (7, 1), dtype=self.dtype)(b3)
        b3 = ConvBN(c7, (1, 7), dtype=self.dtype)(b3)
        b3 = ConvBN(c7, (7, 1), dtype=self.dtype)(b3)
        b3 = ConvBN(192, (1, 7), dtype=self.dtype)(b3)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = ConvBN(192, (1, 1), dtype=self.dtype)(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(192, (1, 1), dtype=self.dtype)(x)
        b1 = ConvBN(320, (3, 3), (2, 2), padding="VALID", dtype=self.dtype)(b1)
        b2 = ConvBN(192, (1, 1), dtype=self.dtype)(x)
        b2 = ConvBN(192, (1, 7), dtype=self.dtype)(b2)
        b2 = ConvBN(192, (7, 1), dtype=self.dtype)(b2)
        b2 = ConvBN(192, (3, 3), (2, 2), padding="VALID", dtype=self.dtype)(b2)
        b3 = max_pool(x, (3, 3), (2, 2), padding="VALID")
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), dtype=self.dtype)(x)
        b2 = ConvBN(384, (1, 1), dtype=self.dtype)(x)
        b2 = jnp.concatenate(
            [ConvBN(384, (1, 3), dtype=self.dtype)(b2),
             ConvBN(384, (3, 1), dtype=self.dtype)(b2)], axis=-1)
        b3 = ConvBN(448, (1, 1), dtype=self.dtype)(x)
        b3 = ConvBN(384, (3, 3), dtype=self.dtype)(b3)
        b3 = jnp.concatenate(
            [ConvBN(384, (1, 3), dtype=self.dtype)(b3),
             ConvBN(384, (3, 1), dtype=self.dtype)(b3)], axis=-1)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = ConvBN(192, (1, 1), dtype=self.dtype)(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, (3, 3), (2, 2), padding="VALID", bn_eps=1e-3, dtype=self.dtype)(x)
        x = ConvBN(32, (3, 3), padding="VALID", bn_eps=1e-3, dtype=self.dtype)(x)
        x = ConvBN(64, (3, 3), bn_eps=1e-3, dtype=self.dtype)(x)
        x = max_pool(x, (3, 3), (2, 2), padding="VALID")
        x = ConvBN(80, (1, 1), padding="VALID", bn_eps=1e-3, dtype=self.dtype)(x)
        x = ConvBN(192, (3, 3), padding="VALID", bn_eps=1e-3, dtype=self.dtype)(x)
        x = max_pool(x, (3, 3), (2, 2), padding="VALID")
        x = InceptionA(32, dtype=self.dtype)(x)
        x = InceptionA(64, dtype=self.dtype)(x)
        x = InceptionA(64, dtype=self.dtype)(x)
        x = InceptionB(dtype=self.dtype)(x)
        x = InceptionC(128, dtype=self.dtype)(x)
        x = InceptionC(160, dtype=self.dtype)(x)
        x = InceptionC(160, dtype=self.dtype)(x)
        x = InceptionC(192, dtype=self.dtype)(x)
        x = InceptionD(dtype=self.dtype)(x)
        x = InceptionE(dtype=self.dtype)(x)
        x = InceptionE(dtype=self.dtype)(x)
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def inception_v3(num_classes: int = 1000, dtype=jnp.float32) -> InceptionV3:
    return InceptionV3(num_classes=num_classes, dtype=dtype)
