"""Inception v3 — Flax/NHWC victim classifier.

Parity target: torchvision inception_v3 (reference victim, main.py:47-48).
The reference feeds 224x224 crops despite Inception's native 299 (the repo
uses one blanket transform, DS_ImageNet.py:14-18); global average pooling
makes the head size-agnostic, so both input sizes work here.
Aux head omitted (eval-mode victims only, adil.py:68).

torchvision fidelity notes (proven against a real torch.nn forward in
tests/test_torch_forward_parity.py):
- EVERY conv+BN is torchvision's ``BasicConv2d``: BatchNorm eps=0.001
  (not just the stem — all Mixed_* blocks too);
- ``pretrained=True`` sets ``transform_input=True`` — an extra per-channel
  affine at the top of the forward (see layers.torch_transform_input).

``fold_bn=True`` folds the frozen eval-mode BNs into the conv kernels
(exact; models/fold.py) — the parameter tree loses its BatchNorm leaves.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, global_avg_pool, max_pool, torch_transform_input

# torchvision BasicConv2d: BatchNorm2d(out_channels, eps=0.001) — everywhere.
CBN = functools.partial(ConvBN, bn_eps=1e-3)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        cbn = functools.partial(CBN, dtype=self.dtype, fold_bn=self.fold_bn)
        b1 = cbn(64, (1, 1))(x)
        b2 = cbn(48, (1, 1))(x)
        b2 = cbn(64, (5, 5))(b2)
        b3 = cbn(64, (1, 1))(x)
        b3 = cbn(96, (3, 3))(b3)
        b3 = cbn(96, (3, 3))(b3)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = cbn(self.pool_features, (1, 1))(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        cbn = functools.partial(CBN, dtype=self.dtype, fold_bn=self.fold_bn)
        b1 = cbn(384, (3, 3), (2, 2), padding="VALID")(x)
        b2 = cbn(64, (1, 1))(x)
        b2 = cbn(96, (3, 3))(b2)
        b2 = cbn(96, (3, 3), (2, 2), padding="VALID")(b2)
        b3 = max_pool(x, (3, 3), (2, 2), padding="VALID")
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        cbn = functools.partial(CBN, dtype=self.dtype, fold_bn=self.fold_bn)
        c7 = self.c7
        b1 = cbn(192, (1, 1))(x)
        b2 = cbn(c7, (1, 1))(x)
        b2 = cbn(c7, (1, 7))(b2)
        b2 = cbn(192, (7, 1))(b2)
        b3 = cbn(c7, (1, 1))(x)
        b3 = cbn(c7, (7, 1))(b3)
        b3 = cbn(c7, (1, 7))(b3)
        b3 = cbn(c7, (7, 1))(b3)
        b3 = cbn(192, (1, 7))(b3)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = cbn(192, (1, 1))(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        cbn = functools.partial(CBN, dtype=self.dtype, fold_bn=self.fold_bn)
        b1 = cbn(192, (1, 1))(x)
        b1 = cbn(320, (3, 3), (2, 2), padding="VALID")(b1)
        b2 = cbn(192, (1, 1))(x)
        b2 = cbn(192, (1, 7))(b2)
        b2 = cbn(192, (7, 1))(b2)
        b2 = cbn(192, (3, 3), (2, 2), padding="VALID")(b2)
        b3 = max_pool(x, (3, 3), (2, 2), padding="VALID")
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        cbn = functools.partial(CBN, dtype=self.dtype, fold_bn=self.fold_bn)
        b1 = cbn(320, (1, 1))(x)
        b2 = cbn(384, (1, 1))(x)
        b2 = jnp.concatenate(
            [cbn(384, (1, 3))(b2), cbn(384, (3, 1))(b2)], axis=-1)
        b3 = cbn(448, (1, 1))(x)
        b3 = cbn(384, (3, 3))(b3)
        b3 = jnp.concatenate(
            [cbn(384, (1, 3))(b3), cbn(384, (3, 1))(b3)], axis=-1)
        b4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        b4 = cbn(192, (1, 1))(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32
    # torchvision pretrained=True default — the reference's operating point.
    transform_input: bool = True
    # Frozen eval-mode BNs folded into conv kernels (exact; models/fold.py).
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        cbn = functools.partial(CBN, dtype=self.dtype, fold_bn=self.fold_bn)
        if self.transform_input:
            x = torch_transform_input(x)
        x = cbn(32, (3, 3), (2, 2), padding="VALID")(x)
        x = cbn(32, (3, 3), padding="VALID")(x)
        x = cbn(64, (3, 3))(x)
        x = max_pool(x, (3, 3), (2, 2), padding="VALID")
        x = cbn(80, (1, 1), padding="VALID")(x)
        x = cbn(192, (3, 3), padding="VALID")(x)
        x = max_pool(x, (3, 3), (2, 2), padding="VALID")
        x = InceptionA(32, dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = InceptionA(64, dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = InceptionA(64, dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = InceptionB(dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = InceptionC(128, dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = InceptionC(160, dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = InceptionC(160, dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = InceptionC(192, dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = InceptionD(dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = InceptionE(dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = InceptionE(dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def inception_v3(num_classes: int = 1000, dtype=jnp.float32,
                 transform_input: bool = True,
                 fold_bn: bool = False) -> InceptionV3:
    return InceptionV3(num_classes=num_classes, dtype=dtype,
                       transform_input=transform_input, fold_bn=fold_bn)
