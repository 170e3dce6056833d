"""MobileNetV2 — Flax/NHWC victim classifier.

Parity target: torchvision mobilenet_v2 (reference victim, main.py:49-50,
the single-image demo's default model).
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, global_avg_pool


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    features: int
    strides: tuple
    expand_ratio: int
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        cbn = functools.partial(ConvBN, dtype=self.dtype, fold_bn=self.fold_bn)
        in_features = x.shape[-1]
        hidden = in_features * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = cbn(hidden, (1, 1))(y)
            y = jnp.minimum(y, 6.0)  # ReLU6 (ConvBN applies relu; cap at 6)
        # depthwise
        y = cbn(hidden, (3, 3), self.strides, groups=hidden)(y)
        y = jnp.minimum(y, 6.0)
        # linear projection
        y = cbn(self.features, (1, 1), relu=False)(y)
        if self.strides == (1, 1) and in_features == self.features:
            return x + y
        return y


# (expand_ratio, channels, num_blocks, stride)
_V2_CFG = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    dtype: Any = jnp.float32
    # Frozen eval-mode BNs folded into conv kernels (exact; models/fold.py).
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        c = _make_divisible(32 * self.width_mult)
        x = ConvBN(c, (3, 3), (2, 2), dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = jnp.minimum(x, 6.0)
        for t, ch, n, s in _V2_CFG:
            out_c = _make_divisible(ch * self.width_mult)
            for i in range(n):
                strides = (s, s) if i == 0 else (1, 1)
                x = InvertedResidual(out_c, strides, t, dtype=self.dtype,
                                     fold_bn=self.fold_bn)(x)
        last = _make_divisible(1280 * max(1.0, self.width_mult))
        x = ConvBN(last, (1, 1), dtype=self.dtype, fold_bn=self.fold_bn)(x)
        x = jnp.minimum(x, 6.0)
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def mobilenet_v2(num_classes: int = 1000, dtype=jnp.float32,
                 fold_bn: bool = False) -> MobileNetV2:
    return MobileNetV2(num_classes=num_classes, dtype=dtype, fold_bn=fold_bn)
