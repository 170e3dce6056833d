"""Shared model-zoo building blocks (NHWC, MXU-friendly).

The in-graph normalization layer mirrors the reference's ``Normalize`` wrapper
(main.py:16-25): attacks operate in [0,1] pixel space and the ImageNet
mean/std shift lives inside the model graph so gradients flow through it.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class Normalize(nn.Module):
    """Channel normalization applied to NHWC [0,1] images.

    Reference: main.py:16-25 / demo_dL_attack.py:16-26.
    """

    mean: Sequence[float] = IMAGENET_MEAN
    std: Sequence[float] = IMAGENET_STD

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.mean, dtype=x.dtype).reshape(1, 1, 1, -1)
        std = jnp.asarray(self.std, dtype=x.dtype).reshape(1, 1, 1, -1)
        return (x - mean) / std


class ConvBN(nn.Module):
    """Conv2D + (frozen) BatchNorm + optional ReLU.

    Victim models are always frozen in eval mode (adil.py:68: ``model.eval()``)
    — BatchNorm therefore uses running statistics, which under ``linen`` is
    ``use_running_average=True`` with stats stored in the ``batch_stats``
    collection.
    """

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = "TORCH"
    relu: bool = True
    use_bias: bool = False
    dtype: Any = jnp.float32
    groups: int = 1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # "TORCH" = torchvision's symmetric k//2 padding. Identical to XLA
        # "SAME" for stride-1 odd kernels, but NOT for strided convs (SAME
        # pads asymmetrically, e.g. (2,3) for a 7x7/s2 at 224 where torch
        # pads (3,3)) — pretrained-weight parity requires torch semantics
        # (verified against real torch forwards in tests/test_torch_forward_parity.py).
        padding = self.padding
        if padding == "TORCH":
            padding = tuple((k // 2, k // 2) for k in self.kernel)
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=padding,
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=self.bn_eps, dtype=self.dtype
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool(x, window=(3, 3), strides=(2, 2), padding="SAME"):
    return nn.max_pool(x, window_shape=window, strides=strides, padding=padding)


def avg_pool(x, window=(3, 3), strides=(1, 1), padding="SAME"):
    return nn.avg_pool(x, window_shape=window, strides=strides, padding=padding)


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2))
