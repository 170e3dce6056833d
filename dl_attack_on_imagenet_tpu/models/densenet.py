"""DenseNet family (121/169/201) — Flax/NHWC victim classifiers.

Parity target: torchvision densenet121 (reference victim, main.py:43-44;
the demo's default training victim, demo_dL_attack.py usage).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import global_avg_pool, max_pool, relu
from .resnet import S2DStem


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
        y = relu(y)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(y)
        y = relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
        x = relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    block_config: Sequence[int]
    growth_rate: int = 32
    num_init_features: int = 64
    num_classes: int = 1000
    dtype: Any = jnp.float32
    # DenseNet's stem is the same 7x7/s2 conv+BN+relu+maxpool as ResNet's,
    # and its input-gradient is likewise the single most expensive op of
    # the attack step (3.32 ms of a 25.9 ms step on v5e, profiler-measured)
    # — the S2DStem applies unchanged (resnet.py:18; exactness via the same
    # relu/max_pool commute, tests/test_s2d_stem.py).
    stem_s2d: bool = False
    # Accept pre-blocked (N,H/2,W/2,12) input (see S2DStem.blocked_input).
    blocked_input: bool = False

    @nn.compact
    def __call__(self, x):
        if self.blocked_input:
            x = S2DStem(self.num_init_features, dtype=self.dtype,
                        relu=False, blocked_input=True)(x)
            x = max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
            x = relu(x)
        elif self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = S2DStem(self.num_init_features, dtype=self.dtype,
                        relu=False)(x)
            x = max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
            x = relu(x)
        else:
            x = nn.Conv(self.num_init_features, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)),  # torch conv0 pad=3
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
            x = relu(x)
            # torch MaxPool2d(3, 2, padding=1): symmetric, not XLA "SAME".
            x = max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            for _ in range(num_layers):
                x = DenseLayer(self.growth_rate, dtype=self.dtype)(x)
                features += self.growth_rate
            if i != len(self.block_config) - 1:
                features = features // 2
                x = Transition(features, dtype=self.dtype)(x)

        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)
        x = relu(x)
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def densenet121(num_classes: int = 1000, dtype=jnp.float32,
                stem_s2d: bool = False,
                blocked_input: bool = False) -> DenseNet:
    return DenseNet([6, 12, 24, 16], num_classes=num_classes, dtype=dtype,
                    stem_s2d=stem_s2d, blocked_input=blocked_input)


def densenet169(num_classes: int = 1000, dtype=jnp.float32,
                stem_s2d: bool = False,
                blocked_input: bool = False) -> DenseNet:
    return DenseNet([6, 12, 32, 32], num_classes=num_classes, dtype=dtype,
                    stem_s2d=stem_s2d, blocked_input=blocked_input)
