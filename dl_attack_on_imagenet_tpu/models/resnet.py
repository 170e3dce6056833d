"""ResNet family (18/34/50) — Flax/NHWC victim classifiers.

Architecture-parity targets torchvision's resnet18 (the reference's default
victim, main.py:41-42); layout and module structure are TPU-native NHWC.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvBN, global_avg_pool, max_pool, relu


class S2DStem(nn.Module):
    """Space-to-depth stem: the 7x7/s2 conv computed in a 2x2-blocked domain.

    Mathematically identical to ``Conv(64, (7,7), (2,2), pad=(3,3))`` —
    torchvision's conv1 padding — with the SAME parameter tensor
    (kernel shape (7,7,3,64)), but the convolution
    runs on a (112,112,12) input with a 4x4/s1 kernel — which matters for
    attacks: the gradient wrt the 3-channel 224x224 input of a 7x7/s2 conv
    is the single most expensive op of the ADiL train step (3.55 ms of a
    21.6 ms step on v5e, profiler-measured); the blocked form has 4x the
    input channels and a quarter the spatial size, so both the forward and
    the input-gradient map far better onto the MXU. (The MLPerf ResNet
    space-to-depth trick, applied to the attack's backward pass.)
    """

    features: int = 64
    dtype: Any = jnp.float32
    fold_bn: bool = False  # frozen BN absorbed into kernel+bias (see ConvBN)
    relu: bool = True  # deferred by ResNet: relu commutes with max_pool
    bn_eps: float = 1e-5  # GoogLeNet's BasicConv2d stem uses 1e-3
    # blocked_input: the caller feeds the (N,H/2,W/2,4C) blocked tensor
    # directly (layers.space_to_depth order) and the stem skips its own
    # block reshape. Lets an attack keep its perturbation state in the
    # stem's compute layout: the input-gradient then leaves the model
    # already in the D-matmul layout, with no transpose/copy chain
    # (BENCHMARKS.md round 2). Parameter tree is unchanged — variables are
    # interchangeable with the unblocked model.
    blocked_input: bool = False

    @nn.compact
    def __call__(self, x):
        if self.blocked_input:
            n, hb, wb, cb = x.shape
            c = cb // 4
            xb = x
        else:
            n, h, w, c = x.shape
            # Blocked input: channel index = (ki, kj, c).
            xb = x.reshape(n, h // 2, 2, w // 2, 2, c)
            xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, c, self.features)
        )
        # Blocked kernel for torch padding semantics (output o reads input
        # rows 2o + a - 3, a in 0..6, i.e. symmetric pad 3): tap a maps to
        # block tap q = (a-1)//2 + 1 and parity k = (a-1) % 2, so the
        # original row read is 2(o + q - pb) + k = 2o + a - 3 with block
        # pad pb = 2. Slot (0, parity 0) stays zero (7 taps -> 4x2 slots).
        kb = jnp.zeros((4, 2, 4, 2, c, self.features), self.dtype)
        kern = kernel.astype(self.dtype)
        for a_i in range(7):
            qi, ki = (a_i - 1) // 2 + 1, (a_i - 1) % 2
            for a_j in range(7):
                qj, kj = (a_j - 1) // 2 + 1, (a_j - 1) % 2
                kb = kb.at[qi, ki, qj, kj].set(kern[a_i, a_j])
        kb = kb.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        y = jax.lax.conv_general_dilated(
            xb.astype(self.dtype),
            kb,
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.fold_bn:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        else:
            y = nn.BatchNorm(use_running_average=True, epsilon=self.bn_eps,
                             dtype=self.dtype)(y)
        return relu(y) if self.relu else y


class BasicBlock(nn.Module):
    features: int
    strides: tuple = (1, 1)
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvBN(self.features, (3, 3), self.strides, dtype=self.dtype,
                   fold_bn=self.fold_bn)(x)
        y = ConvBN(self.features, (3, 3), relu=False, dtype=self.dtype,
                   fold_bn=self.fold_bn)(y)
        if residual.shape != y.shape:
            residual = ConvBN(
                self.features, (1, 1), self.strides, relu=False,
                dtype=self.dtype, fold_bn=self.fold_bn
            )(x)
        return relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: tuple = (1, 1)
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvBN(self.features, (1, 1), dtype=self.dtype,
                   fold_bn=self.fold_bn)(x)
        y = ConvBN(self.features, (3, 3), self.strides, dtype=self.dtype,
                   fold_bn=self.fold_bn)(y)
        y = ConvBN(self.features * 4, (1, 1), relu=False, dtype=self.dtype,
                   fold_bn=self.fold_bn)(y)
        if residual.shape != y.shape:
            residual = ConvBN(
                self.features * 4, (1, 1), self.strides, relu=False,
                dtype=self.dtype, fold_bn=self.fold_bn
            )(x)
        return relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block: Any
    num_classes: int = 1000
    dtype: Any = jnp.float32
    stem_s2d: bool = False
    fold_bn: bool = False
    # Accept pre-blocked (N,H/2,W/2,12) input (see S2DStem.blocked_input).
    blocked_input: bool = False

    @nn.compact
    def __call__(self, x):
        # The stem relu runs AFTER the max pool: relu and max_pool are both
        # monotone, so max_pool(relu(y)) == relu(max_pool(y)) exactly (the
        # pool's -inf padding is never selected either way, and the routed
        # gradient is identical: the window argmax is unchanged and any
        # gradient routed through a non-positive max is zeroed by the relu
        # mask in both orders — tests/test_s2d_stem.py). Computing the relu
        # at 56x56 instead of 112x112 removes a full 103 MB activation
        # save + backward mask pass from the attack step.
        if self.blocked_input:
            x = S2DStem(64, dtype=self.dtype, fold_bn=self.fold_bn,
                        relu=False, blocked_input=True)(x)
        elif self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = S2DStem(64, dtype=self.dtype, fold_bn=self.fold_bn,
                        relu=False)(x)
        else:
            x = ConvBN(64, (7, 7), (2, 2), dtype=self.dtype,
                       fold_bn=self.fold_bn, relu=False)(x)
        # torch MaxPool2d(3, 2, padding=1): symmetric, not XLA "SAME".
        x = max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        x = relu(x)
        for i, size in enumerate(self.stage_sizes):
            for j in range(size):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = self.block(64 * 2**i, strides, dtype=self.dtype,
                               fold_bn=self.fold_bn)(x)
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def resnet18(num_classes: int = 1000, dtype=jnp.float32, stem_s2d: bool = False,
             fold_bn: bool = False, blocked_input: bool = False) -> ResNet:
    return ResNet([2, 2, 2, 2], BasicBlock, num_classes, dtype, stem_s2d,
                  fold_bn, blocked_input)


def resnet34(num_classes: int = 1000, dtype=jnp.float32, stem_s2d: bool = False,
             fold_bn: bool = False, blocked_input: bool = False) -> ResNet:
    return ResNet([3, 4, 6, 3], BasicBlock, num_classes, dtype, stem_s2d,
                  fold_bn, blocked_input)


def resnet50(num_classes: int = 1000, dtype=jnp.float32, stem_s2d: bool = False,
             fold_bn: bool = False, blocked_input: bool = False) -> ResNet:
    return ResNet([3, 4, 6, 3], Bottleneck, num_classes, dtype, stem_s2d,
                  fold_bn, blocked_input)
