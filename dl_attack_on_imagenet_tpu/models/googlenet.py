"""GoogLeNet (Inception v1) — Flax/NHWC victim classifier.

Parity target: torchvision googlenet (reference victim, main.py:45-46).
Aux classifiers are omitted — victims only ever run frozen in eval mode
(adil.py:68), where torchvision disables them too.

torchvision fidelity notes (proven against a real torch.nn forward in
tests/test_torch_forward_parity.py):
- every conv+BN is torchvision's ``BasicConv2d`` whose BatchNorm uses
  ``eps=0.001`` (not the nn.BatchNorm2d default 1e-5);
- ``pretrained=True`` sets ``transform_input=True`` — an extra per-channel
  affine at the top of the forward (see layers.torch_transform_input);
- the "5x5" branch actually uses a 3x3 kernel (a known torchvision quirk;
  pretrained weights are shaped for 3x3);
- maxpools are ``ceil_mode=True``, which for these shapes equals XLA SAME
  padding with -inf fill (right/bottom pad only at 112/56/28 inputs).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN, global_avg_pool, max_pool, torch_transform_input, relu
from .resnet import S2DStem

_BN_EPS = 1e-3  # torchvision BasicConv2d: BatchNorm2d(out_channels, eps=0.001)


class InceptionBlock(nn.Module):
    c1: int
    c3r: int
    c3: int
    c5r: int
    c5: int
    pool_proj: int
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        cbn = lambda *a, **k: ConvBN(*a, bn_eps=_BN_EPS, dtype=self.dtype,
                                     fold_bn=self.fold_bn, **k)
        b1 = cbn(self.c1, (1, 1))(x)
        b2 = cbn(self.c3r, (1, 1))(x)
        b2 = cbn(self.c3, (3, 3))(b2)
        b3 = cbn(self.c5r, (1, 1))(x)
        # torchvision's googlenet actually uses a 3x3 here (a known quirk of
        # its port); we keep 3x3 for weight-compatibility.
        b3 = cbn(self.c5, (3, 3))(b3)
        b4 = max_pool(x, (3, 3), (1, 1), padding="SAME")
        b4 = cbn(self.pool_proj, (1, 1))(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class GoogLeNet(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32
    # torchvision pretrained=True default — the reference's operating point.
    transform_input: bool = True
    # Frozen eval-mode BNs folded into conv kernels (exact; models/fold.py).
    fold_bn: bool = False
    # Same 7x7/s2 stem geometry as ResNet — the S2DStem halves the attack's
    # most expensive op (the stem input-gradient; resnet.py:18). Exact via
    # the relu/max_pool commute (tests/test_s2d_stem.py).
    stem_s2d: bool = False
    # Accept pre-blocked (N,H/2,W/2,12) input (see S2DStem.blocked_input);
    # transform_input tiles its 3-channel affine to the blocked order.
    blocked_input: bool = False

    @nn.compact
    def __call__(self, x):
        cbn = lambda *a, **k: ConvBN(*a, bn_eps=_BN_EPS, dtype=self.dtype,
                                     fold_bn=self.fold_bn, **k)
        blk = lambda *a: InceptionBlock(*a, dtype=self.dtype,
                                        fold_bn=self.fold_bn)
        if self.transform_input:
            x = torch_transform_input(x)
        if self.blocked_input:
            x = S2DStem(64, dtype=self.dtype, fold_bn=self.fold_bn,
                        relu=False, bn_eps=_BN_EPS, blocked_input=True)(x)
            x = max_pool(x, (3, 3), (2, 2))
            x = relu(x)
        elif self.stem_s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            x = S2DStem(64, dtype=self.dtype, fold_bn=self.fold_bn,
                        relu=False, bn_eps=_BN_EPS)(x)
            x = max_pool(x, (3, 3), (2, 2))
            x = relu(x)
        else:
            x = cbn(64, (7, 7), (2, 2))(x)
            x = max_pool(x, (3, 3), (2, 2))
        x = cbn(64, (1, 1))(x)
        x = cbn(192, (3, 3))(x)
        x = max_pool(x, (3, 3), (2, 2))

        x = blk(64, 96, 128, 16, 32, 32)(x)      # 3a
        x = blk(128, 128, 192, 32, 96, 64)(x)    # 3b
        x = max_pool(x, (3, 3), (2, 2))
        x = blk(192, 96, 208, 16, 48, 64)(x)     # 4a
        x = blk(160, 112, 224, 24, 64, 64)(x)    # 4b
        x = blk(128, 128, 256, 24, 64, 64)(x)    # 4c
        x = blk(112, 144, 288, 32, 64, 64)(x)    # 4d
        x = blk(256, 160, 320, 32, 128, 128)(x)  # 4e
        x = max_pool(x, (2, 2), (2, 2))
        x = blk(256, 160, 320, 32, 128, 128)(x)  # 5a
        x = blk(384, 192, 384, 48, 128, 128)(x)  # 5b

        x = global_avg_pool(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def googlenet(num_classes: int = 1000, dtype=jnp.float32,
              transform_input: bool = True,
              fold_bn: bool = False, stem_s2d: bool = False,
              blocked_input: bool = False) -> GoogLeNet:
    return GoogLeNet(num_classes=num_classes, dtype=dtype,
                     transform_input=transform_input, fold_bn=fold_bn,
                     stem_s2d=stem_s2d, blocked_input=blocked_input)
