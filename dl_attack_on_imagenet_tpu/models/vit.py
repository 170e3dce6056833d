"""ViT-B/16 — Flax victim classifier (BASELINE.json config 5).

Not present in the reference repo (all six victims are CNNs, main.py:41-52);
included because the rebuild's benchmark contract scopes a ViT attack with an
enlarged dictionary. Pre-norm transformer encoder, learned position
embeddings, class token — matching torchvision's vit_b_16 structure.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PatchConv(nn.Module):
    """Patchify as reshape + one MXU matmul (parameters identical to the
    equivalent ``nn.Conv(features, (p,p), strides=(p,p))``).

    An attack differentiates wrt the IMAGE; the input-gradient of a
    stride-16 conv lowers to a scatter that XLA executes catastrophically
    (76 ms of a 118 ms device-busy ViT attack step on v5e — 64% of the
    step, BENCHMARKS.md round-2 trace). Patches don't overlap, so embedding
    is exactly a reshape/transpose + matmul whose gradient is another
    matmul plus layout ops: 118 -> 42 ms device busy (2.8x), leaving the
    attack step at ~97% of the chip's measured matmul ceiling.
    """

    features: int
    patch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        p = self.patch
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p, p, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.reshape(n, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, (h // p) * (w // p), p * p * c)
        w_mat = kernel.astype(self.dtype).reshape(p * p * c, self.features)
        return x.astype(self.dtype) @ w_mat + bias.astype(self.dtype)


class MlpBlock(nn.Module):
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype)(x)
        # torchvision's MLPBlock uses nn.GELU() = exact erf GELU; flax's
        # default is the tanh approximation, which breaks checkpoint
        # parity at ~1e-3 in the logits (tests/test_torch_forward_parity_
        # vit.py). Both are fused elementwise ops on TPU — no step cost.
        x = nn.gelu(x, approximate=False)
        return nn.Dense(d, dtype=self.dtype)(x)


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        return x + MlpBlock(self.mlp_dim, dtype=self.dtype)(y)


class ViT(nn.Module):
    patch_size: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        # Patchify via reshape+matmul (see PatchConv); name stays "Conv_0"
        # so variable structure and the torch converter are unchanged.
        x = PatchConv(
            self.hidden_dim, self.patch_size, dtype=self.dtype, name="Conv_0"
        )(x)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.hidden_dim)
        ).astype(x.dtype)
        x = jnp.concatenate([jnp.tile(cls, (n, 1, 1)), x], axis=1)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, x.shape[1], self.hidden_dim),
        ).astype(x.dtype)
        x = x + pos
        for _ in range(self.num_layers):
            x = EncoderBlock(self.num_heads, self.mlp_dim, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x[:, 0])


def vit_b16(num_classes: int = 1000, dtype=jnp.float32) -> ViT:
    return ViT(num_classes=num_classes, dtype=dtype)


def vit_tiny(num_classes: int = 1000, dtype=jnp.float32) -> ViT:
    """Small ViT for CPU tests."""
    return ViT(
        patch_size=16,
        hidden_dim=64,
        num_layers=2,
        num_heads=4,
        mlp_dim=128,
        num_classes=num_classes,
        dtype=dtype,
    )
