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


class MlpBlock(nn.Module):
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype)(x)
        x = nn.gelu(x)
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
        # Patchify via strided conv (one big MXU matmul per image).
        x = nn.Conv(
            self.hidden_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
        )(x)
        x = x.reshape(n, -1, self.hidden_dim)
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
