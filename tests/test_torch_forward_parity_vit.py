"""Real-torch forward parity for the ViT-B/16 victim.

The six reference victims are CNNs (main.py:41-52); ViT-B/16 is the
rebuild's benchmark-contract extra (BASELINE.json config 5) and the only
zoo member whose converter (`convert_vit_state_dict`) was previously proven
only by flax->torch-dict->flax round-trip. Here torchvision's
VisionTransformer (models/vision_transformer.py semantics: conv_proj
patchify, class token first, learned pos embeddings, pre-norm blocks with
fused-qkv nn.MultiheadAttention, LayerNorm eps=1e-6, exact-erf GELU MLP,
heads.head classifier) is hand-written as a faithful ``torch.nn`` module,
its ``state_dict()`` run through ``convert_vit_state_dict``, and the Flax
ViT must reproduce the logits — covering the qkv de-fusing, the per-head
reshape order, and the PatchConv reshape+matmul equivalence in one check.
"""

from collections import OrderedDict

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.models.convert import convert_vit_state_dict

torch.manual_seed(0)


class TorchEncoderBlock(tnn.Module):
    """torchvision EncoderBlock: pre-norm attention + pre-norm MLP."""

    def __init__(self, d, heads, mlp_dim):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(d, eps=1e-6)
        self.self_attention = tnn.MultiheadAttention(d, heads, batch_first=True)
        self.dropout = tnn.Dropout(0.0)
        self.ln_2 = tnn.LayerNorm(d, eps=1e-6)
        # torchvision MLPBlock: Linear, GELU(exact), Dropout, Linear, Dropout
        # -> state-dict keys mlp.0 / mlp.3.
        self.mlp = tnn.Sequential(
            tnn.Linear(d, mlp_dim),
            tnn.GELU(),
            tnn.Dropout(0.0),
            tnn.Linear(mlp_dim, d),
            tnn.Dropout(0.0),
        )

    def forward(self, x):
        y = self.ln_1(x)
        y, _ = self.self_attention(y, y, y, need_weights=False)
        x = x + self.dropout(y)
        return x + self.mlp(self.ln_2(x))


class TorchViT(tnn.Module):
    """torchvision VisionTransformer with faithful state-dict naming."""

    def __init__(self, image_size=224, patch=16, d=768, n_layers=12,
                 heads=12, mlp_dim=3072, num_classes=1000):
        super().__init__()
        seq = (image_size // patch) ** 2 + 1
        self.patch = patch
        self.conv_proj = tnn.Conv2d(3, d, kernel_size=patch, stride=patch)
        self.class_token = tnn.Parameter(torch.zeros(1, 1, d))

        class Encoder(tnn.Module):
            def __init__(self):
                super().__init__()
                self.pos_embedding = tnn.Parameter(
                    torch.empty(1, seq, d).normal_(std=0.02)
                )
                self.dropout = tnn.Dropout(0.0)
                self.layers = tnn.Sequential(OrderedDict(
                    (f"encoder_layer_{i}", TorchEncoderBlock(d, heads, mlp_dim))
                    for i in range(n_layers)
                ))
                self.ln = tnn.LayerNorm(d, eps=1e-6)

            def forward(self, x):
                return self.ln(self.layers(self.dropout(x + self.pos_embedding)))

        self.encoder = Encoder()
        self.heads = tnn.Sequential(OrderedDict(head=tnn.Linear(d, num_classes)))

    def forward(self, x):
        n = x.shape[0]
        x = self.conv_proj(x)  # (n, d, h/p, w/p)
        x = x.reshape(n, x.shape[1], -1).permute(0, 2, 1)  # (n, seq-1, d)
        x = torch.cat([self.class_token.expand(n, -1, -1), x], dim=1)
        return self.heads(self.encoder(x)[:, 0])


def _randomize(model: tnn.Module, seed: int = 3) -> None:
    # Non-trivial class token / biases so a dropped term cannot hide.
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.empty_like(p).normal_(0.0, 0.02, generator=g))


def _compare(torch_model, flax_name, num_heads, size, atol):
    torch_model.eval()
    x_nchw = np.random.default_rng(0).uniform(
        0, 1, (2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x_nchw)).numpy()
    num_classes = torch_model.heads.head.out_features
    victim = create_model(flax_name, normalize=False, num_classes=num_classes)
    variables = convert_vit_state_dict(
        torch_model.state_dict(), victim.variables, num_heads=num_heads
    )
    got = np.asarray(
        victim.apply_fn(variables, jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))))
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=atol)


def test_vit_tiny_logits_match_real_torch():
    # Same structure at CPU-friendly dims: exercises every mapping rule
    # (qkv split, head reshape, pos/cls, mlp indices) in seconds.
    m = TorchViT(image_size=224, patch=16, d=64, n_layers=2, heads=4,
                 mlp_dim=128, num_classes=10)
    _randomize(m)
    _compare(m, "vit_tiny", num_heads=4, size=224, atol=1e-5)


def test_vit_b16_logits_match_real_torch():
    # Full ViT-B/16 (one forward on CPU): proves the production config,
    # incl. the 12-head reshape at hidden 768 and seq 197.
    m = TorchViT()
    _randomize(m)
    _compare(m, "vit_b16", num_heads=12, size=224, atol=3e-4)
