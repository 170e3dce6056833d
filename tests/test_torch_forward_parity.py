"""Numeric parity of the converter against REAL torch.nn forwards.

The reference's victims are torchvision ``pretrained=True`` modules
(main.py:41-52). torchvision itself is absent here, so these tests
hand-write torchvision-faithful ``torch.nn`` ResNet-18 and VGG-11 (same
layer order, padding, pooling, flatten semantics as
torchvision/models/resnet.py and vgg.py), export their ``state_dict()``,
run ``convert_torch_state_dict``, and assert the Flax zoo produces the
same logits. This is the check that a silent conv/BN/flatten mapping bug
cannot survive (VERDICT round 1, "Next round" #4): BN running stats are
randomized so mean/var mix-ups cannot hide, and inputs are random.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.models.convert import convert_torch_state_dict

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torchvision-faithful ResNet-18 (torchvision/models/resnet.py semantics)
# ---------------------------------------------------------------------------


class TorchBasicBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out_ch)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_ch)
        if stride != 1 or in_ch != out_ch:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                tnn.BatchNorm2d(out_ch),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet18(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [64, 64, 128, 256, 512]
        layers = []
        for i in range(4):
            stride = 1 if i == 0 else 2
            layers.append(
                tnn.Sequential(
                    TorchBasicBlock(chans[i], chans[i + 1], stride),
                    TorchBasicBlock(chans[i + 1], chans[i + 1], 1),
                )
            )
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


# ---------------------------------------------------------------------------
# torchvision-faithful VGG-11 (torchvision/models/vgg.py cfg "A")
# ---------------------------------------------------------------------------


class TorchVGG11(tnn.Module):
    def __init__(self, num_classes=1000, hidden=4096):
        super().__init__()
        cfg = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")
        layers, in_ch = [], 3
        for item in cfg:
            if item == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(in_ch, item, 3, padding=1), tnn.ReLU(True)]
                in_ch = item
        self.features = tnn.Sequential(*layers)
        self.avgpool = tnn.AdaptiveAvgPool2d((7, 7))
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 7 * 7, hidden),
            tnn.ReLU(True),
            tnn.Dropout(),
            tnn.Linear(hidden, hidden),
            tnn.ReLU(True),
            tnn.Dropout(),
            tnn.Linear(hidden, num_classes),
        )

    def forward(self, x):
        x = self.avgpool(self.features(x)).flatten(1)
        return self.classifier(x)


def _randomize_bn_stats(model: tnn.Module, seed: int = 1) -> None:
    """Random running stats/affine so a mean/var or scale/bias swap in the
    converter cannot hide behind the trivial init (mean=0, var=1)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)


def _compare(torch_model, flax_name, x_nchw, atol, **model_kwargs):
    torch_model.eval()
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x_nchw)).numpy()

    victim = create_model(flax_name, normalize=False, **model_kwargs)
    variables = convert_torch_state_dict(torch_model.state_dict(), victim.variables)
    x_nhwc = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    got = np.asarray(victim.apply_fn(variables, x_nhwc))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=atol)


@pytest.fixture(scope="module")
def x224():
    rng = np.random.default_rng(7)
    return rng.uniform(0.0, 1.0, (2, 3, 224, 224)).astype(np.float32)


def test_resnet18_logits_match_real_torch(x224):
    model = TorchResNet18()
    _randomize_bn_stats(model)
    _compare(model, "resnet18", x224, atol=1e-4)


def test_resnet18_s2d_stem_matches_real_torch(x224):
    # The space-to-depth stem must be numerically the torch conv1 (pad=3),
    # not just "a" 7x7/s2 conv — pretrained weights flow through it.
    model = TorchResNet18()
    _randomize_bn_stats(model, seed=2)
    _compare(model, "resnet18", x224, atol=2e-4, stem_s2d=True)


def test_vgg11_logits_match_real_torch(x224):
    model = TorchVGG11()
    _compare(model, "vgg11", x224[:1], atol=1e-4)


def test_vgg11_flatten_order_is_channel_major():
    # Distinguishing input: a feature map whose (h, w, c) and (c, h, w)
    # flattens differ. With per-channel-constant activations the two
    # orders coincide; random weights + random input rule that out, but
    # assert the property explicitly on the first classifier layer.
    model = TorchVGG11(num_classes=10, hidden=32)
    model.eval()
    x = np.random.default_rng(3).uniform(0, 1, (1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        feats = model.avgpool(model.features(torch.from_numpy(x))).numpy()
    victim = create_model("vgg11", normalize=False, num_classes=10, hidden=32)
    variables = convert_torch_state_dict(model.state_dict(), victim.variables)
    w = np.asarray(variables["params"]["Dense_0"]["kernel"])  # (25088, 32)
    b = np.asarray(variables["params"]["Dense_0"]["bias"])
    # Flax flattens NHWC activations channel-major (transpose(0,3,1,2));
    # the torch flatten of NCHW feats must hit the same kernel rows.
    manual = feats.reshape(1, -1) @ w + b
    with torch.no_grad():
        ref = model.classifier[0](torch.from_numpy(feats).flatten(1)).numpy()
    np.testing.assert_allclose(manual, ref, rtol=1e-5, atol=1e-5)


def test_resnet18_fold_bn_composes_with_converter(x224):
    # Full production path: real torch state_dict -> convert -> fold frozen
    # BN into conv weights -> logits still match the torch forward.
    from dl_attack_on_imagenet_tpu.models.fold import fold_victim

    model = TorchResNet18()
    _randomize_bn_stats(model, seed=3)
    model.eval()
    with torch.no_grad():
        ref = model(torch.from_numpy(x224)).numpy()
    victim = create_model("resnet18", normalize=False)
    import dataclasses

    victim = dataclasses.replace(
        victim,
        variables=convert_torch_state_dict(model.state_dict(), victim.variables),
    )
    folded = fold_victim(victim, normalize=False)
    assert "batch_stats" not in folded.variables
    got = np.asarray(
        folded.apply_fn(folded.variables, jnp.asarray(np.transpose(x224, (0, 2, 3, 1))))
    )
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
