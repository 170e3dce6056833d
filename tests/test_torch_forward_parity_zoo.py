"""Real-torch forward parity for the remaining four reference victims.

Completes the 6/6 converter proof (VERDICT round 2, "Next round" #2):
densenet121, googlenet (incl. its 3x3-"5x5" quirk + transform_input),
inception_v3 (at torchvision's native 299 AND the reference's blanket 224
crop, DS_ImageNet.py:14-18), and mobilenet_v2 are hand-written here as
torchvision-faithful ``torch.nn`` modules (same layer registration order,
padding, pooling, BN eps, activation semantics as torchvision
models/densenet.py, googlenet.py, inception.py, mobilenetv2.py), their
``state_dict()`` run through ``convert_torch_state_dict``, and the Flax zoo
must reproduce the logits. BN running stats are randomized so a mean/var or
scale/bias swap cannot hide. ResNet-18/VGG-11 live in
tests/test_torch_forward_parity.py.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.models.convert import convert_torch_state_dict

torch.manual_seed(0)


def _randomize_bn_stats(model: tnn.Module, seed: int = 1) -> None:
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)


def _compare(torch_model, flax_name, x_nchw, atol, rtol=1e-4, **model_kwargs):
    torch_model.eval()
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x_nchw)).numpy()
    victim = create_model(flax_name, normalize=False, **model_kwargs)
    variables = convert_torch_state_dict(torch_model.state_dict(), victim.variables)
    x_nhwc = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    got = np.asarray(victim.apply_fn(variables, x_nhwc))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=atol)


def _transform_input(x):
    # torchvision GoogLeNet/Inception3._transform_input (pretrained=True).
    x_ch0 = torch.unsqueeze(x[:, 0], 1) * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
    x_ch1 = torch.unsqueeze(x[:, 1], 1) * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
    x_ch2 = torch.unsqueeze(x[:, 2], 1) * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
    return torch.cat((x_ch0, x_ch1, x_ch2), 1)


class BasicConv2d(tnn.Module):
    """torchvision googlenet/inception conv+BN: eps=0.001, no bias."""

    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


# ---------------------------------------------------------------------------
# DenseNet-121 (torchvision/models/densenet.py semantics)
# ---------------------------------------------------------------------------


class TorchDenseLayer(tnn.Module):
    def __init__(self, in_ch, growth, bn_size=4):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(in_ch)
        self.conv1 = tnn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x), inplace=True))
        y = self.conv2(F.relu(self.norm2(y), inplace=True))
        return torch.cat([x, y], 1)


class TorchTransition(tnn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm = tnn.BatchNorm2d(in_ch)
        self.conv = tnn.Conv2d(in_ch, out_ch, 1, bias=False)

    def forward(self, x):
        x = self.conv(F.relu(self.norm(x), inplace=True))
        return F.avg_pool2d(x, 2, 2)


class TorchDenseNet121(tnn.Module):
    def __init__(self, num_classes=1000, growth=32, init_feats=64,
                 block_config=(6, 12, 24, 16)):
        super().__init__()
        self.conv0 = tnn.Conv2d(3, init_feats, 7, 2, 3, bias=False)
        self.norm0 = tnn.BatchNorm2d(init_feats)
        blocks = []
        feats = init_feats
        for i, n in enumerate(block_config):
            for _ in range(n):
                blocks.append(TorchDenseLayer(feats, growth))
                feats += growth
            if i != len(block_config) - 1:
                blocks.append(TorchTransition(feats, feats // 2))
                feats //= 2
        self.blocks = tnn.Sequential(*blocks)
        self.norm5 = tnn.BatchNorm2d(feats)
        self.classifier = tnn.Linear(feats, num_classes)

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.norm0(self.conv0(x)), inplace=True), 3, 2, 1)
        x = F.relu(self.norm5(self.blocks(x)), inplace=True)
        x = F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
        return self.classifier(x)


# ---------------------------------------------------------------------------
# GoogLeNet (torchvision/models/googlenet.py semantics, no aux heads)
# ---------------------------------------------------------------------------


class TorchGInception(tnn.Module):
    def __init__(self, in_ch, c1, c3r, c3, c5r, c5, pp):
        super().__init__()
        self.branch1 = BasicConv2d(in_ch, c1, kernel_size=1)
        self.branch2 = tnn.Sequential(
            BasicConv2d(in_ch, c3r, kernel_size=1),
            BasicConv2d(c3r, c3, kernel_size=3, padding=1),
        )
        # torchvision quirk: the "5x5" branch is actually a 3x3.
        self.branch3 = tnn.Sequential(
            BasicConv2d(in_ch, c5r, kernel_size=1),
            BasicConv2d(c5r, c5, kernel_size=3, padding=1),
        )
        self.branch4 = tnn.Sequential(
            tnn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
            BasicConv2d(in_ch, pp, kernel_size=1),
        )

    def forward(self, x):
        return torch.cat(
            [self.branch1(x), self.branch2(x), self.branch3(x), self.branch4(x)], 1
        )


class TorchGoogLeNet(tnn.Module):
    def __init__(self, num_classes=1000, transform_input=True):
        super().__init__()
        self.transform_input = transform_input
        self.conv1 = BasicConv2d(3, 64, kernel_size=7, stride=2, padding=3)
        self.maxpool1 = tnn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.conv2 = BasicConv2d(64, 64, kernel_size=1)
        self.conv3 = BasicConv2d(64, 192, kernel_size=3, padding=1)
        self.maxpool2 = tnn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.inception3a = TorchGInception(192, 64, 96, 128, 16, 32, 32)
        self.inception3b = TorchGInception(256, 128, 128, 192, 32, 96, 64)
        self.maxpool3 = tnn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.inception4a = TorchGInception(480, 192, 96, 208, 16, 48, 64)
        self.inception4b = TorchGInception(512, 160, 112, 224, 24, 64, 64)
        self.inception4c = TorchGInception(512, 128, 128, 256, 24, 64, 64)
        self.inception4d = TorchGInception(512, 112, 144, 288, 32, 64, 64)
        self.inception4e = TorchGInception(528, 256, 160, 320, 32, 128, 128)
        self.maxpool4 = tnn.MaxPool2d(2, stride=2, ceil_mode=True)
        self.inception5a = TorchGInception(832, 256, 160, 320, 32, 128, 128)
        self.inception5b = TorchGInception(832, 384, 192, 384, 48, 128, 128)
        self.fc = tnn.Linear(1024, num_classes)

    def forward(self, x):
        if self.transform_input:
            x = _transform_input(x)
        x = self.maxpool1(self.conv1(x))
        x = self.maxpool2(self.conv3(self.conv2(x)))
        x = self.maxpool3(self.inception3b(self.inception3a(x)))
        x = self.inception4e(
            self.inception4d(self.inception4c(self.inception4b(self.inception4a(x))))
        )
        x = self.maxpool4(x)
        x = self.inception5b(self.inception5a(x))
        x = F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
        return self.fc(x)


# ---------------------------------------------------------------------------
# Inception v3 (torchvision/models/inception.py semantics, no aux head)
# ---------------------------------------------------------------------------


class TorchInceptionA(tnn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b2 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b2, b3, bp], 1)


class TorchInceptionB(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = BasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b1 = self.branch3x3(x)
        b2 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b1, b2, bp], 1)


class TorchInceptionC(tnn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b2 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        b3 = self.branch7x7dbl_5(
            self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
            )
        )
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b2, b3, bp], 1)


class TorchInceptionD(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b1 = self.branch3x3_2(self.branch3x3_1(x))
        b2 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b1, b2, bp], 1)


class TorchInceptionE(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b2 = self.branch3x3_1(x)
        b2 = torch.cat([self.branch3x3_2a(b2), self.branch3x3_2b(b2)], 1)
        b3 = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        b3 = torch.cat([self.branch3x3dbl_3a(b3), self.branch3x3dbl_3b(b3)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b2, b3, bp], 1)


class TorchInceptionV3(tnn.Module):
    def __init__(self, num_classes=1000, transform_input=True):
        super().__init__()
        self.transform_input = transform_input
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TorchInceptionA(192, 32)
        self.Mixed_5c = TorchInceptionA(256, 64)
        self.Mixed_5d = TorchInceptionA(288, 64)
        self.Mixed_6a = TorchInceptionB(288)
        self.Mixed_6b = TorchInceptionC(768, 128)
        self.Mixed_6c = TorchInceptionC(768, 160)
        self.Mixed_6d = TorchInceptionC(768, 160)
        self.Mixed_6e = TorchInceptionC(768, 192)
        self.Mixed_7a = TorchInceptionD(768)
        self.Mixed_7b = TorchInceptionE(1280)
        self.Mixed_7c = TorchInceptionE(2048)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        if self.transform_input:
            x = _transform_input(x)
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
        x = self.Mixed_6a(x)
        x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(x))))
        x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
        x = F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
        return self.fc(x)


# ---------------------------------------------------------------------------
# MobileNetV2 (torchvision/models/mobilenetv2.py semantics)
# ---------------------------------------------------------------------------


def _conv_bn_relu6(in_ch, out_ch, kernel=3, stride=1, groups=1):
    return tnn.Sequential(
        tnn.Conv2d(in_ch, out_ch, kernel, stride, (kernel - 1) // 2,
                   groups=groups, bias=False),
        tnn.BatchNorm2d(out_ch),
        tnn.ReLU6(inplace=True),
    )


class TorchInvertedResidual(tnn.Module):
    def __init__(self, in_ch, out_ch, stride, expand):
        super().__init__()
        hidden = in_ch * expand
        self.use_res = stride == 1 and in_ch == out_ch
        layers = []
        if expand != 1:
            layers.append(_conv_bn_relu6(in_ch, hidden, kernel=1))
        layers += [
            _conv_bn_relu6(hidden, hidden, stride=stride, groups=hidden),
            tnn.Conv2d(hidden, out_ch, 1, bias=False),
            tnn.BatchNorm2d(out_ch),
        ]
        self.conv = tnn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class TorchMobileNetV2(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        features = [_conv_bn_relu6(3, 32, stride=2)]
        in_ch = 32
        for t, c, n, s in cfg:
            for i in range(n):
                features.append(
                    TorchInvertedResidual(in_ch, c, s if i == 0 else 1, t)
                )
                in_ch = c
        features.append(_conv_bn_relu6(in_ch, 1280, kernel=1))
        self.features = tnn.Sequential(*features)
        self.classifier = tnn.Linear(1280, num_classes)

    def forward(self, x):
        x = self.features(x)
        x = x.mean([2, 3])
        return self.classifier(x)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def x224():
    rng = np.random.default_rng(11)
    return rng.uniform(0.0, 1.0, (2, 3, 224, 224)).astype(np.float32)


def test_densenet121_logits_match_real_torch(x224):
    model = TorchDenseNet121()
    _randomize_bn_stats(model, seed=4)
    _compare(model, "densenet121", x224[:1], atol=5e-4)


def test_googlenet_logits_match_real_torch(x224):
    model = TorchGoogLeNet()
    _randomize_bn_stats(model, seed=5)
    _compare(model, "googlenet", x224[:1], atol=5e-4)


def test_googlenet_transform_input_matters(x224):
    # Guard that the transform_input affine is real (not a no-op): the same
    # weights with transform_input off must give different logits.
    model = TorchGoogLeNet(transform_input=False)
    _randomize_bn_stats(model, seed=5)
    _compare(model, "googlenet", x224[:1], atol=5e-4, transform_input=False)
    model_on = TorchGoogLeNet(transform_input=True)
    model_on.load_state_dict(model.state_dict())
    model_on.eval(), model.eval()
    with torch.no_grad():
        a = model(torch.from_numpy(x224[:1])).numpy()
        b = model_on(torch.from_numpy(x224[:1])).numpy()
    assert not np.allclose(a, b)


def test_inception_v3_logits_match_real_torch_299():
    rng = np.random.default_rng(12)
    x = rng.uniform(0.0, 1.0, (1, 3, 299, 299)).astype(np.float32)
    model = TorchInceptionV3()
    _randomize_bn_stats(model, seed=6)
    _compare(model, "inception_v3", x, atol=5e-4, input_size=299)


def test_inception_v3_logits_match_real_torch_blanket_224(x224):
    # The reference feeds inception the SAME blanket 224 crop as every other
    # victim (DS_ImageNet.py:14-18 + main.py:47-48) — pin that operating
    # point explicitly, not just the native 299.
    model = TorchInceptionV3()
    _randomize_bn_stats(model, seed=7)
    _compare(model, "inception_v3", x224[:1], atol=5e-4, input_size=224)


def test_mobilenet_v2_logits_match_real_torch(x224):
    model = TorchMobileNetV2()
    _randomize_bn_stats(model, seed=8)
    _compare(model, "mobilenet_v2", x224[:1], atol=5e-4)
