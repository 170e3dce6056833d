"""Fold frozen BatchNorms into conv kernels (exact for eval-mode victims).

The reference's victims are ALWAYS frozen in eval mode (``model.eval()``,
adil.py:68), so each BatchNorm is a fixed per-channel affine
``y = (conv(x) - mean)/sqrt(var+eps) * scale + bias`` that can be absorbed
into the preceding conv: ``kernel' = kernel * s``, ``bias' = bias - mean*s``
with ``s = scale / sqrt(var + eps)``. Folding removes one full elementwise
pass over every activation tensor in both the forward and the attack's
backward — measured on the headline train step in BENCHMARKS.md.

Works on every ConvBN-based victim (conv -> BN -> relu order): the ResNet
family (ConvBN / S2DStem modules), GoogLeNet, Inception v3, MobileNetV2.
DenseNet is pre-activation (BN -> relu -> conv, densenet.py) — the relu
between the affine and the conv blocks absorption, so it has no folded
mode. Build the folded module with ``create_model(..., fold_bn=True)`` and
convert existing variables with :func:`fold_victim_bn`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_BN_EPS = 1e-5


def _fold_pair(kernel: np.ndarray, bn_params: Dict, bn_stats: Dict,
               eps: float, conv_bias=None) -> Dict[str, np.ndarray]:
    kernel = np.asarray(kernel)
    dtype = kernel.dtype  # keep the checkpoint's kernel dtype post-fold
    s = np.asarray(bn_params["scale"]) / np.sqrt(np.asarray(bn_stats["var"]) + eps)
    # y = BN(conv(x)+b) = conv(x)*s + (b - mean)*s + bn_bias
    pre = np.asarray(conv_bias) if conv_bias is not None else 0.0
    bias = (pre - np.asarray(bn_stats["mean"])) * s + np.asarray(bn_params["bias"])
    # s broadcasts over the output-channel axis.
    return {"kernel": (kernel * s).astype(dtype), "bias": bias}


def fold_victim_bn(variables: Dict, eps: float = _BN_EPS) -> Dict:
    """variables of an unfolded ResNet -> variables for fold_bn=True.

    Handles the two conv+BN shapes in the zoo: ConvBN modules
    (``{Conv_0: {kernel}, BatchNorm_0: {scale, bias}}``) and the S2D stem
    (``{kernel, BatchNorm_0: {...}}``); everything else copies through.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def rec(p, s):
        keys = set(p.keys())
        if keys == {"Conv_0", "BatchNorm_0"}:
            folded = _fold_pair(p["Conv_0"]["kernel"], p["BatchNorm_0"],
                                s["BatchNorm_0"], eps,
                                conv_bias=p["Conv_0"].get("bias"))
            return {"Conv_0": folded}
        if keys == {"kernel", "BatchNorm_0"}:
            return _fold_pair(p["kernel"], p["BatchNorm_0"], s["BatchNorm_0"], eps)
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = rec(v, s.get(k, {}) if isinstance(s, dict) else {})
            else:
                out[k] = np.asarray(v)
        return out

    return {"params": rec(params, stats)}


# BasicConv2d models use BatchNorm2d(eps=0.001), not the 1e-5 default
# (googlenet.py/inception.py fidelity notes).
_MODEL_BN_EPS = {"googlenet": 1e-3, "inception": 1e-3, "inception_v3": 1e-3}


def fold_victim(victim, normalize=None):
    """VictimModel (unfolded, ConvBN-based) -> VictimModel with folded BN.

    Returns a new victim whose module was rebuilt with ``fold_bn=True`` and
    whose variables were converted; logits match the original to fp
    tolerance (tests/test_fold_bn.py). Normalization (enabled/mean/std) and
    module config reachable through ``create_model`` (stem_s2d,
    transform_input) are inherited from the original victim; pass
    ``normalize`` explicitly only to override.
    """
    from . import create_model

    eps = _MODEL_BN_EPS.get(victim.name, _BN_EPS)
    variables = fold_victim_bn(victim.variables, eps=eps)
    kwargs = {"fold_bn": True}
    for field in ("stem_s2d", "transform_input"):
        if hasattr(victim.module, field):
            kwargs[field] = getattr(victim.module, field)
    return create_model(
        victim.name,
        num_classes=victim.num_classes,
        dtype=victim.module.dtype,
        input_size=victim.input_size,
        variables=variables,
        normalize=victim.normalize if normalize is None else normalize,
        mean=victim.mean,
        std=victim.std,
        **kwargs,
    )
