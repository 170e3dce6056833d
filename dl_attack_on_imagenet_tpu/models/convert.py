"""torch checkpoint -> Flax variables converter.

The reference pulls its six victims from torchvision with pretrained=True
(main.py:41-52). This environment ships no torchvision and no weight files,
so pretrained parity is delivered as a conversion tool: given a torchvision
``state_dict`` (a plain ``torch.load``-able mapping), produce the Flax
variables for the matching zoo architecture.

Strategy: both torchvision modules and our Flax modules emit their tensors
in execution order (torch state_dicts preserve insertion order; Flax names
submodules ``Class_N`` with N in call order). We walk both sequences in
lockstep, classify each tensor (conv kernel / linear weight / bias / BN
param / BN running stat), apply the layout transform (OIHW->HWIO for convs
— depthwise included — and transpose for linear weights), and shape-check
every assignment. Aux-classifier weights (absent from our eval-only models)
are dropped up front.

ViT needs a dedicated mapping (torch fuses qkv into ``in_proj``); see
``convert_vit_state_dict``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

_AUX_PREFIXES = ("AuxLogits.", "aux1.", "aux2.")
_SKIP_SUFFIXES = ("num_batches_tracked",)


def _walk_flax_modules(params: Dict, batch_stats: Dict, path=()) -> List[Tuple[tuple, str]]:
    """Yield (path, kind) leaf slots in call (execution) order.

    Relies on Flax preserving submodule insertion order in the params dict
    (first-use order during ``module.init``), which matches torch
    state_dict insertion order for architectures defined in execution order.
    WARNING: ``jax.tree_util.tree_map`` and some serializers SORT dict keys
    and silently destroy this order — convert on freshly-initialized
    variables (``create_model(...).variables``) or trees produced by this
    module (whose copies are order-preserving), never on tree_map output.

    kind in {conv_kernel, dense_kernel, bias, bn_scale, bn_bias, bn_mean,
    bn_var, other}. BatchNorm modules expand into the torch emission order
    (weight, bias, running_mean, running_var).
    """
    out: List[Tuple[tuple, str]] = []
    if not isinstance(params, dict):
        return out
    keys = list(params.keys())
    # A BatchNorm module in flax params has exactly {scale, bias} leaves.
    if set(keys) <= {"scale", "bias"} and "scale" in keys:
        out.append((path + ("scale",), "bn_scale"))
        out.append((path + ("bias",), "bn_bias"))
        out.append((path + ("mean",), "bn_mean"))
        out.append((path + ("var",), "bn_var"))
        return out
    if "kernel" in keys:
        kern = params["kernel"]
        kind = "conv_kernel" if np.ndim(kern) == 4 else "dense_kernel"
        out.append((path + ("kernel",), kind))
        if "bias" in keys:
            out.append((path + ("bias",), "bias"))
        for k in keys:
            if k not in ("kernel", "bias"):
                out.extend(_walk_flax_modules(params[k], batch_stats, path + (k,)))
        return out
    for k in keys:
        child = params[k]
        if isinstance(child, dict):
            out.extend(_walk_flax_modules(child, batch_stats, path + (k,)))
        else:
            out.append((path + (k,), "other"))
    return out


def _get(tree: Dict, path: tuple):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree: Dict, path: tuple, value):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


def _classify_torch(name: str, arr: np.ndarray) -> str:
    if name.endswith("running_mean"):
        return "bn_mean"
    if name.endswith("running_var"):
        return "bn_var"
    if arr.ndim == 4:
        return "conv_kernel"
    if arr.ndim == 2:
        return "dense_kernel"
    return "vector"  # bias or bn weight/bias — disambiguated by the flax slot


_COMPATIBLE = {
    "conv_kernel": {"conv_kernel"},
    "dense_kernel": {"dense_kernel"},
    "bn_mean": {"bn_mean"},
    "bn_var": {"bn_var"},
    "vector": {"bias", "bn_scale", "bn_bias"},
}


def convert_torch_state_dict(state_dict, variables: Dict) -> Dict:
    """Sequence-align a torch state_dict onto Flax ``variables``.

    Args:
      state_dict: mapping name -> tensor/ndarray (torch insertion order).
      variables: the target model's init variables {'params': ..,
        'batch_stats': ..} (used for structure + shape checks only).

    Returns a new variables dict with converted weights.
    """
    import copy

    params = copy.deepcopy(jax_tree_to_numpy(variables.get("params", {})))
    batch_stats = copy.deepcopy(jax_tree_to_numpy(variables.get("batch_stats", {})))

    slots = _walk_flax_modules(variables.get("params", {}), variables.get("batch_stats", {}))

    torch_items = []
    for name, tensor in state_dict.items():
        if any(name.startswith(p) or f".{p}" in name for p in _AUX_PREFIXES):
            continue
        if name.endswith(_SKIP_SUFFIXES):
            continue
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        torch_items.append((name, arr))

    if len(torch_items) != len(slots):
        raise ValueError(
            f"tensor count mismatch: torch has {len(torch_items)} usable "
            f"tensors, flax model has {len(slots)} slots"
        )

    for (tname, arr), (path, kind) in zip(torch_items, slots):
        tkind = _classify_torch(tname, arr)
        if kind not in _COMPATIBLE.get(tkind, ()):  # pragma: no cover - guard
            raise ValueError(f"{tname} ({tkind}, {arr.shape}) cannot fill slot {path} ({kind})")
        if kind == "conv_kernel":
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        elif kind == "dense_kernel":
            arr = arr.T  # (out,in) -> (in,out)
        target_tree = batch_stats if kind in ("bn_mean", "bn_var") else params
        tpath = path
        if kind == "bn_mean":
            tpath = path[:-1] + ("mean",)
        elif kind == "bn_var":
            tpath = path[:-1] + ("var",)
        expected = np.shape(_get(target_tree, tpath))
        if tuple(arr.shape) != tuple(expected):
            raise ValueError(
                f"shape mismatch for {tname} -> {tpath}: {arr.shape} vs {expected}"
            )
        _set(target_tree, tpath, arr.astype(np.asarray(_get(target_tree, tpath)).dtype))

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def jax_tree_to_numpy(tree):
    """Order-PRESERVING numpy copy of a nested dict tree.

    ``jax.tree_util.tree_map`` sorts dict keys, which would destroy the
    execution order this module's sequence alignment depends on
    ('BasicBlock_10' sorts before 'ConvBN_0') — so the recursion is manual.
    """
    if isinstance(tree, dict):
        return {k: jax_tree_to_numpy(v) for k, v in tree.items()}
    return np.asarray(tree)


def flax_to_torch_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Inverse transform (for round-trip tests and exporting): emit a
    torch-style ordered mapping from Flax variables."""
    slots = _walk_flax_modules(variables.get("params", {}), variables.get("batch_stats", {}))
    params = jax_tree_to_numpy(variables.get("params", {}))
    batch_stats = jax_tree_to_numpy(variables.get("batch_stats", {}))
    out: Dict[str, np.ndarray] = {}
    for i, (path, kind) in enumerate(slots):
        name = ".".join(path) + f"#{i}"
        if kind in ("bn_mean", "bn_var"):
            leaf = _get(batch_stats, path[:-1] + ("mean" if kind == "bn_mean" else "var",))
            out[name + (".running_mean" if kind == "bn_mean" else ".running_var")] = leaf
        elif kind == "conv_kernel":
            out[name] = np.transpose(_get(params, path), (3, 2, 0, 1))
        elif kind == "dense_kernel":
            out[name] = np.asarray(_get(params, path)).T
        else:
            out[name] = _get(params, path)
    return out


def convert_vit_state_dict(state_dict, variables: Dict, num_heads: int = 12) -> Dict:
    """Dedicated torchvision vit_b_16 -> Flax ViT mapping.

    torch fuses qkv into ``in_proj_weight``/``in_proj_bias``; Flax
    MultiHeadDotProductAttention uses per-projection kernels of shape
    (d, heads, head_dim). Position embeddings and class token map 1:1.
    """
    import copy

    params = copy.deepcopy(jax_tree_to_numpy(variables["params"]))
    d = params["cls_token"].shape[-1]
    hd = d // num_heads

    def t(name):
        x = state_dict[name]
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    params["cls_token"] = t("class_token").reshape(1, 1, d)
    params["pos_embedding"] = t("encoder.pos_embedding").reshape(params["pos_embedding"].shape)
    conv = t("conv_proj.weight")
    params["Conv_0"]["kernel"] = np.transpose(conv, (2, 3, 1, 0))
    params["Conv_0"]["bias"] = t("conv_proj.bias")

    n_layers = len([k for k in params if k.startswith("EncoderBlock_")])
    for i in range(n_layers):
        blk = params[f"EncoderBlock_{i}"]
        pre = f"encoder.layers.encoder_layer_{i}"
        blk["LayerNorm_0"]["scale"] = t(f"{pre}.ln_1.weight")
        blk["LayerNorm_0"]["bias"] = t(f"{pre}.ln_1.bias")
        blk["LayerNorm_1"]["scale"] = t(f"{pre}.ln_2.weight")
        blk["LayerNorm_1"]["bias"] = t(f"{pre}.ln_2.bias")
        attn = blk["MultiHeadDotProductAttention_0"]
        w = t(f"{pre}.self_attention.in_proj_weight")  # (3d, d)
        b = t(f"{pre}.self_attention.in_proj_bias")  # (3d,)
        for j, proj in enumerate(("query", "key", "value")):
            attn[proj]["kernel"] = w[j * d : (j + 1) * d].T.reshape(d, num_heads, hd)
            attn[proj]["bias"] = b[j * d : (j + 1) * d].reshape(num_heads, hd)
        attn["out"]["kernel"] = (
            t(f"{pre}.self_attention.out_proj.weight").T.reshape(num_heads, hd, d)
        )
        attn["out"]["bias"] = t(f"{pre}.self_attention.out_proj.bias")
        mlp = blk["MlpBlock_0"]
        mlp["Dense_0"]["kernel"] = t(f"{pre}.mlp.0.weight").T
        mlp["Dense_0"]["bias"] = t(f"{pre}.mlp.0.bias")
        mlp["Dense_1"]["kernel"] = t(f"{pre}.mlp.3.weight").T
        mlp["Dense_1"]["bias"] = t(f"{pre}.mlp.3.bias")

    params["LayerNorm_0"]["scale"] = t("encoder.ln.weight")
    params["LayerNorm_0"]["bias"] = t("encoder.ln.bias")
    params["Dense_0"]["kernel"] = t("heads.head.weight").T
    params["Dense_0"]["bias"] = t("heads.head.bias")
    return {"params": params}


def load_torch_checkpoint(path: str, victim, vit: bool = False):
    """Load a ``torch.save``d state_dict and convert it onto ``victim``.

    Returns a new VictimModel sharing the module with converted variables.
    """
    import dataclasses

    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state_dict, "state_dict"):
        state_dict = state_dict.state_dict()
    if vit or victim.name.startswith("vit"):
        variables = convert_vit_state_dict(state_dict, victim.variables)
    else:
        variables = convert_torch_state_dict(state_dict, victim.variables)
    return dataclasses.replace(victim, variables=variables)
