"""Import the reference's torch-pickle attack artifacts into ArtifactCache.

The reference memoizes every trained attack as a ``torch.save``'d list at a
magic path (SURVEY.md §5 checkpoint/resume):

- ADIL (adil.py:210):
  ``[d (C,H,W,K), v (N,K), loss_all, fooling_rate_all, val_fool]`` at
  ``trained_dicts/ImageNet_{model}.bin``
- ADILR (adil_regularized.py:499): ``[D (C,H,W,K), label, pred, v, loss]``
- UAP-PGD (uappgd.py:107) / Fast-UAP (fast_uap.py:97):
  ``[attack (1,C,H,W), fooling_rate]``

A user migrating from the reference runs these importers once (or the
``cli.import_artifacts`` wrapper); the converted payload lands in this
framework's :class:`~..utils.ArtifactCache` under the exact keys the attack
classes use for memoization, so ``ADIL(...)``/``UAPPGD(...)`` etc. find the
trained attack and skip straight to inference — the same train-once
contract as the reference (adil.py:94-101).

Layout conversion: the reference is NCHW with an atoms-last dictionary
``(C, H, W, K)``; this framework is NHWC with atoms-first ``(K, H, W, C)``
(CLAUDE.md invariants). Perturbations convert ``(1,C,H,W) -> (1,H,W,C)``.

torch is used only to unpickle (CPU); it is NOT part of any runtime path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from .checkpoint import ArtifactCache


def _load_torch_list(path: str):
    import torch

    try:
        payload = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Reference artifacts may contain plain Python lists / floats /
        # autograd Variables that the restricted unpickler rejects. Only
        # load artifacts you trust (standard torch-pickle caveat).
        payload = torch.load(path, map_location="cpu", weights_only=False)
    return payload


def _to_np(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def ref_dict_to_atoms_first(d: np.ndarray) -> np.ndarray:
    """Reference dictionary (C, H, W, K) -> this framework's (K, H, W, C)."""
    if d.ndim != 4:
        raise ValueError(f"expected a 4-D dictionary, got shape {d.shape}")
    return np.ascontiguousarray(np.transpose(d, (3, 1, 2, 0)))


def ref_image_to_nhwc(e: np.ndarray) -> np.ndarray:
    """Reference perturbation (1, C, H, W) [or (C, H, W)] -> (1, H, W, C)."""
    if e.ndim == 3:
        e = e[None]
    if e.ndim != 4:
        raise ValueError(f"expected a (1,C,H,W) perturbation, got {e.shape}")
    return np.ascontiguousarray(np.transpose(e, (0, 2, 3, 1)))


def import_adil(path: str, cache: ArtifactCache, model_name: str) -> str:
    """Import an ADIL dictionary artifact (adil.py:210 format).

    Returns the cache path written. The payload matches ADIL._save so
    ``ADIL(victim, model_name=..., cache=...)`` memoizes against it.
    """
    d, v, loss_all, fooling_all, val_fool = _load_torch_list(path)[:5]
    payload: Dict[str, Any] = {
        "d": ref_dict_to_atoms_first(_to_np(d)).astype(np.float32),
        "v": _to_np(v).astype(np.float32),
        "loss": np.asarray(_to_np(loss_all), np.float64).ravel(),
        "fooling_rate": np.asarray(_to_np(fooling_all), np.float64).ravel(),
    }
    if val_fool is not None:
        payload["val_fooling"] = np.asarray(_to_np(val_fool), np.float64)
    return cache.save(payload, "ImageNet", model=model_name)


def import_adilr(
    path: str,
    cache: ArtifactCache,
    model_name: str,
    lam1: float,
    lam2: float,
    atoms: Optional[int] = None,
    steps: int = 100,
    tag: str = "train",
) -> str:
    """Import an ADILR artifact (adil_regularized.py:499 format).

    The cache key mirrors ADILR's hyper-keyed memoization
    (model/lam1/lam2/atoms/steps/tag); ``atoms`` defaults to the
    dictionary's K. The Laplace sampler is re-fitted from the imported
    codes on first unsupervised use (ADILR._fit_laplace_from_artifact).
    """
    d, label, pred, v, loss = _load_torch_list(path)[:5]
    d_np = ref_dict_to_atoms_first(_to_np(d)).astype(np.float32)
    payload = {
        "d": d_np,
        "v": _to_np(v).astype(np.float32),
        "loss": np.asarray(_to_np(loss), np.float32).ravel(),
        "labels": np.asarray(_to_np(label)).ravel(),
        # kept for completeness (the reference stores the clean predictions
        # alongside labels); ADILR's loaders ignore unknown keys
        "pred": np.asarray(_to_np(pred)).ravel(),
    }
    key = dict(model=model_name, lam1=lam1, lam2=lam2,
               atoms=int(atoms if atoms is not None else d_np.shape[0]),
               steps=int(steps), tag=tag)
    return cache.save(payload, "ADILR", **key)


def import_uap(path: str, cache: ArtifactCache, model_name: str,
               kind: str = "UAPPGD") -> str:
    """Import a UAP-PGD or Fast-UAP artifact ([attack, fooling_rate]).

    ``kind`` selects the memoization prefix: "UAPPGD" (uappgd.py:107) or
    "FastUAP" (fast_uap.py:97).
    """
    if kind not in ("UAPPGD", "FastUAP"):
        raise ValueError(f"kind must be UAPPGD or FastUAP, got {kind!r}")
    loaded = _load_torch_list(path)
    e, fooling = loaded[0], loaded[1] if len(loaded) > 1 else []
    payload = {
        "e": ref_image_to_nhwc(_to_np(e)).astype(np.float32),
        "fooling_rate": np.asarray(_to_np(fooling), np.float32).ravel(),
    }
    return cache.save(payload, kind, model=model_name)


def import_universal(path: str, save_path: str) -> str:
    """Convert universal_pert's ``.npy`` artifact (universal_pert.py:112-113).

    The reference saves the raw (1,C,H,W) [or (C,H,W)] numpy perturbation;
    this framework's :func:`~..attacks.universal_perturbation` saves an
    (H,W,C) array. Writes the converted array to ``save_path``.
    """
    v = np.load(path)
    v = ref_image_to_nhwc(np.asarray(v))[0]
    np.save(save_path, v.astype(np.float32))
    return save_path
