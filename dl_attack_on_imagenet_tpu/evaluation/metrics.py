"""Attack-quality and accuracy metrics.

Reference: performance.py:238-266 (fooling rate / RMSE / MSE criteria) and
model_accuracy.py (serial + DDP top-1 accuracy).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import VictimModel


@functools.lru_cache(maxsize=None)
def _correct_fn(apply_fn):
    """Jitted correct-count shared across accuracy calls (one victim-forward
    trace per victim, not per model_accuracy invocation — the transfer
    matrix calls this once per zoo member)."""

    @jax.jit
    def correct(vars_, x, y):
        pred = jnp.argmax(apply_fn(vars_, x).astype(jnp.float32), -1)
        return jnp.sum(pred == y)

    return correct


@functools.lru_cache(maxsize=None)
def _correct_masked_fn(apply_fn):
    @jax.jit
    def correct(vars_, x, y, m):
        pred = jnp.argmax(apply_fn(vars_, x).astype(jnp.float32), -1)
        return jnp.sum((pred == y) * m)

    return correct


def compute_fooling_rate(victim: VictimModel, adversary, clean, reduction="sum",
                         clean_labels=None):
    """Label-change fooling criterion (performance.py:238-246).

    Pass ``clean_labels`` when the clean predictions are already known to
    skip one model forward.
    """
    if clean_labels is None:
        clean_labels = victim.predict(jnp.asarray(clean))
    label_adv = victim.predict(jnp.asarray(adversary))
    diff = (jnp.asarray(clean_labels) != label_adv).astype(jnp.float32)
    return float(jnp.sum(diff) if reduction == "sum" else jnp.mean(diff))


def compute_rmse(adversary, clean, reduction="sum"):
    """Relative MSE: ||delta||^2 / ||x||^2 per image (performance.py:249-257)."""
    adversary, clean = jnp.asarray(adversary), jnp.asarray(clean)
    axes = tuple(range(1, clean.ndim))
    upper = jnp.sum((adversary - clean) ** 2, axis=axes)
    lower = jnp.sum(clean**2, axis=axes)
    ratio = upper / lower
    return float(jnp.sum(ratio) if reduction == "sum" else jnp.mean(ratio))


def compute_mse(adversary, clean, reduction="sum"):
    """Per-image squared error (performance.py:260-266)."""
    adversary, clean = jnp.asarray(adversary), jnp.asarray(clean)
    axes = tuple(range(1, clean.ndim))
    upper = jnp.sum((adversary - clean) ** 2, axis=axes)
    return float(jnp.sum(upper) if reduction == "sum" else jnp.mean(upper))


def model_accuracy(dataset, victim: VictimModel, batch_size: int = 128) -> float:
    """Top-1 accuracy over a dataset (model_accuracy.py:50-63)."""
    from ..data import as_array_dataset

    ds = as_array_dataset(dataset)
    correct = _correct_fn(victim.apply_fn)

    total = 0
    for _, x, y in ds.batches(batch_size):
        total += int(correct(victim.variables, jnp.asarray(x, jnp.float32), jnp.asarray(y)))
    return total / len(ds)


def model_accuracy_sharded(
    dataset, victim: VictimModel, mesh, axis: str = "data", batch_size: int = 128
) -> float:
    """Mesh-sharded accuracy: batch axis sharded, correct-count psum'd.

    TPU-native replacement for the DDP accuracy path
    (model_accuracy.py:19-47: DistributedSampler + dist.reduce(SUM)).
    """
    from ..data import as_array_dataset

    ds = as_array_dataset(dataset)
    n_dev = mesh.devices.size
    correct = _correct_masked_fn(victim.apply_fn)

    total = 0.0
    step = batch_size * n_dev
    images, labels = ds.as_arrays()
    for start in range(0, len(ds), step):
        x = np.asarray(images[start : start + step], np.float32)
        y = np.asarray(labels[start : start + step])
        m = np.ones((x.shape[0],), np.float32)
        pad = -len(x) % n_dev
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], np.float32)])
            y = np.concatenate([y, np.zeros((pad,), y.dtype)])
            m = np.concatenate([m, np.zeros((pad,), np.float32)])
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(axis, None, None, None)))
        ys = jax.device_put(jnp.asarray(y), NamedSharding(mesh, P(axis)))
        ms = jax.device_put(jnp.asarray(m), NamedSharding(mesh, P(axis)))
        total += float(correct(victim.variables, xs, ys, ms))
    return total / len(ds)
