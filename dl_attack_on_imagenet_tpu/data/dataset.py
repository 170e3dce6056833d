"""In-memory dataset container used by the attack layer.

Replaces the reference's ``Subset_I`` indexed-dataset trick
(imagenet_loading.py:8-18: a mutable ``indexed`` flag switching __getitem__
between (x, y) and (i, x, y)) with an explicit array container — every batch
always knows its global row indices, which is what the per-image code matrix
``v`` needs (adil.py:25).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class ArrayDataset:
    """Images (N, H, W, C) float32 in [0,1] + integer labels (N,)."""

    images: np.ndarray
    labels: np.ndarray

    def __post_init__(self):
        self.images = np.asarray(self.images)
        self.labels = np.asarray(self.labels)
        assert self.images.shape[0] == self.labels.shape[0]

    def __len__(self) -> int:
        return self.images.shape[0]

    def __getitem__(self, i):
        return self.images[i], self.labels[i]

    @property
    def image_shape(self) -> Tuple[int, ...]:
        return tuple(self.images.shape[1:])

    def as_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.images, self.labels

    def subset(self, indices) -> "ArrayDataset":
        idx = np.asarray(indices)
        return ArrayDataset(self.images[idx], self.labels[idx])

    def batches(
        self, batch_size: int, shuffle: bool = False, seed: int = 0,
        drop_remainder: bool = False,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (indices, images, labels) host batches."""
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        stop = n - n % batch_size if drop_remainder else n
        for start in range(0, stop, batch_size):
            idx = order[start : start + batch_size]
            yield idx, self.images[idx], self.labels[idx]


def as_array_dataset(data) -> ArrayDataset:
    """Coerce (images, labels) tuples or dataset-likes to ArrayDataset."""
    if isinstance(data, ArrayDataset):
        return data
    if isinstance(data, (tuple, list)) and len(data) == 2:
        return ArrayDataset(np.asarray(data[0]), np.asarray(data[1]))
    if hasattr(data, "images") and hasattr(data, "labels"):
        return ArrayDataset(np.asarray(data.images), np.asarray(data.labels))
    raise TypeError(f"cannot interpret {type(data)} as a dataset")
