"""Class-balanced dataset splitting.

Assumption-free rewrite of the reference's split (imagenet_loading.py:21-44),
which hard-codes exactly 50 images per class (``reshape([1000, 50])``) — this
version works for any per-class count and subsets the requested number of
classes, erroring clearly when a class has too few samples.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from .dataset import ArrayDataset


def split_by_class(
    dataset: ArrayDataset,
    number_per_class: Sequence[int],
    number_of_classes: int = 1000,
    seed: int = 0,
) -> Tuple[ArrayDataset, ...]:
    """Split into len(number_per_class) class-balanced subsets.

    ``number_per_class = [n_train, n_val, n_test]`` takes, per class (for the
    first ``number_of_classes`` classes in sorted label order), that many
    shuffled samples for each split — mirroring
    ``dataset_split_by_class(ds, [10, 2, 5], 1000)`` (demo_dL_attack.py:76-78).
    """
    labels = np.asarray(dataset.labels)
    classes = np.unique(labels)[:number_of_classes]
    need = int(sum(number_per_class))
    rng = np.random.default_rng(seed)

    split_indices = [[] for _ in number_per_class]
    for c in classes:
        rows = np.where(labels == c)[0]
        if len(rows) < need:
            raise ValueError(
                f"class {c} has {len(rows)} samples, need {need} for splits "
                f"{list(number_per_class)}"
            )
        rng.shuffle(rows)
        offset = 0
        for slot, count in enumerate(number_per_class):
            split_indices[slot].append(rows[offset : offset + count])
            offset += count

    return tuple(
        dataset.subset(np.concatenate(idxs)) for idxs in split_indices
    )
