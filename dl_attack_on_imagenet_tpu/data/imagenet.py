"""ILSVRC ImageNet on-disk reader: folder scan, synset mapping, transforms.

Replaces DS_ImageNet.py (torchvision ImageFolder subclass + pickled-dataset
blob) with a torch-free reader: PIL decode on the host, the reference's
blanket Resize(256)+CenterCrop(224) transform (DS_ImageNet.py:14-18), and
human-readable class names from LOC_synset_mapping.txt (DS_ImageNet.py:21-30).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .dataset import ArrayDataset

TRAIN_SUBDIR = os.path.join("Data", "train")
VAL_SUBDIR = os.path.join("Data", "val")
SYNSET_FILE = "LOC_synset_mapping.txt"


def read_synset_mapping(path: str) -> Dict[str, str]:
    """wnid -> human label ('n01440764' -> 'tench, Tinca tinca').

    Reference: DS_ImageNet.py:21-30 (read_label).
    """
    mapping: Dict[str, str] = {}
    with open(path, "r") as f:
        for line in f:
            line = line.rstrip()
            if not line:
                continue
            parts = line.split(" ", 1)
            mapping[parts[0]] = parts[1] if len(parts) > 1 else parts[0]
    return mapping


def resized_dims(w: int, h: int, resize: int) -> tuple:
    """(new_w, new_h) of torchvision Resize(shorter side -> ``resize``).

    The long side is int(resize * long / short) — TRUNCATION, not round()
    (torchvision F._compute_resized_output_size); round() shifts the center
    crop by one pixel for ~half of aspect ratios. Single source for the
    Python decode path; native/host_loader.cpp mirrors it and
    tests/test_native_runtime.py pins the two against each other.
    """
    if w <= h:
        return resize, int(resize * h / w)
    return int(resize * w / h), resize


def default_transform(img, size: int = 224, resize: int = 256) -> np.ndarray:
    """Resize(shorter side -> ``resize``) + center crop + [0,1] float NHWC.

    Matches torchvision Resize(256)+CenterCrop(224)+ToTensor as composed at
    DS_ImageNet.py:14-18, except the output layout is HWC (TPU-native).
    """
    from PIL import Image

    w, h = img.size
    img = img.resize(resized_dims(w, h, resize), Image.BILINEAR)
    w, h = img.size
    # torchvision center_crop ROUNDS the half-margin (functional.center_crop:
    # int(round((dim - c) / 2.0)), round-half-even) — floor `// 2` shifted the
    # window one pixel left/up for odd margins rounding up (found by executing
    # DS_ImageNet.py's transform stack, tests/test_reference_exec_imagenet.py)
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return arr


class ImageNetFolder:
    """Directory-of-wnid-folders dataset (lazy decode).

    ``root/<split subdir>/<wnid>/*.JPEG`` layout, like DS_ImageNet
    (DS_ImageNet.py:33-48). ``classes`` holds the first human-label token per
    class (DS_ImageNet.py:42 splits on the first comma).
    """

    def __init__(
        self,
        root: str,
        split: str = "val",
        transform=default_transform,
        image_size: int = 224,
    ):
        subdir = TRAIN_SUBDIR if split == "train" else VAL_SUBDIR
        data_dir = os.path.join(root, "ILSVRC", subdir)
        if not os.path.isdir(data_dir):
            # also accept root already pointing at the split dir
            data_dir = root
        self.root = data_dir
        self.transform = transform
        self.image_size = image_size

        wnids = sorted(
            d for d in os.listdir(data_dir)
            if os.path.isdir(os.path.join(data_dir, d))
        )
        if not wnids:
            raise FileNotFoundError(f"no class folders under {data_dir}")
        self.wnids = wnids
        self.class_to_idx = {w: i for i, w in enumerate(wnids)}

        synset_path = os.path.join(root, "ILSVRC", SYNSET_FILE)
        if not os.path.exists(synset_path):
            synset_path = os.path.join(root, SYNSET_FILE)
        if os.path.exists(synset_path):
            mapping = read_synset_mapping(synset_path)
            self.classes = [
                mapping.get(w, w).split(",", 1)[0] for w in wnids
            ]
        else:
            self.classes = list(wnids)

        self.samples: List[Tuple[str, int]] = []
        for w in wnids:
            cdir = os.path.join(data_dir, w)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith((".jpeg", ".jpg", ".png")):
                    self.samples.append((os.path.join(cdir, fname), self.class_to_idx[w]))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        from PIL import Image

        path, label = self.samples[i]
        with open(path, "rb") as f:
            img = Image.open(f)
            arr = self.transform(img, size=self.image_size)
        return arr, label

    def load_image(self, path: str) -> np.ndarray:
        """Decode + transform a single file (the main.py:69-74 use case)."""
        from PIL import Image

        with open(path, "rb") as f:
            return self.transform(Image.open(f), size=self.image_size)

    def materialize(
        self, indices: Optional[Sequence[int]] = None, runtime=None
    ) -> ArrayDataset:
        """Decode (a subset of) the dataset into an ArrayDataset.

        When the native host-loader runtime is available it decodes with the
        C++ thread pool; otherwise PIL decodes serially.
        """
        idxs = np.arange(len(self)) if indices is None else np.asarray(indices)
        if runtime is not None:
            paths = [self.samples[int(i)][0] for i in idxs]
            images = runtime.decode_batch(paths, self.image_size)
        else:
            images = np.stack([self[int(i)][0] for i in idxs])
        labels = np.asarray([self.samples[int(i)][1] for i in idxs], np.int64)
        return ArrayDataset(images, labels)


def load_imagenet(root: str = "./data/ImageNet", split: str = "val") -> ImageNetFolder:
    """Entry point mirroring imagenet_loading.load_ImageNet() (:47-56) minus
    the torch-pickle blob: returns the lazy folder dataset (and its classes
    via ``.classes``)."""
    return ImageNetFolder(root, split=split)
