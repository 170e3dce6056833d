"""Dataset materialization CLI: scan an ILSVRC tree, decode, save one blob.

Mirror of /root/reference/DS_ImageNet.py's ``__main__`` (argparse :57-76 +
the commented torch.save at :54): builds the validation (or train) dataset
with the blanket Resize(256)+CenterCrop(224) transform and persists it as a
single npz file that ``load_blob`` (and the demo driver) can reload without
re-decoding. Uses the native C++ decode pool when available.

Usage: python -m dl_attack_on_imagenet_tpu.cli.dataset \
           --root ./data/ImageNet --split val --out imagenet_val.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("adil-dataset")
    p.add_argument("--root", "-r", default="./data/ImageNet",
                   help="ImageNet root containing ILSVRC/ (default ./data/ImageNet)")
    p.add_argument("--split", default="val", help="train or val (default val)")
    p.add_argument("--out", default="ImageNet1000_unnormalized.npz",
                   help="output blob path")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--limit", type=int, default=0,
                   help="decode only the first N images (0 = all)")
    p.add_argument("--no-native", action="store_true",
                   help="force the PIL decode path")
    return p


def main(args) -> str:
    from ..data.imagenet import ImageNetFolder

    runtime = None
    if not args.no_native:
        from ..runtime import get_runtime

        runtime = get_runtime()

    folder = ImageNetFolder(args.root, split=args.split, image_size=args.image_size)
    indices = None
    if args.limit:
        indices = np.arange(min(args.limit, len(folder)))
    ds = folder.materialize(indices, runtime=runtime)
    np.savez_compressed(
        args.out,
        images=ds.images.astype(np.float32),
        labels=ds.labels.astype(np.int64),
        classes=np.asarray(folder.classes, dtype=object),
    )
    print(f"saved {len(ds)} images ({ds.images.nbytes / 1e6:.1f} MB raw) to {args.out}")
    return args.out


def load_blob(path: str):
    """Reload a blob saved by this CLI -> (ArrayDataset, classes).

    The counterpart of imagenet_loading.load_ImageNet()'s torch.load
    (:47-56), without pickle.
    """
    from ..data import ArrayDataset

    blob = np.load(path, allow_pickle=True)
    return ArrayDataset(blob["images"], blob["labels"]), list(blob["classes"])


if __name__ == "__main__":
    main(build_argparser().parse_args())
