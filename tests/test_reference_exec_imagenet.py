"""Executed-reference parity: DS_ImageNet.py + imagenet_loading.py (the
reference's data layer — its last non-executed Python files).

The only import blocker was torchvision; _ref_exec stubs ImageFolder and
Resize/CenterCrop/ToTensor with torchvision's documented semantics
(sorted-class folder walk, truncated resize dims, ROUND-half-even center
crop) so the reference's own lines run against a synthetic ILSVRC-shaped
tree of real JPEGs.

Covers:
  * ``DS_ImageNet`` (DS_ImageNet.py:33-48): folder/class bookkeeping,
    ``read_label`` synset parse, ``dict_item_rev_order``, the first-comma
    human-name rename — vs the repo's ``ImageNetFolder``.
  * the full reference transform stack (:14-18) vs the repo's
    ``default_transform``, on BOTH crop-margin parities. Executing this
    found a REAL repo bug: the crop used floor ``// 2`` where torchvision
    rounds half-to-even — one pixel off for ~half of odd margins; fixed in
    data/imagenet.py + native/host_loader.cpp.
  * ``dataset_split_by_class`` (imagenet_loading.py:21-44) vs the repo's
    ``split_by_class``: class-balance/disjointness/coverage on the
    executed output, plus the hardcoded 50-per-class reshape defect
    (SURVEY.md §2.4) executed: any other per-class count raises.
  * ``Subset_I.indexed`` (:8-18): the real class, validating the
    contract _ref_exec.IndexedDataset mirrors for the ADIL tests.
  * ``load_ImageNet`` (:47-56): under torch>=2.6 the pickled-dataset
    round-trip its workflow depends on REFUSES to load (weights_only
    default) — executed to the refusal, then past it.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

sys.path.insert(0, "tests") if "tests" not in sys.path else None
from _ref_exec import load_reference_imagenet

from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.data.imagenet import (
    ImageNetFolder,
    default_transform,
)
from dl_attack_on_imagenet_tpu.data.splits import split_by_class

WNIDS = ["n01440764", "n01443537", "n01484850"]
NAMES = ["tench, Tinca tinca", "goldfish, Carassius auratus",
         "great white shark, white shark"]
PER_CLASS = 50  # the count imagenet_loading.py:32 hardcodes


@pytest.fixture(scope="module")
def refim():
    return load_reference_imagenet()


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """ILSVRC-shaped tree of real JPEGs. 67x50 sources make the resized
    width 343 (odd crop margin 119 -> round/floor disagree); image 0 of
    each class is 64x48 (margin 117 -> round 58 == floor 58)."""
    root = tmp_path_factory.mktemp("ilsvrc_root")
    rng = np.random.default_rng(3)
    val = root / "ILSVRC" / "Data" / "val"
    for w in WNIDS:
        d = val / w
        d.mkdir(parents=True)
        for i in range(PER_CLASS):
            shape = (48, 64, 3) if i == 0 else (50, 67, 3)
            arr = rng.integers(0, 255, shape, dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:03d}.JPEG", quality=95)
    with open(root / "ILSVRC" / "LOC_synset_mapping.txt", "w") as f:
        for w, n in zip(WNIDS, NAMES):
            f.write(f"{w} {n}\n")
    return str(root)


def test_ds_imagenet_bookkeeping_exec(refim, tree):
    ds = refim.ds.DS_ImageNet(tree, split="val", transform=None)
    folder = ImageNetFolder(tree, split="val")

    assert len(ds) == len(folder) == 3 * PER_CLASS
    # first-comma human names (DS_ImageNet.py:42)
    assert ds.classes == [n.split(",", 1)[0] for n in NAMES]
    assert ds.classes == folder.classes
    # idx_to_class is the class_to_idx inverse (:44-48)
    assert ds.idx_to_class == {i: w for i, w in enumerate(WNIDS)}
    assert ds.class_to_idx == folder.class_to_idx
    # identical (path, label) enumeration order
    assert [(os.path.basename(p), l) for p, l in ds.samples] == [
        (os.path.basename(p), l) for p, l in folder.samples
    ]


@pytest.mark.parametrize("index", [0, 1])  # even margin, odd margin
def test_transform_stack_exec(refim, tree, index):
    """The reference's Resize(256)+CenterCrop(224)+ToTensor (:14-18) vs
    the repo's default_transform, decoded from the same JPEG. index=1 is
    the odd-margin case where the repo's floor-crop bug diverged by one
    pixel (max abs err 0.19) before the round-5 fix."""
    ds = refim.ds.DS_ImageNet(tree, split="val", transform=refim.ds.transform)
    x_ref, y_ref = ds[index]
    x_ref = x_ref.numpy().transpose(1, 2, 0)  # CHW -> HWC

    folder = ImageNetFolder(tree, split="val")
    path, y = folder.samples[index]
    assert y == y_ref
    with open(path, "rb") as f:
        x = default_transform(Image.open(f))
    assert x.shape == x_ref.shape == (224, 224, 3)
    np.testing.assert_allclose(x, x_ref, atol=2e-6)


def _enable_subset_i(refim):
    """torch>=2.4's Subset.__init__ REFUSES subclasses overriding
    __getitem__ without __getitems__ — so Subset_I (and with it every
    reference split) is uncallable against current torch as written
    (environmental defect of record; pinned in
    test_subset_i_modern_torch_defect). Attach exactly the one-liner the
    torch error message prescribes, changing no reference semantics."""
    S = refim.loading.Subset_I
    if "__getitems__" not in S.__dict__:
        S.__getitems__ = lambda self, idxs: [self[i] for i in idxs]


def test_split_by_class_exec(refim, tree):
    ds = refim.ds.DS_ImageNet(tree, split="val", transform=None)
    import random

    _enable_subset_i(refim)
    random.seed(0)
    tr, va, te = refim.loading.dataset_split_by_class(
        ds, [30, 10, 5], number_of_classes=3
    )
    labels = np.asarray([l for _, l in ds.samples])
    for subset, want in zip((tr, va, te), (30, 10, 5)):
        idx = np.asarray(subset.indices)
        assert len(idx) == want * 3
        # class-balanced: exactly `want` rows of every class
        counts = np.bincount(labels[idx], minlength=3)
        assert counts.tolist() == [want] * 3
    all_idx = np.concatenate(
        [np.asarray(s.indices) for s in (tr, va, te)]
    )
    assert len(np.unique(all_idx)) == len(all_idx)  # disjoint

    # the repo's splitter on the same labels: same structural contract
    images = np.zeros((len(ds), 2, 2, 3), np.float32)
    r_tr, r_va, r_te = split_by_class(
        ArrayDataset(images, labels), [30, 10, 5], number_of_classes=3
    )
    for sub, want in zip((r_tr, r_va, r_te), (30, 10, 5)):
        assert np.bincount(np.asarray(sub.labels), minlength=3).tolist() \
            == [want] * 3


def test_split_hardcoded_50_defect(refim):
    """imagenet_loading.py:32 reshapes to (num_classes, 50) — any other
    per-class count crashes (SURVEY.md §2.4), where the repo's
    assumption-free splitter works."""

    class FakeDS:
        samples = [(f"f{i}", i // 49) for i in range(3 * 49)]
        classes = ["a", "b", "c"]

    with pytest.raises(ValueError):
        refim.loading.dataset_split_by_class(FakeDS(), [30, 10, 5], 3)

    labels = np.asarray([l for _, l in FakeDS.samples])
    images = np.zeros((len(labels), 2, 2, 3), np.float32)
    parts = split_by_class(ArrayDataset(images, labels), [30, 10, 5], 3)
    assert [len(p) for p in parts] == [90, 30, 15]


def test_subset_i_modern_torch_defect(refim):
    """Subset_I as written raises at CONSTRUCTION under torch>=2.4 (the
    __getitems__ guard) — executed up to the defect on a pristine copy."""
    import torch.utils.data as tud

    class Pristine(tud.Subset):
        def __init__(self, dataset, indices, indexed=False):
            super().__init__(dataset=dataset, indices=indices)
            self.indexed = indexed

        __getitem__ = refim.loading.Subset_I.__getitem__

    with pytest.raises(NotImplementedError):
        Pristine([(1, 2)], [0])


def test_subset_i_indexed_exec(refim):
    """The real Subset_I (:8-18) — the contract _ref_exec.IndexedDataset
    mirrors for the executed ADIL tests."""
    _enable_subset_i(refim)
    base = [(np.float32(i), i % 3) for i in range(10)]
    sub = refim.loading.Subset_I(base, [5, 7], indexed=False)
    assert sub[0] == base[5]
    sub.indexed = True
    item, x, y = sub[1]
    assert (item, x, y) == (1,) + base[7]


def test_load_imagenet_pickle_exec(refim, tree, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("data/ImageNet", exist_ok=True)
    ds = refim.ds.DS_ImageNet(tree, split="val", transform=None)
    torch.save(ds, "data/ImageNet/ImageNet1000_unnormalized.bin")

    # torch>=2.6 defaults weights_only=True: unpickling an arbitrary
    # dataset class is refused, so load_ImageNet (:53) is uncallable
    # against current torch as written (environmental defect of record,
    # like torchmetrics>=1.0 for model_accuracy.py).
    with pytest.raises(Exception):
        refim.loading.load_ImageNet()

    real_load = torch.load
    monkeypatch.setattr(
        torch, "load", lambda *a, **k: real_load(
            *a, **{**k, "weights_only": False})
    )
    loaded, classes = refim.loading.load_ImageNet()
    assert classes == ds.classes
    assert len(loaded) == len(ds)
