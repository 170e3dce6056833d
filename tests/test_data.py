"""Data-layer tests: datasets, splits, ImageNet folder reader, prefetch."""

import os

import jax
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.data import (
    ArrayDataset,
    ImageNetFolder,
    as_array_dataset,
    default_transform,
    prefetch_to_device,
    read_synset_mapping,
    split_by_class,
)


class TestArrayDataset:
    def test_basic(self):
        ds = ArrayDataset(np.zeros((10, 4, 4, 3)), np.arange(10))
        assert len(ds) == 10
        x, y = ds[3]
        assert y == 3

    def test_batches_cover_all(self):
        ds = ArrayDataset(np.zeros((10, 2, 2, 3)), np.arange(10))
        seen = []
        for idx, x, y in ds.batches(4):
            seen.extend(idx.tolist())
            assert x.shape[0] == y.shape[0] == len(idx)
        assert sorted(seen) == list(range(10))

    def test_batches_drop_remainder(self):
        ds = ArrayDataset(np.zeros((10, 2, 2, 3)), np.arange(10))
        batches = list(ds.batches(4, drop_remainder=True))
        assert len(batches) == 2

    def test_coerce(self):
        ds = as_array_dataset((np.zeros((3, 2, 2, 3)), np.zeros(3)))
        assert isinstance(ds, ArrayDataset)
        assert as_array_dataset(ds) is ds
        with pytest.raises(TypeError):
            as_array_dataset(42)


class TestSplits:
    def test_balanced_split(self):
        labels = np.repeat(np.arange(5), 8)
        ds = ArrayDataset(np.zeros((40, 2, 2, 3)), labels)
        tr, va, te = split_by_class(ds, [4, 2, 2], number_of_classes=5)
        assert len(tr) == 20 and len(va) == 10 and len(te) == 10
        for split, per in [(tr, 4), (va, 2), (te, 2)]:
            counts = np.bincount(split.labels, minlength=5)
            np.testing.assert_array_equal(counts, per)
        # splits are disjoint by construction of per-class offsets

    def test_subset_of_classes(self):
        labels = np.repeat(np.arange(5), 8)
        ds = ArrayDataset(np.zeros((40, 2, 2, 3)), labels)
        (tr, va) = split_by_class(ds, [2, 1], number_of_classes=3)
        assert set(np.unique(tr.labels)) == {0, 1, 2}

    def test_too_few_samples_raises(self):
        ds = ArrayDataset(np.zeros((4, 2, 2, 3)), np.zeros(4, np.int64))
        with pytest.raises(ValueError):
            split_by_class(ds, [3, 2], number_of_classes=1)

    def test_works_with_uneven_class_sizes(self):
        # the reference hard-codes 50/class; we must handle ragged counts
        labels = np.asarray([0] * 5 + [1] * 9)
        ds = ArrayDataset(np.zeros((14, 2, 2, 3)), labels)
        (tr, va) = split_by_class(ds, [2, 2], number_of_classes=2)
        np.testing.assert_array_equal(np.bincount(tr.labels), [2, 2])


@pytest.fixture()
def fake_ilsvrc(tmp_path):
    from PIL import Image

    root = tmp_path / "ImageNet"
    val = root / "ILSVRC" / "Data" / "val"
    rng = np.random.default_rng(0)
    wnids = ["n01440764", "n01443537", "n01484850"]
    for w in wnids:
        d = val / w
        d.mkdir(parents=True)
        for i in range(4):
            arr = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{w}_{i}.JPEG")
    (root / "ILSVRC" / "LOC_synset_mapping.txt").write_text(
        "n01440764 tench, Tinca tinca\n"
        "n01443537 goldfish, Carassius auratus\n"
        "n01484850 great white shark, white shark\n"
    )
    return str(root)


class TestImageNetFolder:
    def test_scan_and_classes(self, fake_ilsvrc):
        ds = ImageNetFolder(fake_ilsvrc, split="val", image_size=32)
        assert len(ds) == 12
        assert ds.classes == ["tench", "goldfish", "great white shark"]
        x, y = ds[0]
        assert x.shape == (32, 32, 3)
        assert x.dtype == np.float32
        assert 0.0 <= x.min() and x.max() <= 1.0
        assert y == 0

    def test_materialize(self, fake_ilsvrc):
        ds = ImageNetFolder(fake_ilsvrc, split="val", image_size=32)
        arr = ds.materialize([0, 5, 11])
        assert arr.images.shape == (3, 32, 32, 3)
        np.testing.assert_array_equal(arr.labels, [0, 1, 2])

    def test_missing_root_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ImageNetFolder(str(tmp_path / "nope"))

    def test_synset_mapping(self, fake_ilsvrc):
        m = read_synset_mapping(
            os.path.join(fake_ilsvrc, "ILSVRC", "LOC_synset_mapping.txt")
        )
        assert m["n01440764"] == "tench, Tinca tinca"

    def test_transform_center_crop(self):
        from PIL import Image

        img = Image.fromarray(np.zeros((100, 200, 3), np.uint8))
        out = default_transform(img, size=224, resize=256)
        assert out.shape == (224, 224, 3)


class TestPrefetch:
    def test_prefetch_preserves_order_and_values(self):
        batches = [(np.full((2, 2), i), np.full((2,), i)) for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2))
        assert len(out) == 5
        for i, (x, y) in enumerate(out):
            np.testing.assert_array_equal(np.asarray(x), i)
            assert hasattr(x, "devices")  # actually on device


def test_mesh_training_accepts_folder_dataset(fake_ilsvrc, devices, tmp_path):
    """learn_dictionary with a mesh + a path-backed dataset materializes
    first (native streaming is single-controller) instead of crashing in
    as_array_dataset (round-3 review finding)."""
    import jax
    import tempfile

    from dl_attack_on_imagenet_tpu.attacks import ADIL
    from dl_attack_on_imagenet_tpu.data import ImageNetFolder
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.parallel import data_mesh
    from dl_attack_on_imagenet_tpu.utils import ArtifactCache

    victim = create_model("tiny", rng=jax.random.PRNGKey(0))
    folder = ImageNetFolder(fake_ilsvrc, split="val", image_size=32)
    atk = ADIL(victim, eps=8 / 255, steps=2, n_atoms=3, batch_size=4,
               loss="ce", mesh=data_mesh(4), val_every=None, seed=0,
               cache=ArtifactCache(str(tmp_path)))
    atk.learn_dictionary(folder)
    payload = atk.cache.load("ImageNet", model=atk.model_name)
    assert payload["d"].shape == (3, 32, 32, 3)


def test_resized_dims_truncation_absolute():
    """Absolute pin of torchvision's TRUNCATED long side.

    The PIL-vs-native parity test (test_native_runtime.py) only proves the
    two decode paths agree — a symmetric regression of both to round()
    would still pass it. This pins the single-source formula
    (data/imagenet.py::resized_dims) to torchvision
    F._compute_resized_output_size semantics (DS_ImageNet.py:14-18).
    """
    from dl_attack_on_imagenet_tpu.data.imagenet import resized_dims

    # 67:48 at resize=40 -> 55.83: truncation says 55, rounding says 56.
    assert resized_dims(67, 48, 40) == (55, 40)
    assert resized_dims(48, 67, 40) == (40, 55)
    # The reference operating point: a 500x375 val JPEG at Resize(256)
    # -> 341.33, truncated to 341.
    assert resized_dims(500, 375, 256) == (341, 256)
    assert resized_dims(375, 500, 256) == (256, 341)
    assert resized_dims(100, 100, 256) == (256, 256)
