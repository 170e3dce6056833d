"""Native C++ host-loader tests: decode parity with PIL, prefetch loader.

This module FAILS (not skips) when the native library can't build or load:
g++ and libjpeg are baked into this environment (CLAUDE.md), so a missing
``libadil_host.so`` means ``make -C native`` broke — a skip here would
silently drop the SURVEY.md §2.3 pinned-memory/decode coverage (VERDICT
round-4 directive #8)."""

import os
import subprocess

import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.runtime import HostLoader, get_runtime


def _require_runtime():
    rt = get_runtime()
    if rt is not None:
        return rt
    # surface the real compiler error instead of a silent skip
    res = subprocess.run(
        ["make", "-C", os.path.join(os.path.dirname(__file__), "..", "native")],
        capture_output=True, text=True, timeout=300,
    )
    pytest.fail(
        "native runtime failed to build/load on a host with the baked-in "
        f"toolchain.\nmake rc={res.returncode}\nstdout:\n{res.stdout}\n"
        f"stderr:\n{res.stderr}"
    )


runtime = _require_runtime()


@pytest.fixture()
def jpeg_tree(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths, labels = [], []
    for c in range(3):
        for i in range(4):
            arr = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
            p = tmp_path / f"c{c}_{i}.JPEG"
            Image.fromarray(arr).save(p, quality=95)
            paths.append(str(p))
            labels.append(c)
    return paths, labels


class TestDecodeBatch:
    def test_decode_matches_pil_transform(self, jpeg_tree):
        from PIL import Image

        from dl_attack_on_imagenet_tpu.data.imagenet import default_transform

        paths, _ = jpeg_tree
        out = runtime.decode_batch(paths[:4], size=32, resize=40)
        assert out.shape == (4, 32, 32, 3)
        assert out.dtype == np.float32
        for i in range(4):
            with open(paths[i], "rb") as f:
                want = default_transform(Image.open(f), size=32, resize=40)
            # bilinear resamplers differ slightly at edges; compare loosely
            assert np.mean(np.abs(out[i] - want)) < 0.03
            assert 0.0 <= out[i].min() and out[i].max() <= 1.0

    def test_truncation_sensitive_aspect_ratio_parity(self, tmp_path):
        """Pin torchvision's TRUNCATED long side (int(resize*long/short)).

        67:48 at resize=40 gives 55.83 — truncation says 55, rounding says
        56, and the 1px crop shift a rounding resampler would introduce
        decorrelates noise pixels (mean |diff| ~0.3), so the loose 0.03
        parity bound fails loudly if either the PIL or the native path
        regresses to round(). A SYMMETRIC regression of both paths is
        caught by test_data.py::test_resized_dims_truncation_absolute,
        which pins the single-source formula absolutely. Reference
        semantics: torchvision F._compute_resized_output_size via
        DS_ImageNet.py:14-18."""
        from PIL import Image

        from dl_attack_on_imagenet_tpu.data.imagenet import default_transform

        rng = np.random.default_rng(7)
        paths = []
        for name, shape in (("wide", (48, 67, 3)), ("tall", (67, 48, 3))):
            arr = (rng.random(shape) * 255).astype(np.uint8)
            p = tmp_path / f"{name}.JPEG"
            Image.fromarray(arr).save(p, quality=95)
            paths.append(str(p))
        out = runtime.decode_batch(paths, size=32, resize=40)
        for i, p in enumerate(paths):
            with open(p, "rb") as f:
                want = default_transform(Image.open(f), size=32, resize=40)
            assert np.mean(np.abs(out[i] - want)) < 0.03

    def test_missing_file_errors(self, tmp_path):
        with pytest.raises(IOError):
            runtime.decode_batch([str(tmp_path / "nope.JPEG")], size=32)


class TestHostLoader:
    def test_iterates_all_batches_in_order(self, jpeg_tree):
        paths, labels = jpeg_tree
        loader = HostLoader(runtime, paths, labels, batch_size=5, image_size=32)
        assert loader.num_batches == 3
        seen_labels = []
        indices = []
        for idx, images, labs in loader:
            indices.append(idx)
            assert images.shape == (5, 32, 32, 3)
            seen_labels.extend([l for l in labs.tolist() if l >= 0])
        loader.close()
        assert indices == [0, 1, 2]
        assert sorted(seen_labels) == sorted(labels)

    def test_shuffle_changes_order(self, jpeg_tree):
        paths, labels = jpeg_tree
        l1 = HostLoader(runtime, paths, labels, batch_size=12, image_size=32,
                        shuffle=True, seed=1)
        l2 = HostLoader(runtime, paths, labels, batch_size=12, image_size=32,
                        shuffle=False)
        _, _, a = next(iter(l1))
        _, _, b = next(iter(l2))
        l1.close(); l2.close()
        assert sorted(a.tolist()) == sorted(b.tolist())
        assert a.tolist() != b.tolist()

    def test_padding_labels_minus_one(self, jpeg_tree):
        paths, labels = jpeg_tree  # 12 files
        loader = HostLoader(runtime, paths, labels, batch_size=5, image_size=32)
        batches = list(loader)
        loader.close()
        last = batches[-1][2]
        assert (last == -1).sum() == 3  # 12 = 5+5+2, 3 padded


def test_materialize_with_runtime(jpeg_tree, tmp_path):
    """ImageNetFolder.materialize(runtime=...) uses the native decoder."""
    from dl_attack_on_imagenet_tpu.data.imagenet import ImageNetFolder

    # build a tiny ILSVRC-shaped tree from the jpeg fixture
    paths, labels = jpeg_tree
    root = tmp_path / "root"
    val = root / "ILSVRC" / "Data" / "val"
    import shutil

    for p, l in zip(paths, labels):
        d = val / f"n{l:08d}"
        d.mkdir(parents=True, exist_ok=True)
        shutil.copy(p, d / os.path.basename(p))
    ds = ImageNetFolder(str(root), split="val", image_size=32)
    arr = ds.materialize(runtime=runtime)
    assert arr.images.shape == (12, 32, 32, 3)
    arr_pil = ds.materialize()
    assert np.mean(np.abs(arr.images - arr_pil.images)) < 0.03


class TestIndexedLoader:
    def test_iter_indexed_covers_every_row_once(self, jpeg_tree):
        paths, labels = jpeg_tree
        loader = HostLoader(runtime, paths, labels, batch_size=5,
                            image_size=32, shuffle=True, seed=3)
        seen = []
        for _, imgs, labs, idxs in loader.iter_indexed():
            valid = idxs >= 0
            seen.extend(idxs[valid].tolist())
            # label/index pairing survives the shuffle
            for l, i in zip(labs[valid], idxs[valid]):
                assert l == labels[i]
        loader.close()
        assert sorted(seen) == list(range(len(paths)))

    def test_indexed_images_match_direct_decode(self, jpeg_tree):
        paths, labels = jpeg_tree
        loader = HostLoader(runtime, paths, labels, batch_size=4,
                            image_size=32, shuffle=True, seed=9)
        for _, imgs, labs, idxs in loader.iter_indexed():
            for slot, i in enumerate(idxs):
                if i < 0:
                    continue
                want = runtime.decode_batch([paths[i]], size=32)[0]
                np.testing.assert_allclose(imgs[slot], want, atol=1e-6)
        loader.close()


def test_adil_trains_from_raw_jpeg_folder(jpeg_tree, tmp_path):
    """Config-4 shape: folder of JPEGs -> dictionary, no pre-materialized
    arrays (VERDICT round 1, item #5; reference adil.py:130, :362-364)."""
    import os
    import shutil

    import jax

    from dl_attack_on_imagenet_tpu.attacks import ADIL
    from dl_attack_on_imagenet_tpu.data.imagenet import ImageNetFolder
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.utils import ArtifactCache

    paths, labels = jpeg_tree
    root = tmp_path / "ds"
    for p, l in zip(paths, labels):
        d = root / f"n{l:08d}"
        d.mkdir(parents=True, exist_ok=True)
        shutil.copy(p, d / os.path.basename(p))
    folder = ImageNetFolder(str(root), image_size=32)
    assert len(folder) == 12

    victim = create_model("tiny", rng=jax.random.PRNGKey(0))
    cache = ArtifactCache(str(tmp_path / "cache"))
    atk = ADIL(victim, steps=2, n_atoms=4, batch_size=8, cache=cache,
               model_name="native", seed=0, val_every=None)
    atk.learn_dictionary(folder, None)

    assert len(atk.history["loss"]) == 2
    assert all(np.isfinite(atk.history["loss"]))
    assert np.asarray(atk.dictionary).shape == (4, 32, 32, 3)
    payload = cache.load("ImageNet", model="native")
    assert payload["v"].shape == (12, 4)
