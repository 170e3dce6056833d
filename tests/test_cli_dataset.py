"""Dataset CLI + SLURM nodelist expansion tests."""

import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.cli import dataset as ds_cli
from dl_attack_on_imagenet_tpu.parallel.dist import expand_first_host


@pytest.fixture()
def fake_ilsvrc(tmp_path):
    from PIL import Image

    root = tmp_path / "ImageNet"
    val = root / "ILSVRC" / "Data" / "val"
    rng = np.random.default_rng(0)
    for w in ["n01440764", "n01443537"]:
        d = val / w
        d.mkdir(parents=True)
        for i in range(3):
            arr = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{w}_{i}.JPEG")
    (root / "ILSVRC" / "LOC_synset_mapping.txt").write_text(
        "n01440764 tench, Tinca tinca\nn01443537 goldfish\n"
    )
    return str(root)


def test_dataset_cli_roundtrip(fake_ilsvrc, tmp_path):
    out = str(tmp_path / "blob.npz")
    args = ds_cli.build_argparser().parse_args(
        ["--root", fake_ilsvrc, "--split", "val", "--out", out,
         "--image-size", "32"]
    )
    path = ds_cli.main(args)
    ds, classes = ds_cli.load_blob(path)
    assert len(ds) == 6
    assert ds.images.shape == (6, 32, 32, 3)
    assert classes == ["tench", "goldfish"]
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0


def test_dataset_cli_limit(fake_ilsvrc, tmp_path):
    out = str(tmp_path / "blob.npz")
    args = ds_cli.build_argparser().parse_args(
        ["--root", fake_ilsvrc, "--out", out, "--image-size", "32",
         "--limit", "2", "--no-native"]
    )
    ds, _ = ds_cli.load_blob(ds_cli.main(args))
    assert len(ds) == 2


@pytest.mark.parametrize(
    "nodelist,expected",
    [
        ("node001", "node001"),
        ("node001,node002", "node001"),
        ("node[001-004]", "node001"),
        ("gpu[7,9-12],other[1-2]", "gpu7"),
        ("n[12-14]suffix", "n12"),
    ],
)
def test_expand_first_host(nodelist, expected):
    assert expand_first_host(nodelist) == expected
