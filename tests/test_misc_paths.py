"""Small coverage gaps: cli.main --image branch, load_image, auto_initialize."""

import os

import numpy as np
import pytest


@pytest.fixture()
def jpeg(tmp_path):
    from PIL import Image

    p = tmp_path / "img.JPEG"
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((50, 70, 3)) * 255).astype(np.uint8)).save(p)
    return str(p)


def test_cli_main_with_image_file(tmp_path, jpeg, monkeypatch):
    from dl_attack_on_imagenet_tpu.cli import main as main_cli

    monkeypatch.chdir(tmp_path)
    args = main_cli.build_argparser().parse_args(
        ["--model", "tiny", "--image", jpeg, "--steps-inference", "3",
         "--dict-dir", str(tmp_path / "d"), "--out", str(tmp_path / "f.png")]
    )
    out = main_cli.main(args)
    assert os.path.exists(out)


def test_imagenet_folder_load_image(tmp_path, jpeg):
    from dl_attack_on_imagenet_tpu.data.imagenet import ImageNetFolder

    # minimal tree so the folder constructor succeeds
    d = tmp_path / "ILSVRC" / "Data" / "val" / "n00000001"
    d.mkdir(parents=True)
    import shutil

    shutil.copy(jpeg, d / "a.JPEG")
    ds = ImageNetFolder(str(tmp_path), image_size=32)
    arr = ds.load_image(jpeg)
    assert arr.shape == (32, 32, 3)
    assert 0.0 <= arr.min() and arr.max() <= 1.0


def test_auto_initialize_single_host_noop(monkeypatch):
    from dl_attack_on_imagenet_tpu.parallel import auto_initialize

    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    env = auto_initialize()
    assert not env.is_distributed  # returned without touching jax.distributed


def test_key_seq():
    import jax

    from dl_attack_on_imagenet_tpu.utils import key_seq

    gen = key_seq(jax.random.PRNGKey(0))
    a, b = next(gen), next(gen)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
