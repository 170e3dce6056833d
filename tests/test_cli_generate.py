"""Batch generation CLI tests (blob and folder paths)."""

import json
import os

import jax
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.cli import generate as gen_cli


@pytest.fixture()
def trained_dict(tmp_path):
    """Pretrain a tiny dictionary artifact the CLI can pick up."""
    from dl_attack_on_imagenet_tpu.attacks import ADIL
    from dl_attack_on_imagenet_tpu.data import ArrayDataset
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.utils import ArtifactCache

    victim = create_model("tiny", rng=jax.random.PRNGKey(0))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (12, 32, 32, 3)))
    ADIL(victim, steps=2, n_atoms=4, batch_size=6,
         data_train=ArrayDataset(x, np.zeros(12, np.int64)),
         cache=ArtifactCache(str(tmp_path / "dicts")), model_name="tiny")
    return str(tmp_path / "dicts"), x


def test_generate_from_blob(tmp_path, trained_dict):
    dict_dir, x = trained_dict
    blob = str(tmp_path / "b.npz")
    np.savez_compressed(blob, images=x.astype(np.float32),
                        labels=np.zeros(12, np.int64),
                        classes=np.asarray(["a"], dtype=object))
    args = gen_cli.build_argparser().parse_args(
        ["--model", "tiny", "--blob", blob, "--out-dir", str(tmp_path / "out"),
         "--dict-dir", dict_dir, "--batch-size", "6", "--steps-inference", "3",
         "--save-images"]
    )
    summary = gen_cli.main(args)
    assert summary["total"] == 12
    assert 0.0 <= summary["fooling_rate"] <= 1.0
    out = tmp_path / "out"
    assert (out / "summary.json").exists()
    report = [json.loads(l) for l in open(out / "report.jsonl")]
    assert len(report) == 2  # two batches of 6
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == 12


def test_generate_from_folder(tmp_path, trained_dict):
    from PIL import Image

    dict_dir, _ = trained_dict
    val = tmp_path / "ImageNet" / "ILSVRC" / "Data" / "val" / "n00000001"
    val.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)).save(
            val / f"{i}.JPEG"
        )
    args = gen_cli.build_argparser().parse_args(
        ["--model", "tiny", "--data-root", str(tmp_path / "ImageNet"),
         "--out-dir", str(tmp_path / "out2"), "--dict-dir", dict_dir,
         "--batch-size", "4", "--steps-inference", "3", "--limit", "5"]
    )
    summary = gen_cli.main(args)
    assert summary["total"] == 5
    assert not any(f.endswith(".png") for f in os.listdir(tmp_path / "out2"))
