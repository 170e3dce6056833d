"""CLI entry-point tests (synthetic paths; no ILSVRC tree required)."""

import os

import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.cli import demo as demo_cli
from dl_attack_on_imagenet_tpu.cli import main as main_cli


def test_main_synthetic_image(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = main_cli.build_argparser().parse_args(
        ["--model", "tiny", "--steps-inference", "3",
         "--dict-dir", str(tmp_path / "dicts"), "--out", str(tmp_path / "fig.png")]
    )
    out = main_cli.main(args)
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000  # a real PNG was rendered


def test_demo_synthetic_pipeline(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = demo_cli.build_argparser().parse_args(
        ["--synthetic", "16", "--steps", "2", "--n-atoms", "4",
         "--steps-inference", "3", "--batch-size", "8",
         "--dict-dir", str(tmp_path / "dicts"),
         "--results-dir", str(tmp_path / "results")]
    )
    results = demo_cli.main(args)
    assert 0.0 <= results["accuracy"] <= 1.0
    key = next(iter(results["val"]["fooling_rate"]))
    assert len(results["val"]["fooling_rate"][key]) == 1
    assert any(f.endswith(".msgpack") for f in os.listdir(tmp_path / "results"))


def test_demo_distributed_mesh(tmp_path, monkeypatch, devices):
    monkeypatch.chdir(tmp_path)
    args = demo_cli.build_argparser().parse_args(
        ["--synthetic", "16", "--steps", "2", "--n-atoms", "4",
         "--steps-inference", "3", "--batch-size", "8", "--distributed",
         "--dict-dir", str(tmp_path / "dicts"),
         "--results-dir", str(tmp_path / "results")]
    )
    results = demo_cli.main(args)
    assert "val" in results
