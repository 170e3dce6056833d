"""Health-check and metric-logging aux subsystem tests."""

import json

import numpy as np

from dl_attack_on_imagenet_tpu.parallel import check_mesh, data_mesh
from dl_attack_on_imagenet_tpu.utils import MetricLogger


def test_check_mesh_healthy(devices):
    out = check_mesh(data_mesh(8))
    assert out["ok"]
    assert out["n_devices"] == 8
    assert out["psum"] == out["expected"] == 36.0


def test_check_mesh_subset(devices):
    out = check_mesh(data_mesh(4))
    assert out["ok"] and out["expected"] == 10.0


def test_metric_logger_roundtrip(tmp_path):
    log = MetricLogger(str(tmp_path / "m.jsonl"))
    log.log(0, loss=1.5, fooling=0.1)
    log.log(1, loss=np.float32(1.2), note="text")
    records = log.read()
    assert len(records) == 2
    assert records[0]["loss"] == 1.5
    assert records[1]["loss"] == 1.2000000476837158 or abs(records[1]["loss"] - 1.2) < 1e-6
    assert records[1]["note"] == "text"
    # file is valid JSONL
    for line in open(tmp_path / "m.jsonl"):
        json.loads(line)


def test_metric_logger_noop():
    log = MetricLogger(None)
    log.log(0, loss=1.0)  # must not raise
    assert log.read() == []
