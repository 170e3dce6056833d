"""Executed-reference parity: model_accuracy.py.

Previously listed as "not executable (imports torchmetrics)". The serial
path only touches the torchmetrics v0.x ``Accuracy`` surface —
update/compute/reset — which _ref_exec stubs faithfully (in torchmetrics
>=1.0 the reference's no-arg ``Accuracy()`` raises: ``task`` became a
required argument, so the file is uncallable against current releases
regardless). The distributed path still needs CUDA+NCCL, but its entry
wrapper executes up to its own defect.

Covers:
  * ``model_accuracy`` (model_accuracy.py:50-63): b128-loader accuracy of
    the shared tiny victim vs the repo's ``metrics.model_accuracy`` —
    exact equality on 200 images (including a non-multiple-of-128 tail).
  * ``run_accuracy_computing`` (:12-16): executed defect — it CALLS
    ``model_accuracy_distributed()`` with no arguments when building the
    mp.spawn target (:15), so the distributed launcher TypeErrors before
    any process spawns. The repo's sharded path
    (``metrics.model_accuracy_sharded``) has no such wrapper.
"""

import sys

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None
from _ref_exec import load_reference_accuracy

from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.evaluation import metrics
from dl_attack_on_imagenet_tpu.models import create_model

from test_adilr_lcv_parity import _copy_to_torch


@pytest.fixture(scope="module")
def refacc():
    return load_reference_accuracy()


def test_model_accuracy_exec(refacc):
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    tm = _copy_to_torch(victim)
    rng = np.random.default_rng(17)
    x = rng.random((200, 32, 32, 3), dtype=np.float32)  # 128 + 72 tail
    # half the labels are the victim's own predictions (so accuracy is
    # bounded away from both 0 and 1), half random
    pred = np.asarray(victim.predict(x))
    y = pred.copy()
    y[100:] = rng.integers(0, 10, 100)

    ds_t = torch.utils.data.TensorDataset(
        torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
        torch.from_numpy(y.astype(np.int64)),
    )
    theirs = float(refacc.model_accuracy.model_accuracy(ds_t, tm))
    ours = float(metrics.model_accuracy(ArrayDataset(x, y), victim))
    assert 0.3 < theirs < 1.0
    assert ours == pytest.approx(theirs, abs=1e-7)


def test_run_accuracy_computing_defect(refacc):
    """model_accuracy.py:15 invokes the worker fn instead of passing it —
    TypeError before mp.spawn ever runs."""
    with pytest.raises(TypeError):
        refacc.model_accuracy.run_accuracy_computing(None, [], None)
