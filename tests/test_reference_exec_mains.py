"""Executed-reference parity: main.py + demo_dL_attack.py (the entry
scripts — completing 'every reference Python file executes').

Both scripts import-execute fully (their argparse sits under the
``__main__`` guard; torchvision.models is an empty stub since the
pretrained constructors are only reached past the CUDA guard), and both
``main(args)`` bodies execute to their own first branch: they REQUIRE
CUDA (main.py:30-32, demo_dL_attack.py:30-32) and return after a print on
any other host — the reference entry points cannot run at all on
CPU/TPU machines, which the repo's cli.main/cli.demo do (executed
environmental boundary of record).

Also executes the one real computational member both scripts define —
the ``Normalize`` module (main.py:16-25 / demo_dL_attack.py:16-26) — and
pins the repo's NHWC in-graph ``models.layers.Normalize`` against it.
"""

import importlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None
from _ref_exec import REF_ROOT, _install_stubs

import jax

from dl_attack_on_imagenet_tpu.models.layers import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    Normalize,
)


@pytest.fixture(scope="module")
def refmains():
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import types

    main_mod = importlib.import_module("main")
    demo_mod = importlib.import_module("demo_dL_attack")
    return types.SimpleNamespace(main=main_mod, demo=demo_mod)


class _Args:
    model = "resnet"
    distributed = False


def test_entry_mains_cuda_guard_exec(refmains, capsys):
    """Both main() bodies execute and bail at their CUDA requirement —
    the reference has no CPU path at all (the repo's CLIs run anywhere)."""
    assert not torch.cuda.is_available()
    assert refmains.main.main(_Args()) is None
    assert refmains.demo.main(_Args()) is None
    out = capsys.readouterr().out
    assert out.count("Check cuda setting") == 2


@pytest.mark.parametrize("which", ["main", "demo"])
def test_normalize_exec(refmains, which):
    """The scripts' Normalize module (NCHW) vs the repo's in-graph NHWC
    Normalize — identical math, identical constants."""
    ref_cls = getattr(refmains, which).Normalize
    norm = ref_cls(mean=list(IMAGENET_MEAN), std=list(IMAGENET_STD))
    rng = np.random.default_rng(9)
    x = rng.random((2, 3, 8, 8), dtype=np.float32)
    theirs = norm(torch.from_numpy(x.copy())).numpy()

    layer = Normalize()
    y = layer.apply({}, x.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), theirs, atol=1e-7
    )
