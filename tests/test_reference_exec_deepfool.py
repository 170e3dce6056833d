"""Executed-reference parity: deepfool.py + universal_pert.py (the last two
runnable reference modules).

Both modules were previously unexecutable here (removed torch
`zero_gradients`, missing torchvision, hardcoded `.cuda()` —
SURVEY.md §2.4); tests/_ref_exec.py restores/stubs exactly those and the
reference's own lines run on CPU torch (f32, like the repo's deepfool,
whose logits are f32 by contract).

Covers:
  * deepfool() (attacks_classes/deepfool.py:9-69): single-image trajectory
    (r_tot, iters) vs the repo's lockstep deepfool_batch.
  * proj_lp (universal_pert.py:11-22) vs ops.linf_clamp/l2_ball_project.
  * universal_perturbation (:25-115) end-to-end vs the repo, in the regime
    where the reference's quirks are inactive by construction: ONE train
    image (shuffle order trivial on both sides) and a val split of exactly
    128 images (the reference divides its first-batch fooling count by a
    hardcoded 128, :84/:104 — with a 128-image batch that equals the
    repo's full-val rate).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None
from _ref_exec import cuda_as_identity, load_reference_deepfool

from dl_attack_on_imagenet_tpu.attacks.deepfool import deepfool_batch
from dl_attack_on_imagenet_tpu.attacks.universal_pert import (
    universal_perturbation,
)
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.ops import l2_ball_project, linf_clamp

from test_adilr_lcv_parity import _copy_to_torch


@pytest.fixture(scope="module")
def refdf():
    return load_reference_deepfool()


@pytest.fixture(scope="module")
def setup():
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    tm = _copy_to_torch(victim)  # f32 twin
    rng = np.random.default_rng(31)
    x = rng.random((1, 32, 32, 3), dtype=np.float32)
    return victim, tm, x


def test_deepfool_exec(refdf, setup):
    victim, tm, x = setup
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with cuda_as_identity():
        r_ref, iters_ref = refdf.deepfool.deepfool(
            xt, tm, num_classes=10, overshoot=0.02, max_iter=10
        )
    r_tot, iters = deepfool_batch(
        victim.apply_fn, victim.variables, jnp.asarray(x),
        num_classes=10, overshoot=0.02, max_iter=10,
    )
    assert int(iters[0]) == int(iters_ref)
    assert int(iters_ref) >= 1
    np.testing.assert_allclose(
        np.asarray(r_tot)[0],
        np.asarray(r_ref, np.float32)[0].transpose(1, 2, 0),
        atol=2e-5,
    )
    # the perturbation must actually flip the tiny victim
    pred0 = int(victim.predict(jnp.asarray(x))[0])
    pred1 = int(victim.predict(jnp.asarray(x) + r_tot)[0])
    if int(iters_ref) < 10:  # converged -> fooled by contract
        assert pred1 != pred0


def test_proj_lp_linf_exec(refdf):
    rng = np.random.default_rng(5)
    v = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    xi = 20 / 255.0
    theirs = refdf.universal.proj_lp(v.copy(), xi, np.inf)
    ours = linf_clamp(jnp.asarray(v), xi)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-7)


def test_proj_lp_l2_exec(refdf):
    """The l2 branch (`v.flatten(1)`, universal_pert.py:16) is written for
    torch tensors, but universal_perturbation carries v as NUMPY (v = v +
    dr, :77) — executing it with the loop's own type raises TypeError, so
    the reference's p=2 universal path is uncallable as written (executed
    defect, PARITY.md round-5 audit). With a torch tensor the line runs
    and the math matches ops.l2_ball_project (whole-tensor norm: the
    (1, CHW) flatten's Frobenius norm equals the full norm)."""
    rng = np.random.default_rng(5)
    v = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    xi = 20 / 255.0
    with pytest.raises(TypeError):
        refdf.universal.proj_lp(v.copy(), xi, 2)
    theirs = refdf.universal.proj_lp(torch.from_numpy(v.copy()), xi, 2)
    ours = l2_ball_project(jnp.asarray(v), xi)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-7)


def test_universal_perturbation_exec(refdf, setup, tmp_path, monkeypatch):
    victim, tm, x = setup
    monkeypatch.chdir(tmp_path)  # the reference np.saves into cwd (:112-113)
    rng = np.random.default_rng(8)
    val = rng.random((128, 32, 32, 3), dtype=np.float32)

    train_t = torch.utils.data.TensorDataset(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.zeros(1).long()
    )
    val_t = [(torch.from_numpy(val.transpose(0, 3, 1, 2)), torch.zeros(128))]
    delta, xi = 0.98, 20 / 255.0
    with cuda_as_identity():
        torch.manual_seed(0)
        v_ref = refdf.universal.universal_perturbation(
            train_t, val_t, tm, delta=delta, xi=xi, p=np.inf,
            num_classes=10, overshoot=0.02, max_iter_df=10,
        )
    v_ref = np.asarray(v_ref, np.float32)

    v, history = universal_perturbation(
        ArrayDataset(x, np.zeros(1, np.int64)),
        ArrayDataset(val, np.zeros(128, np.int64)),
        victim, delta=delta, xi=xi, p="linf",
        num_classes=10, overshoot=0.02, max_iter_df=10,
    )
    assert np.any(v_ref != 0)
    assert history, "repo must have evaluated at least one pass"
    np.testing.assert_allclose(
        np.asarray(v), v_ref[0].transpose(1, 2, 0), atol=2e-5
    )
    # same terminal fooling decision: the last recorded rate crossed 1-delta
    assert history[-1] >= 1 - delta
