"""Executed-reference parity: ADILR solvers vs the reference's OWN code.

The torch side of every comparison here is NOT an oracle rewrite — it is
/root/reference/attacks/attacks_classes/adil_regularized.py executed
line-for-line through tests/_ref_exec.py. Both sides run in f64 on the same
tiny victim (weights mirrored via _copy_to_torch), with f32-exact hyper
values (the repo traces hypers as f32 scalars, see _hp).

Covers (VERDICT round-4 directive #1b):
  * learn_coding_vectors (adil_regularized.py:508-628), targeted + untargeted
  * adil (full-batch FB splitting, :31-197), learned + frozen dictionary
  * sadil (:200-312): exact on the accumulation-free prefix; the missing
    zero_grad makes its executed trajectory diverge at the epoch-2 v-step
    (v.grad accumulates across backwards, :268-304) — the repo implements
    the documented fresh-gradient intent (solver docstrings), so the test
    pins the CLEAN prefix exactly and measures the post-defect delta.
  * sadil_updated (:315-501): same structure (v.grad pollution from the
    D-step backward, :448-458); clean prefix = epoch 1.
  * ADILR.forward_supervised (:980-1002) — the class path end-to-end.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None
from _ref_exec import load_reference, torch_f64

from dl_attack_on_imagenet_tpu.attacks.adil_regularized import (
    ADILR,
    RegularizedConfig,
    adil_fb,
    learn_coding_vectors,
    sadil,
    sadil_updated,
)
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils.checkpoint import ArtifactCache

from test_adilr_lcv_parity import _copy_to_torch

K = 4
N = 8
# f32-exact embeddings (the repo's solvers trace hypers as f32 scalars)
LAM1 = float(np.float32(1e-3))
LAM2 = float(np.float32(0.1))


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def setup64():
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    tm = _copy_to_torch(victim).double()
    with jax.enable_x64(True):
        vars64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), victim.variables
        )
        victim64 = create_model("tiny", dtype=jnp.float64, variables=vars64)
    rng = np.random.default_rng(11)
    x = rng.random((N, 32, 32, 3), dtype=np.float32)
    y = np.arange(N) % 10
    d0 = (rng.random((K, 32, 32, 3), dtype=np.float32) * 2 - 1) * 0.1
    return victim64, tm, x, y, d0


def _dataset(tm, x, y):
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).double()
    return torch.utils.data.TensorDataset(xt, torch.from_numpy(y)), xt


def _ref_d(d0):
    """repo (K, H, W, C) -> reference (C, H, W, K), f64 torch."""
    return torch.from_numpy(d0.transpose(3, 1, 2, 0).copy()).double()


def _jax_targets(victim64, x, y, targeted):
    from dl_attack_on_imagenet_tpu.attacks.adil_regularized import _targets

    with jax.enable_x64(True):
        return _targets(
            victim64.apply_fn, victim64.variables,
            jnp.asarray(x, jnp.float64), jnp.asarray(y), targeted,
        )


# ---------------------------------------------------------------------------
# learn_coding_vectors (adil_regularized.py:508-628)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("targeted", [False, True])
@pytest.mark.parametrize("step", [1.0, 100.0])
def test_learn_coding_vectors_exec(ref, setup64, targeted, step):
    victim64, tm, x, y, d0 = setup64
    ds, _ = _dataset(tm, x, y)
    with torch_f64():
        v_ref = ref.adilr.learn_coding_vectors(
            dataset=ds, model=tm, targeted=targeted, niter=6,
            lambda_l1=LAM1, lambda_l2=LAM2, batch_size=None,
            step_size=torch.tensor(step, dtype=torch.float64), n_atom=K,
            dictionary=_ref_d(d0),
        ).numpy()

    cfg = RegularizedConfig(
        n_atoms=K, lambda_l1=LAM1, lambda_l2=LAM2, targeted=targeted,
        step_size=step, batch_size=N,
    )
    with jax.enable_x64(True):
        v = learn_coding_vectors(
            victim64.apply_fn, victim64.variables,
            jnp.asarray(d0, jnp.float64), jnp.asarray(x, jnp.float64),
            _jax_targets(victim64, x, y, targeted), cfg,
            niter=6, step_size=step,
        )
    assert np.any(v_ref != 0)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-8)


# ---------------------------------------------------------------------------
# adil — full-batch FB splitting (adil_regularized.py:31-197)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("targeted", [False, True])
def test_adil_fb_exec(ref, setup64, targeted):
    victim64, tm, x, y, d0 = setup64
    ds, _ = _dataset(tm, x, y)
    niter = 5
    with torch_f64():
        torch.manual_seed(0)
        d_ref, v_ref, loss_ref = ref.adilr.adil(
            dataset=ds, model=tm, targeted=targeted, niter=niter,
            lambdaCoding=LAM1, l2_fool=LAM2, batchsize=None, step_size=1.0,
            n_atom=K, dict_set="l2ball", device="cpu",
            dictionary=None,
        )

    cfg = RegularizedConfig(
        n_atoms=K, lambda_l1=LAM1, lambda_l2=LAM2, targeted=targeted,
        step_size=1.0, dict_set="l2ball",
    )
    # the reference seeds d from torch.randn then projects (:78-79); its
    # RNG is replayed here so both sides start from the identical draw
    with torch_f64():
        torch.manual_seed(0)
        raw = torch.randn(3, 32, 32, K).numpy()
    with jax.enable_x64(True):
        d, v, track = adil_fb(
            victim64.apply_fn, victim64.variables,
            jnp.asarray(x, jnp.float64),
            _jax_targets(victim64, x, y, targeted), cfg,
            key=jax.random.PRNGKey(0), niter=niter,
            d_init=jnp.asarray(raw.transpose(3, 1, 2, 0), jnp.float64),
        )
    np.testing.assert_allclose(
        np.asarray(d).transpose(3, 1, 2, 0), d_ref.detach().numpy(), atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(v), v_ref.detach().numpy(), atol=1e-8)
    ours_track = np.asarray(track, float)
    np.testing.assert_allclose(ours_track, loss_ref, rtol=1e-9, atol=1e-8)


def test_adil_fb_frozen_dictionary_exec(ref, setup64):
    """dictionary != None: v-only optimization (adil_regularized.py:49-56,
    :102-104, :120, :145-147)."""
    victim64, tm, x, y, d0 = setup64
    ds, _ = _dataset(tm, x, y)
    with torch_f64():
        d_ref, v_ref, loss_ref = ref.adilr.adil(
            dataset=ds, model=tm, targeted=False, niter=4,
            lambdaCoding=LAM1, l2_fool=LAM2, batchsize=None, step_size=1.0,
            n_atom=K, dict_set="l2ball", device="cpu",
            dictionary=_ref_d(d0),
        )
    cfg = RegularizedConfig(
        n_atoms=K, lambda_l1=LAM1, lambda_l2=LAM2, targeted=False,
        step_size=1.0, dict_set="l2ball",
    )
    with jax.enable_x64(True):
        d, v, track = adil_fb(
            victim64.apply_fn, victim64.variables,
            jnp.asarray(x, jnp.float64),
            _jax_targets(victim64, x, y, False), cfg,
            key=jax.random.PRNGKey(0), niter=4,
            dictionary=jnp.asarray(d0, jnp.float64),
        )
    np.testing.assert_allclose(np.asarray(v), v_ref.detach().numpy(), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(track, float), loss_ref, rtol=1e-9, atol=1e-8
    )


# ---------------------------------------------------------------------------
# sadil / sadil_updated — exact on the accumulation-free prefix
# ---------------------------------------------------------------------------


def _run_repo_sadil(solver, victim64, x, y, d0, nepochs, step):
    cfg = RegularizedConfig(
        n_atoms=K, lambda_l1=LAM1, lambda_l2=LAM2, targeted=False,
        step_size=step, batch_size=N, dict_set="l2ball",
    )
    with jax.enable_x64(True):
        d, v, losses = solver(
            victim64.apply_fn, victim64.variables, jnp.asarray(x, jnp.float64),
            _jax_targets(victim64, x, y, False), cfg,
            key=jax.random.PRNGKey(0), nepochs=nepochs,
            d_init=jnp.asarray(d0, jnp.float64),
        )
    return np.asarray(d), np.asarray(v), [float(l) for l in losses]


def test_sadil_exec_clean_prefix(ref, setup64, tmp_path):
    """Full-batch sadil: epoch 1 is accumulation-free (v.grad starts None,
    D is re-created each step), so the executed reference matches the
    repo's fresh-gradient implementation exactly through:
      - losses[0] (initial) and losses[1] (post-epoch-1),
      - D through epoch 2 (the epoch-2 D-step runs BEFORE the first
        polluted v-step, :265-284).
    The epoch-2 v-step uses v.grad accumulated across three backwards
    (:268-304) -> v and losses[2] diverge; the delta is measured and
    documented in PARITY.md (executed-reference audit)."""
    victim64, tm, x, y, _ = setup64
    ds, _ = _dataset(tm, x, y)
    with torch_f64():
        torch.manual_seed(0)
        d_ref, v_ref, _ = ref.adilr.sadil(
            dataset=ds, model=tm, targeted=False, nepochs=2, batchsize=N,
            lambdaCoding=LAM1, l2_fool=LAM2, stepsize=1.0, n_atom=K,
            dict_set="l2ball", device="cpu",
            model_file=str(tmp_path / "sadil.bin"),
        )
        _, loss_ref = torch.load(
            str(tmp_path / "sadil.bin"), weights_only=False
        )
        # the reference draws D internally (:240); replay for the repo init
        torch.manual_seed(0)
        d0 = torch.randn(3, 32, 32, K).numpy().transpose(3, 1, 2, 0)

    d2, v2, losses2 = _run_repo_sadil(sadil, victim64, x, y, d0, 2, 1.0)

    # clean prefix: initial loss + epoch-1 loss
    np.testing.assert_allclose(losses2[0], loss_ref[0], rtol=1e-9)
    np.testing.assert_allclose(losses2[1], loss_ref[1], rtol=1e-9)
    # D stays exact through epoch 2 (updated before the polluted v-step)
    np.testing.assert_allclose(
        d2.transpose(3, 1, 2, 0), d_ref.detach().numpy(), atol=1e-8
    )
    # epoch-1 state (both clean) -> v1 must match what the reference held
    # entering epoch 2; the epoch-2 v-step then diverges:
    dv = np.max(np.abs(v2 - v_ref.detach().numpy()))
    assert dv > 0, "expected the documented epoch-2 v.grad accumulation delta"


def test_sadil_exec_one_epoch_exact(ref, setup64, tmp_path):
    """nepochs=1 keeps the whole executed reference trajectory clean ->
    exact equality with the repo solver (d, v, and both loss entries)."""
    victim64, tm, x, y, d0 = setup64

    # the reference draws D internally; replay its RNG for the repo init
    with torch_f64():
        torch.manual_seed(3)
        raw = torch.randn(3, 32, 32, K).numpy()
    d0_rep = raw.transpose(3, 1, 2, 0)

    ds, _ = _dataset(setup64[1], x, y)
    with torch_f64():
        torch.manual_seed(3)
        d_ref, v_ref, _ = ref.adilr.sadil(
            dataset=ds, model=setup64[1], targeted=False, nepochs=1,
            batchsize=N, lambdaCoding=LAM1, l2_fool=LAM2, stepsize=1.0,
            n_atom=K, dict_set="l2ball", device="cpu",
            model_file=str(tmp_path / "sadil1.bin"),
        )
        _, loss_ref = torch.load(
            str(tmp_path / "sadil1.bin"), weights_only=False
        )

    d, v, losses = _run_repo_sadil(sadil, victim64, x, y, d0_rep, 1, 1.0)
    np.testing.assert_allclose(
        d.transpose(3, 1, 2, 0), d_ref.detach().numpy(), atol=1e-8
    )
    np.testing.assert_allclose(v, v_ref.detach().numpy(), atol=1e-8)
    np.testing.assert_allclose(losses, loss_ref, rtol=1e-9)


def test_sadil_updated_exec_one_epoch_exact(ref, setup64, tmp_path):
    """Full-batch sadil_updated, nepochs=1: the v-step's first backward is
    clean and the D-step reads D.grad of a fresh leaf (:448-461), so the
    executed reference matches the repo exactly. (From epoch 2 the v.grad
    pollution from the D-step backward diverges it — documented.)"""
    victim64, tm, x, y, d0 = setup64
    with torch_f64():
        torch.manual_seed(5)
        raw = torch.randn(3, 32, 32, K).numpy()
    d0_rep = raw.transpose(3, 1, 2, 0)

    ds, _ = _dataset(tm, x, y)
    with torch_f64():
        torch.manual_seed(5)
        d_ref, v_ref = ref.adilr.sadil_updated(
            dataset=ds, model=tm, targeted=False, nepochs=1, batchsize=N,
            lambdaCoding=LAM1, l2_fool=LAM2, stepsize=30.0, n_atom=K,
            dict_set="l2ball", device="cpu",
            model_file=str(tmp_path / "sadilu.bin"),
        )
        payload = torch.load(str(tmp_path / "sadilu.bin"), weights_only=False)
        loss_ref = payload[4]

    d, v, losses = _run_repo_sadil(sadil_updated, victim64, x, y, d0_rep, 1, 30.0)
    assert np.any(v_ref.detach().numpy() != 0)
    np.testing.assert_allclose(
        d.transpose(3, 1, 2, 0), d_ref.detach().numpy(), atol=1e-8
    )
    np.testing.assert_allclose(v, v_ref.detach().numpy(), atol=1e-8)
    np.testing.assert_allclose(losses, loss_ref, rtol=1e-8, atol=1e-8)


# ---------------------------------------------------------------------------
# ADILR class: forward_supervised end-to-end (adil_regularized.py:980-1002)
# ---------------------------------------------------------------------------


def test_adilr_forward_supervised_exec(ref, setup64, tmp_path, monkeypatch):
    victim64, tm, x, y, d0 = setup64
    monkeypatch.chdir(tmp_path)

    # pre-seed the reference's artifact so __init__ skips its (uncallable,
    # TypeError: learn_dictionary(model=...) vs signature (dataset, val,
    # warm_start), :689 vs :722) lazy-learn path
    import os

    os.makedirs("dict_model_ImageNet", exist_ok=True)
    model_file = (
        f"dict_model_ImageNet/ImageNet_tiny_lamCoding_{LAM1}_lamFool_{LAM2}"
        f"_num_atom_{K}_nepoch_5_param_selecting.bin"
    )
    with torch_f64():
        torch.save([_ref_d(d0), torch.zeros(N, K), [0.0]], model_file)
        atk_ref = ref.adilr.ADILR(
            tm, steps=5, lambda_l1=LAM1, lambda_l2=LAM2, targeted=True,
            attack="supervised", n_atoms=K, model_name="tiny",
        )
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).double()
        adv_ref = atk_ref(xt, torch.from_numpy(y)).numpy()

    repo_atk = ADILR(
        victim64, steps=5, lambda_l1=LAM1, lambda_l2=LAM2, targeted=True,
        attack="supervised", n_atoms=K, model_name="tiny",
        cache=ArtifactCache(str(tmp_path / "cache")),
    )
    with jax.enable_x64(True):
        repo_atk.dictionary = jnp.asarray(d0, jnp.float64)
        adv = repo_atk.forward_supervised(
            jnp.asarray(x, jnp.float64), jnp.asarray(y)
        )
    np.testing.assert_allclose(
        np.asarray(adv), adv_ref.transpose(0, 2, 3, 1), atol=1e-8
    )
    # semantics: both adversaries must drive the victim identically
    with torch.no_grad():
        pred_ref = tm(torch.from_numpy(
            np.asarray(adv_ref, np.float64).copy()
        )).argmax(-1).numpy()
    with jax.enable_x64(True):
        pred = np.asarray(jnp.argmax(
            victim64.apply_fn(victim64.variables, jnp.asarray(adv)), -1
        ))
    np.testing.assert_array_equal(pred, pred_ref)
    # the budget clamp must have engaged somewhere for this to be a real test
    assert np.max(np.abs(adv_ref - x.transpose(0, 3, 1, 2))) > 0
