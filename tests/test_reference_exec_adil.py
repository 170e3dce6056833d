"""Executed-reference parity: the ADIL class vs the reference's OWN code.

The reference ADIL (attacks/attacks_classes/adil.py) is executed through
the torchattacks/SLURM stubs in tests/_ref_exec.py; every comparison here
runs its actual lines in f64 against the repo's adil_core on the same tiny
victim, with the reference's internal torch RNG draws replayed so both
sides share initializations and sampled codes.

Covers (VERDICT round-4 directive #1c):
  * f_loss (adil.py:103-112) vs ops.cw_margin_loss, both _targeted modes
  * projection_v / projection_d (:625-642) vs ops.project_codes/
    project_dictionary, both norms
  * learn_dictionary_a (:114-210): full 3-epoch trajectory — losses,
    fooling counts, epoch val fooling (via forward_supervised_AdamW
    'train'), final (D, v) — vs adil_core's projected-AdamW trainer
  * forward_supervised_DDrague (:508-567) vs core.supervised_ddrague
  * forward_supervised_AdamW (:569-623) vs core.supervised_adamw_codes
    ('train' fooling count + 'attack' adversary)
  * forward_unsupervised (:460-506): trial codes replayed through
    core.unsupervised_sample(v_trials=...); the tuple-return defect
    (SURVEY.md §2.4) executed and asserted
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None
from _ref_exec import IndexedDataset, load_reference, torch_f64

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.attacks import adil_core as core
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.ops import (
    cw_margin_loss,
    project_codes,
    project_dictionary,
)

from test_adilr_lcv_parity import _copy_to_torch

K = 4
N = 8
NVAL = 4
EPS = 8 / 255
LR = 0.01


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
    rng = np.random.default_rng(21)
    x = rng.random((N, 32, 32, 3), dtype=np.float32)
    xval = rng.random((NVAL, 32, 32, 3), dtype=np.float32)
    y = np.arange(N) % 10
    yval = np.arange(NVAL) % 10
    d0 = (rng.random((K, 32, 32, 3), dtype=np.float32) * 2 - 1) * 0.5
    return victim64, tm, x, y, xval, yval, d0


def _make_ref_adil(ref, tm, tmp_path, monkeypatch, **kw):
    """Reference ADIL with the artifact pre-seeded so __init__ skips
    training (adil.py:94-101); methods are then driven directly."""
    monkeypatch.chdir(tmp_path)
    os.makedirs("trained_dicts", exist_ok=True)
    name = kw.pop("model_name", "tiny")
    torch.save([torch.zeros(1)], f"trained_dicts/ImageNet_{name}.bin")
    return ref.adil.ADIL(tm, eps=EPS, model_name=name, **kw)


def _chw(x):
    return torch.from_numpy(x.transpose(0, 3, 1, 2)).double()


# ---------------------------------------------------------------------------
# f_loss / projections
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("targeted", [False, True])
def test_f_loss_exec(ref, setup64, tmp_path, monkeypatch, targeted):
    _, tm, x, y, _, _, _ = setup64
    atk = _make_ref_adil(ref, tm, tmp_path, monkeypatch, kappa=50)
    atk._targeted = targeted
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((N, 10)) * 30  # some margins beyond kappa
    with torch_f64():
        theirs = atk.f_loss(torch.from_numpy(logits), torch.from_numpy(y)).numpy()
    with jax.enable_x64(True):
        ours = cw_margin_loss(
            jnp.asarray(logits), jnp.asarray(y), kappa=50.0, targeted=targeted
        )
    assert np.any(theirs == -50.0) or np.any(theirs > -50.0)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-10)


@pytest.mark.parametrize("norm", ["linf", "l2"])
def test_projection_v_d_exec(ref, setup64, tmp_path, monkeypatch, norm):
    _, tm, _, _, _, _, _ = setup64
    atk = _make_ref_adil(ref, tm, tmp_path, monkeypatch, norm=norm,
                         model_name=f"tiny_{norm}")
    rng = np.random.default_rng(2)
    v = rng.standard_normal((N, K))
    d = rng.standard_normal((3, 8, 8, K)) * 2
    with torch_f64():
        v_ref = atk.projection_v(torch.from_numpy(v.copy())).numpy()
        d_ref = atk.projection_d(torch.from_numpy(d.copy())).numpy()
    with jax.enable_x64(True):
        v_ours = project_codes(jnp.asarray(v), EPS, norm)
        d_ours = project_dictionary(
            jnp.asarray(d.transpose(3, 1, 2, 0)), norm
        )
    np.testing.assert_allclose(np.asarray(v_ours), v_ref, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(d_ours).transpose(3, 1, 2, 0), d_ref, atol=1e-10
    )


# ---------------------------------------------------------------------------
# learn_dictionary_a — the gd trainer (adil.py:114-210)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("loss", ["ce", "logits"])
def test_learn_dictionary_a_exec(ref, setup64, tmp_path, monkeypatch, loss):
    victim64, tm, x, y, xval, yval, _ = setup64
    steps = 3
    atk = _make_ref_adil(
        ref, tm, tmp_path, monkeypatch, loss=loss, steps=steps,
        n_atoms=K, batch_size=N, step_size=LR, kappa=50,
        model_name=f"tiny_ld_{loss}",
    )
    train = IndexedDataset(_chw(x), torch.from_numpy(y))
    val = IndexedDataset(_chw(xval), torch.from_numpy(yval))
    with torch_f64():
        torch.manual_seed(0)
        atk.learn_dictionary_a(train, val, warm_start=False)
        d_ref, v_ref, loss_all, fooling_all, val_fool = torch.load(
            atk.model_file, weights_only=False
        )
        # replay the reference's init draws (:148-150)
        torch.manual_seed(0)
        d0 = (-1 + 2 * torch.rand(3, 32, 32, K)).numpy()
        v0_raw = torch.rand(N, K).numpy()

    cfg = AdilConfig(
        eps=EPS, norm="linf", n_atoms=K, loss=loss, kappa=50.0,
        step_size=LR, batch_size=N, steps=steps, steps_code=100, tol=1e-6,
    )
    with jax.enable_x64(True):
        x64 = jnp.asarray(x, jnp.float64)
        xval64 = jnp.asarray(xval, jnp.float64)
        v_init = project_codes(jnp.asarray(v0_raw, jnp.float64), EPS, "linf")
        state = core.init_state(
            jax.random.PRNGKey(0), (32, 32, 3), N, cfg,
            d_init=jnp.asarray(d0.transpose(3, 1, 2, 0), jnp.float64),
        )
        state = state.replace(v=v_init)
        opt = core.make_optimizer(LR)
        state = state.replace(opt_state=opt.init({"d": state.d, "v": state.v}))
        labels = core.predict_labels(victim64.apply_fn, victim64.variables, x64)
        step = core.make_train_step(victim64.apply_fn, cfg, "both")
        idx = jnp.arange(N)
        mask = jnp.ones((N,), jnp.float64)
        ours_losses, ours_fooling, ours_val = [], [], []
        for _ in range(steps):
            state, l, f = step(state, victim64.variables, x64, labels, idx, mask)
            ours_losses.append(float(l) / N)
            ours_fooling.append(float(f) / N)
            d_img = core.d_image(state.d, (32, 32, 3))
            fool = core.supervised_adamw_codes(
                victim64.apply_fn, victim64.variables, d_img, xval64, cfg,
                return_fooling=True,
            )
            ours_val.append(float(fool) / NVAL)

    np.testing.assert_allclose(ours_losses, loss_all, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(ours_fooling, fooling_all, atol=0)
    # the saved artifact keeps only the LAST epoch's val fooling (:205-210)
    np.testing.assert_allclose(ours_val[-1], float(val_fool), atol=0)
    with jax.enable_x64(True):
        d_final = np.asarray(core.d_image(state.d, (32, 32, 3)))
    np.testing.assert_allclose(
        d_final.transpose(3, 1, 2, 0), d_ref.numpy(), atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(state.v), v_ref.numpy(), atol=1e-8)


# ---------------------------------------------------------------------------
# Inference paths
# ---------------------------------------------------------------------------


def test_forward_supervised_ddrague_exec(ref, setup64, tmp_path, monkeypatch):
    victim64, tm, x, y, _, _, d0 = setup64
    atk = _make_ref_adil(
        ref, tm, tmp_path, monkeypatch, n_atoms=K, steps_inference=10,
        model_name="tiny_ddr",
    )
    d_t = torch.from_numpy(d0.transpose(3, 1, 2, 0).copy()).double()
    with torch_f64():
        adv_ref = atk.forward_supervised_DDrague(
            _chw(x), torch.from_numpy(y), d_t
        ).detach().numpy()

    cfg = AdilConfig(
        eps=EPS, norm="linf", n_atoms=K, loss="ce", steps_inference=10,
        tol=1e-6,
    )
    with jax.enable_x64(True):
        adv = core.supervised_ddrague(
            victim64.apply_fn, victim64.variables,
            jnp.asarray(d0, jnp.float64), jnp.asarray(x, jnp.float64), cfg,
        )
    assert np.max(np.abs(adv_ref - x.transpose(0, 3, 1, 2))) > 1e-4
    np.testing.assert_allclose(
        np.asarray(adv), adv_ref.transpose(0, 2, 3, 1), atol=1e-7
    )


@pytest.mark.parametrize("mode", ["train", "attack"])
def test_forward_supervised_adamw_exec(ref, setup64, tmp_path, monkeypatch, mode):
    victim64, tm, x, y, _, _, d0 = setup64
    atk = _make_ref_adil(
        ref, tm, tmp_path, monkeypatch, n_atoms=K, model_name="tiny_adamw",
    )
    d_t = torch.from_numpy(d0.transpose(3, 1, 2, 0).copy()).double()
    with torch_f64():
        out_ref = atk.forward_supervised_AdamW(
            _chw(x), torch.from_numpy(y), d_t, mode
        )

    cfg = AdilConfig(
        eps=EPS, norm="linf", n_atoms=K, loss="ce", steps_code=100, tol=1e-6,
    )
    with jax.enable_x64(True):
        out = core.supervised_adamw_codes(
            victim64.apply_fn, victim64.variables,
            jnp.asarray(d0, jnp.float64), jnp.asarray(x, jnp.float64), cfg,
            return_fooling=(mode == "train"),
        )
    if mode == "train":
        assert int(out) == int(out_ref)
    else:
        np.testing.assert_allclose(
            np.asarray(out),
            out_ref.detach().numpy().transpose(0, 2, 3, 1),
            atol=1e-7,
        )


def test_forward_unsupervised_exec(ref, setup64, tmp_path, monkeypatch):
    """Replay the reference's sampled codes through the repo's selection
    scan. trials=1 keeps the reference's bookkeeping quirk (adil.py:494-504,
    fixed-by-intent in the repo) out of play -> exact equality; the
    (tensor, list) tuple-return defect is executed and asserted."""
    victim64, tm, x, y, _, _, d0 = setup64
    trials = 1
    atk = _make_ref_adil(
        ref, tm, tmp_path, monkeypatch, n_atoms=K, trials=trials,
        model_name="tiny_unsup",
    )
    atk.dictionary = torch.from_numpy(d0.transpose(3, 1, 2, 0).copy()).double()
    with torch_f64():
        torch.manual_seed(9)
        ret = atk.forward_unsupervised(_chw(x))
        assert isinstance(ret, tuple) and len(ret) == 2  # §2.4 defect, executed
        adv_ref, dv_norms = ret
        adv_ref = adv_ref.numpy()
        # replay the sampler draws (:478 consumes RNG once per trial)
        torch.manual_seed(9)
        vs = np.stack([atk.sample_sphere(N).numpy() for _ in range(trials)])

    cfg = AdilConfig(eps=EPS, norm="linf", n_atoms=K, trials=trials)
    with jax.enable_x64(True):
        adv = core.unsupervised_sample(
            victim64.apply_fn, victim64.variables,
            jnp.asarray(d0, jnp.float64), jnp.asarray(x, jnp.float64),
            jax.random.PRNGKey(0), cfg,
            v_trials=jnp.asarray(vs, jnp.float64),
        )
    assert len(dv_norms) == N and max(dv_norms) <= EPS + 1e-12
    np.testing.assert_allclose(
        np.asarray(adv), adv_ref.transpose(0, 2, 3, 1), atol=1e-10
    )
