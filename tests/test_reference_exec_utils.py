"""Executed-reference parity: ops/ and evaluation/ vs the reference's OWN code.

Unlike the oracle tests (test_torch_parity*, test_adilr_*_parity), the
"reference side" here is not a rewrite — it is the actual functions in
/root/reference executed through the stubs in tests/_ref_exec.py
(torchattacks base class + SLURM env, the only import blockers). Every
assertion therefore pins the repo against the reference's own lines.

Covers (VERDICT round-4 directive #1a):
  * attacks/utils.py:21-41  project_onto_l1_ball  vs ops.l1_ball_project
  * attacks/utils.py:44-57  constraint_dict       vs ops.project_atoms
  * attacks/utils.py:159-161 get_prox_l1          vs ops.soft_threshold
  * attacks/utils.py:17-18  clamp_image           vs ops.clamp_image
  * attacks/utils.py:153-156 get_slices           (slicing convention)
  * attacks/utils.py:164-174 get_target           vs attacks.base targets
  * attacks/utils.py:60-150 fit_laplace (4 modes) vs ops.laplace
  * performance.py:6-37     get_args              vs evaluation.expand_grid
  * performance.py:116-177, :51-110, :238-266     vs evaluation.harness
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None
from _ref_exec import load_reference

from dl_attack_on_imagenet_tpu import ops
from dl_attack_on_imagenet_tpu.evaluation import harness as ev
from dl_attack_on_imagenet_tpu.ops import laplace as lap
from dl_attack_on_imagenet_tpu.models import create_model

from test_torch_parity import TorchTiny  # noqa: reuse the torch twin
from test_adilr_lcv_parity import _copy_to_torch


@pytest.fixture(scope="module")
def ref():
    return load_reference()


# ---------------------------------------------------------------------------
# Projections / prox (attacks/utils.py:17-57, :159-161)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("eps", [8 / 255, 1.0, 5.0])
def test_l1_ball_project_exec(ref, eps):
    rng = np.random.default_rng(0)
    # mix of inside-ball and outside-ball rows, and a zero row
    x = rng.standard_normal((6, 40)).astype(np.float32)
    x[1] *= 1e-3
    x[4] = 0.0
    theirs = ref.utils.project_onto_l1_ball(torch.from_numpy(x.copy()), eps)
    ours = ops.l1_ball_project(jnp.asarray(x), eps)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


def test_l1_ball_project_exec_4d(ref):
    # the reference flattens per leading row (x.view(b, -1)); our (N, K)
    # contract flattens leading axes -> compare on the same row view
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    theirs = ref.utils.project_onto_l1_ball(torch.from_numpy(x.copy()), 0.7)
    ours = ops.l1_ball_project(jnp.asarray(x.reshape(4, -1)), 0.7).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


@pytest.mark.parametrize("constr", ["l2sphere", "l2ball", "l1ball"])
def test_constraint_dict_exec(ref, constr):
    rng = np.random.default_rng(2)
    # reference layout (C, H, W, K); ours atoms-first (K, H, W, C)
    d_ref = rng.standard_normal((3, 6, 6, 5)).astype(np.float32)
    # include one tiny atom so the l2ball no-op branch is hit
    d_ref[..., 2] *= 1e-3
    theirs = ref.utils.constraint_dict(
        torch.from_numpy(d_ref.copy()), constr_set=constr
    ).numpy()
    ours = ops.project_atoms(
        jnp.asarray(d_ref.transpose(3, 1, 2, 0)), constraint=constr
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(3, 1, 2, 0), theirs, atol=2e-6
    )


def test_soft_threshold_exec(ref):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 7)).astype(np.float32)
    lam = 0.3
    theirs = ref.utils.get_prox_l1(lam)(torch.from_numpy(x)).numpy()
    ours = ops.soft_threshold(jnp.asarray(x), lam)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-7)


def test_clamp_image_exec(ref):
    x = np.linspace(-0.5, 1.5, 24, dtype=np.float32).reshape(2, 3, 2, 2)
    theirs = ref.utils.clamp_image(torch.from_numpy(x)).numpy()
    ours = ops.clamp_image(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), theirs)


def test_get_slices_exec(ref):
    # our batching pads the ragged tail; the slicing boundaries must agree
    slices = ref.utils.get_slices(10, 4)
    assert slices == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]


def test_get_target_exec(ref):
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    tm = _copy_to_torch(victim)
    rng = np.random.default_rng(4)
    x = rng.random((6, 32, 32, 3), dtype=np.float32)
    y = np.array([0, 1, 2, 3, 4, 5])
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    # untargeted: labels pass through
    out_u = ref.utils.get_target(xt, torch.from_numpy(y), False, tm)
    np.testing.assert_array_equal(out_u.numpy(), y)
    # targeted: 2nd most probable class
    out_t = ref.utils.get_target(xt, torch.from_numpy(y), True, tm).numpy()
    logits = np.asarray(victim(jnp.asarray(x)))
    ours_t = np.argsort(logits, axis=-1)[:, -2]
    np.testing.assert_array_equal(ours_t, out_t)


# ---------------------------------------------------------------------------
# Laplace fits (attacks/utils.py:60-150) vs ops/laplace.py
# ---------------------------------------------------------------------------


class _BucketModel(torch.nn.Module):
    """Deterministic classifier: argmax = clip(floor(mean(x) * C), 0, C-1).

    The reference's 'predictions_atoms' fit indexes per-class stacks by raw
    prediction id with n_classes = len(unique(dataset labels))
    (utils.py:75-91) — it only works when predictions form a contiguous
    {0..C-1} covered by the labels, which this model makes controllable.
    """

    def __init__(self, n_classes=3):
        super().__init__()
        self.n = n_classes

    def forward(self, x):
        b = x.shape[0]
        idx = (x.reshape(b, -1).mean(1) * self.n).floor().long().clamp(0, self.n - 1)
        out = torch.zeros(b, self.n)
        out[torch.arange(b), idx] = 1.0
        return out

    def parameters(self):  # keep next(model.parameters()) well-defined
        return iter([torch.nn.Parameter(torch.zeros(1))])


def _bucket_predict(x_nhwc: np.ndarray, n_classes=3) -> np.ndarray:
    m = x_nhwc.reshape(x_nhwc.shape[0], -1).mean(1)
    return np.clip(np.floor(m * n_classes), 0, n_classes - 1).astype(np.int64)


@pytest.fixture(scope="module")
def laplace_setup():
    rng = np.random.default_rng(5)
    n, k, c = 24, 4, 3
    v = rng.standard_normal((n, k)).astype(np.float32)
    # images whose means spread predictions over all 3 classes, >=2 each
    x = np.repeat(rng.random((n, 1, 1, 1)), 3 * 4 * 4).reshape(n, 3, 4, 4)
    x = x.astype(np.float32)
    preds = _bucket_predict(x.transpose(0, 2, 3, 1), c)
    assert all((preds == i).sum() >= 2 for i in range(c))
    labels = np.concatenate([np.arange(c)] * (n // c)).astype(np.int64)
    return v, x, labels, preds, c


def test_fit_laplace_exec_all_modes(ref, laplace_setup):
    v, x, labels, preds, c = laplace_setup
    model = _BucketModel(c)
    dataset = torch.utils.data.TensorDataset(
        torch.from_numpy(x), torch.from_numpy(labels)
    )
    mean_ref, scale_ref = ref.utils.fit_laplace(
        torch.from_numpy(v), dataset, model
    )

    # 'none': single (loc, scale) over the flattened codes (utils.py:132-137)
    loc, scale = lap.laplace_fit(v.reshape(-1))
    np.testing.assert_allclose(float(loc), mean_ref["none"], rtol=1e-6)
    np.testing.assert_allclose(float(scale), scale_ref["none"], rtol=1e-6)

    # 'atoms': per-atom columns (utils.py:128-130, :140-150)
    loc_a, scale_a = lap.laplace_fit_per_atom(v)
    np.testing.assert_allclose(
        np.asarray(loc_a), np.asarray(mean_ref["atoms"], np.float32), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(scale_a), np.asarray(scale_ref["atoms"], np.float32),
        rtol=1e-5,
    )

    # 'labels_atoms' / 'predictions_atoms': per-class per-atom
    for mode, groups in (("labels_atoms", labels), ("predictions_atoms", preds)):
        loc_g, scale_g = lap.laplace_fit_conditioned(v, groups, c)
        ref_loc = np.asarray(mean_ref[mode], np.float32)  # (C, K) lists
        ref_scale = np.asarray(scale_ref[mode], np.float32)
        np.testing.assert_allclose(loc_g, ref_loc, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(scale_g, ref_scale, rtol=1e-5, atol=1e-6)


def test_fit_laplace_min_scale_exec(ref):
    # constant columns hit the min_scale floor on both sides
    v = np.ones((8, 3), dtype=np.float32)
    loc, scale = lap.laplace_fit_per_atom(v)
    with torch.no_grad():
        mean_ref, scale_ref = ref.utils.fit_laplace_multivariate(
            torch.from_numpy(v), min_scale=1e-3
        )
    np.testing.assert_allclose(np.asarray(loc), mean_ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(scale), scale_ref, atol=1e-7)
    assert np.all(np.asarray(scale) == np.float32(1e-3))


# ---------------------------------------------------------------------------
# Harness math (performance.py) vs evaluation/harness.py
# ---------------------------------------------------------------------------


def test_get_args_exec(ref):
    # 0..3 swept variables: the reference's manual nesting vs our n-ary
    # product must enumerate identical combos in identical order
    cases = [
        (),
        ("a", [1, 2]),
        ("a", [1, 2], "b", ["x", "y"]),
        ("a", [1, 2], "b", ["x"], "c", [0.1, 0.2, 0.3]),
    ]
    for args in cases:
        assert ev.expand_grid(*args) == ref.performance.get_args(list(args))


def test_compute_metrics_exec(ref):
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    tm = _copy_to_torch(victim)
    rng = np.random.default_rng(6)
    clean = rng.random((8, 32, 32, 3), dtype=np.float32)
    adv = np.clip(clean + rng.normal(0, 0.1, clean.shape).astype(np.float32), 0, 1)

    clean_t = torch.from_numpy(clean.transpose(0, 3, 1, 2))
    adv_t = torch.from_numpy(adv.transpose(0, 3, 1, 2))

    from dl_attack_on_imagenet_tpu.evaluation import metrics as em

    for red in ("sum", "mean"):
        fr_ref = ref.performance.compute_fooling_rate(tm, adv_t, clean_t, red)
        fr = em.compute_fooling_rate(victim, jnp.asarray(adv), jnp.asarray(clean),
                                     reduction=red)
        np.testing.assert_allclose(float(fr), fr_ref, atol=1e-6)
        np.testing.assert_allclose(
            float(em.compute_rmse(jnp.asarray(adv), jnp.asarray(clean), red)),
            ref.performance.compute_rmse(adv_t, clean_t, red), rtol=1e-5)
        np.testing.assert_allclose(
            float(em.compute_mse(jnp.asarray(adv), jnp.asarray(clean), red)),
            ref.performance.compute_mse(adv_t, clean_t, red), rtol=1e-5)


class _TorchStubAttack:
    """Deterministic 'attack' for executing the reference harness: adds a
    fixed pattern at a given scale. Carries the attrs performance.py reads
    (.device at :159; .n_atoms/.loss for the 'adil' sub_name at :134-135)."""

    def __init__(self, pattern, scale):
        self.pattern = torch.from_numpy(pattern)
        self.scale = scale
        self.device = torch.device("cpu")
        self.n_atoms = 4
        self.loss = "ce"

    def __call__(self, x, y):
        return torch.clamp(x + self.scale * self.pattern[: x.shape[0]], 0, 1)


class _JaxStubAttack:
    def __init__(self, pattern, scale):
        self.pattern = jnp.asarray(pattern.transpose(0, 2, 3, 1))
        self.scale = scale
        self.n_atoms = 4
        self.loss = "ce"

    def __call__(self, x, y):
        return jnp.clip(x + self.scale * self.pattern[: x.shape[0]], 0, 1)


@pytest.fixture(scope="module")
def harness_setup():
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    tm = _copy_to_torch(victim)
    rng = np.random.default_rng(7)
    x = rng.random((16, 32, 32, 3), dtype=np.float32)
    pred = np.asarray(victim.predict(jnp.asarray(x)))
    # half the rows correctly labeled, half mislabeled -> the filter engages
    y = pred.copy()
    y[::2] = (y[::2] + 1) % 10
    pattern = rng.normal(0, 1, (16, 3, 32, 32)).astype(np.float32)
    scales = [0.02, 0.2, 0.6]
    return victim, tm, x, y, pattern, scales


def _batches_torch(x, y, bsz):
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = torch.from_numpy(y)
    return [(xt[i : i + bsz], yt[i : i + bsz]) for i in range(0, len(y), bsz)]


def _batches_jax(x, y, bsz):
    return [(x[i : i + bsz], y[i : i + bsz]) for i in range(0, len(y), bsz)]


def test_performance_exec(ref, harness_setup):
    """performance.py:154-177 executed vs evaluation.harness.performance:
    same correctly-classified filtering, same per-image metric sums."""
    victim, tm, x, y, pattern, scales = harness_setup
    atk_t = _TorchStubAttack(pattern, scales[2])
    atk_j = _JaxStubAttack(pattern, scales[2])
    perf_ref = ref.performance.performance(atk_t, tm, _batches_torch(x, y, 8))
    perf = ev.performance(atk_j, victim, _batches_jax(x, y, 8))
    for k in ("fooling_rate", "rmse", "mse"):
        np.testing.assert_allclose(
            float(perf[k]), float(perf_ref[k]), rtol=1e-4, atol=1e-6
        )


def test_get_performance_exec(ref, harness_setup):
    """performance.py:116-151 executed: per-combo metric lists under the
    'adil' sub_name (the only group name its sub_name path supports)."""
    victim, tm, x, y, pattern, scales = harness_setup
    atks_t = {"adil": [_TorchStubAttack(pattern, s) for s in scales]}
    atks_j = {"adil": [_JaxStubAttack(pattern, s) for s in scales]}
    val_ref = ref.performance.get_performance(atks_t, tm, _batches_torch(x, y, 8))
    val = ev.get_performance(atks_j, victim, _batches_jax(x, y, 8))
    key_ref = next(iter(val_ref["mse"]))
    key = val["group_key"]["adil"]
    for m in ("fooling_rate", "rmse", "mse"):
        np.testing.assert_allclose(
            np.asarray(val[m][key], float),
            np.asarray(val_ref[m][key_ref], float),
            rtol=1e-4, atol=1e-6,
        )
    assert len(val["time"][key]) == len(val_ref["time"][key_ref]) == len(scales)


def test_select_hyperparameter_exec_defect(ref, harness_setup):
    """Latent defect found by EXECUTING the reference (not in SURVEY §2.4):
    select_hyperparameter indexes ``atks_hyper[key]`` with the sub_name
    built by get_performance ('adil_atoms_..', performance.py:134-135,
    :146) while ``atks_hyper`` is keyed by the caller's group name
    (demo_dL_attack.py:114-118 uses 'adil') -> guaranteed KeyError at
    performance.py:106 for EVERY input. The repo fixes this with the
    explicit group_key mapping (evaluation/harness.py). PARITY.md,
    executed-reference audit."""
    victim, tm, x, y, pattern, scales = harness_setup
    atks_t = {"adil": [_TorchStubAttack(pattern, s) for s in scales]}
    with pytest.raises(KeyError):
        ref.performance.select_hyperparameter(
            atks_t, tm, _batches_torch(x, y, 8), [5.0], criterion="mse"
        )


def test_select_hyperparameter_exec(ref, harness_setup):
    """The full reference L5 pipeline executed — get_performance +
    select_hyperparameter under all four criteria (performance.py:51-110)
    — vs evaluation.harness.select_hyperparameter.

    The reference's :106 KeyError (see test above) is bridged with a
    defaultdict shim on the INPUT dict only: every reference line still
    executes; the shim just lets its sub_name lookup find the attack list
    the line obviously intends."""
    import collections

    victim, tm, x, y, pattern, scales = harness_setup
    lst_t = [_TorchStubAttack(pattern, s) for s in scales]
    atks_t = collections.defaultdict(lambda: lst_t, {"adil": lst_t})
    atks_j = {"adil": [_JaxStubAttack(pattern, s) for s in scales]}
    data_t = _batches_torch(x, y, 8)
    data_j = _batches_jax(x, y, 8)

    budgets = [0.5, 5.0, 100.0]
    for criterion in ("rmse", "mse", "fooling_rate", "mse_limit"):
        sel_ref, perf_ref, val_ref = ref.performance.select_hyperparameter(
            atks_t, tm, data_t, budgets, criterion=criterion
        )
        sel, perf, val = ev.select_hyperparameter(
            atks_j, victim, data_j, budgets, criterion=criterion
        )
        # the validation sweep itself
        key_ref = next(iter(val_ref["mse"]))
        key = val["group_key"]["adil"]
        for m in ("fooling_rate", "rmse", "mse"):
            np.testing.assert_allclose(
                np.asarray(val[m][key], float),
                np.asarray(val_ref[m][key_ref], float),
                rtol=1e-4, atol=1e-6,
            )
        # the per-budget selections: same index chosen -> same metrics
        for b in range(len(budgets)):
            for m in ("fooling_rate", "rmse", "mse"):
                ours_v = perf[b][m][key]
                ref_v = perf_ref[b][m][key_ref]
                if isinstance(ref_v, float) and np.isnan(ref_v):
                    assert np.isnan(ours_v)
                else:
                    np.testing.assert_allclose(
                        float(ours_v), float(ref_v), rtol=1e-4, atol=1e-6
                    )
            # selected instance identity (by scale), incl. the NaN/empty case
            ours_sel = sel[b][key]
            ref_sel = sel_ref[b][key_ref]
            assert len(ours_sel) == len(ref_sel)
            if ref_sel:
                assert ours_sel[0].scale == ref_sel[0].scale
