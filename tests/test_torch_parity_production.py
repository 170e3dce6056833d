"""Production-shape cross-framework parity (VERDICT round-2 weak #3).

The toy-shape parity tests (test_torch_parity*.py, 32x32 tiny victim) never
touch the envelope where scale-dependent bugs live. This file pins one run
at the production operating point — 224x224 images, K=100 atoms, a REAL
ResNet-18 zoo victim with converter-produced weights (the reference's
default victim, main.py:41-42) — against an independent PyTorch
implementation of the same math:

1. ADiL projected-AdamW training trajectory (CW loss, adil.py:168-191),
2. DDrague z-space inference (adil.py:508-567),
3. the bisection l1-ball projection in its >4096-dim auto-switch regime
   (ops/projections.py project_atoms; atom rows are 224*224*3 = 150528-dim)
   against the sort-based Duchi oracle written in torch.

Bounded steps on CPU (the suite platform); tolerances absorb cross-
framework conv-backward reduction-order differences at this depth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.attacks import adil_core as core
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.models.convert import convert_torch_state_dict

from test_torch_forward_parity import TorchResNet18, _randomize_bn_stats

EPS = 8 / 255
K = 100
N = 4
LR = 0.01
KAPPA = 50.0
STEPS = 3


def torch_cw_loss(logits, labels, kappa):
    """CW margin loss, reference f_loss semantics (adil.py:103-112):
    sum of clamp(real - other, min=-kappa). The runner-up is
    max((1 - one_hot) * logits) EXACTLY as the reference writes it — the
    zeroed true-class slot floors the runner-up at 0 when every non-true
    logit is negative (adil.py:106)."""
    one_hot = F.one_hot(labels, logits.shape[-1]).to(logits.dtype)
    real = (one_hot * logits).sum(-1)
    other = ((1 - one_hot) * logits).max(-1).values
    return torch.clamp(real - other, min=-kappa).sum()


def torch_l1_ball_project_rows(x, eps):
    """Duchi et al. (2008) sort-based row-wise l1 projection in torch —
    the oracle for BOTH our Duchi form and the bisection form."""
    flat = x.reshape(x.shape[0], -1)
    out = flat.clone()
    for i in range(flat.shape[0]):
        row = flat[i]
        if row.abs().sum() <= eps:
            continue
        mu = row.abs().sort(descending=True).values
        cs = torch.cumsum(mu, 0)
        idx = torch.arange(1, len(row) + 1, dtype=row.dtype)
        rho = torch.nonzero(mu * idx > cs - eps).max() + 1
        theta = (cs[rho - 1] - eps) / rho
        out[i] = torch.sign(row) * torch.clamp(row.abs() - theta, min=0)
    return out.reshape(x.shape)


@pytest.fixture(scope="module")
def setup():
    tm = TorchResNet18()
    _randomize_bn_stats(tm, seed=3)
    tm.eval()
    for p in tm.parameters():
        p.requires_grad_(False)

    victim = create_model("resnet18", rng=jax.random.PRNGKey(0), normalize=False)
    victim = create_model(
        "resnet18",
        normalize=False,
        variables=convert_torch_state_dict(tm.state_dict(), victim.variables),
    )

    rng = np.random.default_rng(0)
    x = rng.random((N, 224, 224, 3), dtype=np.float32)
    d0 = (rng.random((K, 224, 224, 3), dtype=np.float32) * 2 - 1) * 0.1
    v0_raw = rng.random((N, K), dtype=np.float32) * (EPS / K)
    return victim, tm, x, d0, v0_raw


def test_forward_parity_at_scale(setup):
    victim, tm, x, _, _ = setup
    ours = np.asarray(victim(jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_training_trajectory_parity_production(setup):
    victim, tm, x, d0, v0_raw = setup
    cfg = AdilConfig(eps=EPS, norm="linf", n_atoms=K, loss="logits",
                     kappa=KAPPA, step_size=LR, batch_size=N)

    from dl_attack_on_imagenet_tpu.ops import project_codes

    v_init = project_codes(jnp.asarray(v0_raw), EPS, "linf")
    state = core.init_state(jax.random.PRNGKey(0), (224, 224, 3), N, cfg,
                            d_init=jnp.asarray(d0))
    state = state.replace(v=jnp.asarray(v_init))
    opt = core.make_optimizer(LR)
    state = state.replace(opt_state=opt.init({"d": state.d, "v": state.v}))

    labels = core.predict_labels(victim.apply_fn, victim.variables, jnp.asarray(x))
    step = jax.jit(core.make_train_step(victim.apply_fn, cfg, "both"))
    idx = jnp.arange(N)
    mask = jnp.ones((N,))
    ours_losses = []
    for _ in range(STEPS):
        state, loss, fooling = step(state, victim.variables, jnp.asarray(x),
                                    labels, idx, mask)
        ours_losses.append(float(loss))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        t_labels = tm(xt).argmax(-1)
    np.testing.assert_array_equal(np.asarray(labels), t_labels.numpy())

    d_t = torch.from_numpy(d0.transpose(0, 3, 1, 2).copy()).requires_grad_(True)
    v_t = torch.from_numpy(np.asarray(v_init).copy()).requires_grad_(True)
    optim = torch.optim.AdamW([d_t, v_t], lr=LR)
    torch_losses = []
    for _ in range(STEPS):
        optim.zero_grad()
        dv = torch.einsum("nk,kchw->nchw", v_t, d_t)
        logits = tm(xt + dv)
        # cfg.loss='logits' MINIMIZES the clamped CW margin (drive the true
        # logit below the runner-up; ops/losses.py cw_margin_loss).
        loss = torch_cw_loss(logits, t_labels, KAPPA)
        loss.backward()
        optim.step()
        with torch.no_grad():
            v_t.copy_(torch_l1_ball_project_rows(v_t, EPS))
            d_t.copy_(torch.clamp(d_t, -1, 1))
        torch_losses.append(float(loss.detach()))

    # BASELINE.md parity contract: trajectory within 0.5%.
    np.testing.assert_allclose(ours_losses, torch_losses, rtol=5e-3)
    np.testing.assert_allclose(
        np.asarray(state.v), v_t.detach().numpy(), atol=3e-3
    )
    # atol 3e-3 (not 2e-3): a handful of D elements (~30 of 15M) land at
    # ~2.8e-3 depending on which XLA:CPU executable served the run — the
    # shared compile cache can hold AOT results from a different host
    # machine whose codegen orders the accumulations differently, so the
    # exact fp noise is cache-state-dependent (seen only in full-suite
    # order, not isolation).
    np.testing.assert_allclose(
        np.asarray(core.d_image(state.d, (224, 224, 3))),
        d_t.detach().numpy().transpose(0, 2, 3, 1),
        atol=3e-3,
    )

    # --- DDrague inference parity on the learned dictionary -------------
    d_img = core.d_image(state.d, (224, 224, 3))
    cfg_inf = AdilConfig(eps=EPS, norm="linf", n_atoms=K, loss="ce",
                         step_size=LR, batch_size=N, steps_inference=STEPS,
                         tol=0.0)
    adv_ours = np.asarray(
        core.supervised_ddrague(
            victim.apply_fn, victim.variables, d_img, jnp.asarray(x), cfg_inf
        )
    )

    # torch twin (adil.py:508-567 semantics): AdamW on image-shaped z,
    # v = z D+ read off via the Gram solve, dv = Dv, mean-CE loss on the
    # clean-model labels, z clamped to [-eps, eps] after each step.
    d_flat = d_t.detach().reshape(K, -1)  # (K, C*H*W) in NCHW order
    gram = d_flat @ d_flat.T
    gram_inv = torch.linalg.solve(gram, torch.eye(K, dtype=gram.dtype))
    d_pinv = gram_inv @ d_flat  # (K, M)
    z = torch.zeros_like(xt).requires_grad_(True)
    optim_z = torch.optim.AdamW([z], lr=cfg_inf.code_lr)
    for _ in range(STEPS):
        optim_z.zero_grad()
        v = z.reshape(N, -1) @ d_pinv.T
        dv = (v @ d_flat).reshape(xt.shape)
        logits = tm(xt + dv)
        # untargeted 'ce' inference MAXIMIZES CE (attack_loss coeff=-1).
        loss = -F.cross_entropy(logits, t_labels, reduction="mean")
        loss.backward()
        optim_z.step()
        with torch.no_grad():
            z.clamp_(-EPS, EPS)
    with torch.no_grad():
        v = z.reshape(N, -1) @ d_pinv.T
        adv_t = torch.clamp(xt + (v @ d_flat).reshape(xt.shape), 0, 1)
    # atol 4e-3: same cache-state-dependent fp noise as the D comparison
    # above (~10 of 600k elements at ~2.7e-3 in full-suite order only —
    # cross-machine XLA:CPU AOT executables reorder accumulations).
    np.testing.assert_allclose(
        adv_ours, adv_t.numpy().transpose(0, 2, 3, 1), atol=4e-3
    )


def test_bisection_l1_regime_matches_torch_oracle(setup):
    """project_atoms('l1ball') on 150528-dim rows — the auto-switch
    bisection path production shapes actually hit (ops/projections.py:164)
    — against the torch Duchi oracle."""
    from dl_attack_on_imagenet_tpu.ops import project_atoms

    rng = np.random.default_rng(5)
    # Rows scaled so most are OUTSIDE the unit l1 ball (the hard branch);
    # include one inside row (identity branch) and one just-at-boundary.
    d = rng.standard_normal((8, 224 * 224 * 3)).astype(np.float32) * 1e-4
    d[0] *= 1e-3  # ||row||_1 ~ 0.01 -> inside, must return unchanged
    ours = np.asarray(project_atoms(jnp.asarray(d), "l1ball"))
    oracle = torch_l1_ball_project_rows(torch.from_numpy(d.copy()), 1.0).numpy()
    np.testing.assert_allclose(ours, oracle, atol=2e-6)
    # Inside row untouched; outside rows land on the boundary.
    np.testing.assert_array_equal(ours[0], d[0])
    norms = np.abs(ours[1:]).sum(axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
