"""Cross-framework golden parity: our jitted ADiL training step vs an
independent PyTorch implementation of the same math.

This is the executable form of the BASELINE.md parity contract ("fooling
rate within 0.5%"): the same victim weights, data, initialization, loss
(sum-CE, untargeted), optimizer (AdamW, torch defaults) and post-step
projections must produce matching loss trajectories and matching (D, v)
iterates across frameworks. The torch side is written from the math (not
from /root/reference) — Duchi projection directly from the ICML'08
algorithm, SAME-padding replicated with explicit F.pad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.attacks import adil_core as core
from dl_attack_on_imagenet_tpu.models import create_model

EPS = 8 / 255
K = 4
N = 8
LR = 0.01


# ---------------------------------------------------------------------------
# torch twin of models/tiny.py:TinyCNN (NCHW, explicit SAME padding)
# ---------------------------------------------------------------------------


class TorchTiny(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 8, 3, stride=2)
        self.conv2 = tnn.Conv2d(8, 16, 3, stride=2)
        self.fc = tnn.Linear(16, 10)

    def forward(self, x):
        # flax 'SAME' for k=3, s=2 on even sizes pads (lo=0, hi=1).
        x = F.pad(x, (0, 1, 0, 1))
        x = F.relu(self.conv1(x))
        x = F.pad(x, (0, 1, 0, 1))
        x = F.relu(self.conv2(x))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def torch_l1_ball_project(x, eps):
    """Duchi et al. (2008) row-wise l1 projection, written in torch."""
    flat = x.reshape(x.shape[0], -1)
    out = flat.clone()
    for i in range(flat.shape[0]):
        row = flat[i]
        if row.abs().sum() < eps:
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
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    p = jax.tree_util.tree_map(np.asarray, victim.variables["params"])

    tm = TorchTiny()
    with torch.no_grad():
        tm.conv1.weight.copy_(torch.from_numpy(p["Conv_0"]["kernel"].transpose(3, 2, 0, 1).copy()))
        tm.conv1.bias.copy_(torch.from_numpy(p["Conv_0"]["bias"].copy()))
        tm.conv2.weight.copy_(torch.from_numpy(p["Conv_1"]["kernel"].transpose(3, 2, 0, 1).copy()))
        tm.conv2.bias.copy_(torch.from_numpy(p["Conv_1"]["bias"].copy()))
        tm.fc.weight.copy_(torch.from_numpy(p["Dense_0"]["kernel"].T.copy()))
        tm.fc.bias.copy_(torch.from_numpy(p["Dense_0"]["bias"].copy()))
    tm.eval()

    rng = np.random.default_rng(0)
    x = rng.random((N, 32, 32, 3), dtype=np.float32)
    d0 = (rng.random((K, 32, 32, 3), dtype=np.float32) * 2 - 1)
    v0_raw = rng.random((N, K), dtype=np.float32)
    return victim, tm, x, d0, v0_raw


def test_victim_logits_parity(setup):
    victim, tm, x, _, _ = setup
    ours = np.asarray(victim(jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_training_trajectory_parity(setup):
    victim, tm, x, d0, v0_raw = setup
    cfg = AdilConfig(eps=EPS, norm="linf", n_atoms=K, loss="ce",
                     step_size=LR, batch_size=N)

    # ---- our side: full-batch projected-AdamW steps --------------------
    v0 = core.init_codes(jax.random.PRNGKey(0), N, cfg)  # unused values
    from dl_attack_on_imagenet_tpu.ops import project_codes

    v_init = project_codes(jnp.asarray(v0_raw), EPS, "linf")
    state = core.init_state(jax.random.PRNGKey(0), (32, 32, 3), N, cfg,
                            d_init=jnp.asarray(d0))
    state = state.replace(v=v_init)
    opt = core.make_optimizer(LR)
    state = state.replace(opt_state=opt.init({"d": state.d, "v": state.v}))

    labels = core.predict_labels(victim.apply_fn, victim.variables, jnp.asarray(x))
    step = core.make_train_step(victim.apply_fn, cfg, "both")
    idx = jnp.arange(N)
    mask = jnp.ones((N,))
    ours_losses = []
    for _ in range(5):
        state, loss, fooling = step(state, victim.variables, jnp.asarray(x),
                                    labels, idx, mask)
        ours_losses.append(float(loss))

    # ---- torch side: same math, independent implementation -------------
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        t_labels = tm(xt).argmax(-1)
    np.testing.assert_array_equal(np.asarray(labels), t_labels.numpy())

    # torch dictionary layout: (K, C, H, W); codes (N, K)
    d_t = torch.from_numpy(d0.transpose(0, 3, 1, 2).copy()).requires_grad_(True)
    v_t = torch.from_numpy(np.asarray(v_init).copy()).requires_grad_(True)
    optim = torch.optim.AdamW([d_t, v_t], lr=LR)
    torch_losses = []
    for _ in range(5):
        optim.zero_grad()
        dv = torch.einsum("nk,kchw->nchw", v_t, d_t)
        logits = tm(xt + dv)
        loss = -F.cross_entropy(logits, t_labels, reduction="sum")
        loss.backward()
        optim.step()
        with torch.no_grad():
            v_t.copy_(torch_l1_ball_project(v_t, EPS))
            d_t.copy_(torch.clamp(d_t, -1, 1))
        torch_losses.append(float(loss.detach()))

    np.testing.assert_allclose(ours_losses, torch_losses, rtol=2e-3)
    # final iterates agree
    np.testing.assert_allclose(
        np.asarray(state.v), v_t.detach().numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(core.d_image(state.d, (32, 32, 3))),
        d_t.detach().numpy().transpose(0, 2, 3, 1),
        atol=5e-4,
    )
