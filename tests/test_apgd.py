"""APGD / APGD-T: the paper's checkpoint schedule, full-trajectory parity vs
an independent torch implementation of the same published algorithm, budget
semantics, and compile sharing.

Trajectory caveat: APGD's halving conditions compare float equalities and
signed gradients, so a single noise-floor disagreement can fork one image's
trajectory. The oracle test therefore requires MOST images to match
elementwise (in practice all of them do on the tiny victim) rather than a
global allclose."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from dl_attack_on_imagenet_tpu.attacks import APGD, APGDT
from dl_attack_on_imagenet_tpu.attacks.apgd import _schedule, apgd
from dl_attack_on_imagenet_tpu.models import create_model

EPS = 16 / 255


class TorchTiny(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 8, 3, stride=2)
        self.conv2 = tnn.Conv2d(8, 16, 3, stride=2)
        self.fc = tnn.Linear(16, 10)

    def forward(self, x):
        x = F.pad(x, (0, 1, 0, 1))
        x = F.relu(self.conv1(x))
        x = F.pad(x, (0, 1, 0, 1))
        x = F.relu(self.conv2(x))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


@pytest.fixture(scope="module")
def setup():
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    p = jax.tree_util.tree_map(np.asarray, victim.variables["params"])
    tm = TorchTiny()
    with torch.no_grad():
        tm.conv1.weight.copy_(torch.from_numpy(
            p["Conv_0"]["kernel"].transpose(3, 2, 0, 1).copy()))
        tm.conv1.bias.copy_(torch.from_numpy(p["Conv_0"]["bias"].copy()))
        tm.conv2.weight.copy_(torch.from_numpy(
            p["Conv_1"]["kernel"].transpose(3, 2, 0, 1).copy()))
        tm.conv2.bias.copy_(torch.from_numpy(p["Conv_1"]["bias"].copy()))
        tm.fc.weight.copy_(torch.from_numpy(p["Dense_0"]["kernel"].T.copy()))
        tm.fc.bias.copy_(torch.from_numpy(p["Dense_0"]["bias"].copy()))
    tm.eval()
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3)),
                   np.float32)
    y = np.asarray(victim.predict(jnp.asarray(x)))
    return victim, tm, x, y


def test_schedule_matches_paper():
    """Checkpoints for n_iter=100 follow the paper's recurrence evaluated in
    float64 — {22,41,58,70,80,87,93,99,100}; note 58 not the hand-derived 57
    (0.41+0.16 = 0.5700...01 before ceil — the official implementation uses
    the same Python float recurrence and lands on 58 as well)."""
    is_ck, interval = _schedule(100)
    ck = [i + 1 for i in range(100) if bool(is_ck[i])]
    assert ck == [22, 41, 58, 70, 80, 87, 93, 99, 100]
    # intervals at checkpoints telescope from 0
    ival = [float(interval[i - 1]) for i in ck]
    assert np.cumsum(ival).tolist() == [float(c) for c in ck]

    is_ck10, _ = _schedule(10)
    assert [i + 1 for i in range(10) if bool(is_ck10[i])][0] == 3


class TestAPGD:
    def test_matches_torch_oracle(self, setup):
        victim, tm, x, y = setup
        steps = 10
        key = jax.random.PRNGKey(0)
        ours, succ = apgd(victim.apply_fn, victim.variables, jnp.asarray(x),
                          jnp.asarray(y), EPS, steps, norm="linf", loss="ce",
                          key=key)
        # rebuild the shared init point exactly as apgd does
        u = 2.0 * jax.random.uniform(key, x.shape) - 1.0
        mx = jnp.max(jnp.abs(u), axis=(1, 2, 3), keepdims=True)
        x0 = np.asarray(jnp.clip(jnp.asarray(x) + EPS * u
                                 / jnp.maximum(mx, 1e-12), 0, 1))
        theirs = _torch_apgd_ref(tm, x, y, x0, EPS, steps)
        per_image = (np.abs(np.asarray(ours) - theirs) <= 1e-4).all(
            axis=(1, 2, 3))
        assert per_image.mean() >= 0.75
        assert float(jnp.mean(succ.astype(jnp.float32))) >= 0.5

    def test_budget_linf_and_l2(self, setup):
        victim, _, x, y = setup
        adv = APGD(victim, eps=EPS, steps=20)(jnp.asarray(x), jnp.asarray(y))
        assert float(jnp.max(jnp.abs(adv - x))) <= EPS + 1e-5
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1

        adv2 = APGD(victim, norm="L2", eps=2.0, steps=20)(
            jnp.asarray(x), jnp.asarray(y))
        nrm = jnp.sqrt(jnp.sum((adv2 - x) ** 2, axis=(1, 2, 3)))
        assert bool(jnp.all(nrm <= 2.0 + 1e-4))

    def test_dlr_loss_fools(self, setup):
        victim, _, x, y = setup
        adv = APGD(victim, eps=EPS, steps=30, loss="dlr")(
            jnp.asarray(x), jnp.asarray(y))
        fool = float(jnp.mean(
            (victim.predict(adv) != jnp.asarray(y)).astype(jnp.float32)))
        assert fool >= 0.5

    def test_apgdt_hits_and_shares_compile(self, setup):
        victim, _, x, y = setup
        from dl_attack_on_imagenet_tpu.attacks.apgd import _apgd_cache

        atk = APGDT(victim, eps=32 / 255, steps=20, n_classes=4)
        adv = atk(jnp.asarray(x), jnp.asarray(y))
        fn = _apgd_cache(victim.apply_fn, 20, "linf", "dlr-targeted", 1)
        assert fn._cache_size() == 1, "APGD-T ranks retraced"
        fool = float(jnp.mean(
            (victim.predict(adv) != jnp.asarray(y)).astype(jnp.float32)))
        assert fool >= 0.5
        assert float(jnp.max(jnp.abs(adv - x))) <= 32 / 255 + 1e-5

    def test_eps_sweep_shares_compile(self, setup):
        victim, _, x, y = setup
        from dl_attack_on_imagenet_tpu.attacks.apgd import _apgd_cache

        _ = APGD(victim, eps=8 / 255, steps=5)(jnp.asarray(x), jnp.asarray(y))
        fn = _apgd_cache(victim.apply_fn, 5, "linf", "ce", 1)
        n = fn._cache_size()
        _ = APGD(victim, eps=32 / 255, steps=5)(jnp.asarray(x),
                                                jnp.asarray(y))
        assert fn._cache_size() == n, "eps sweep retraced APGD"


def _torch_apgd_ref(tm, x, y, x0_np, eps, steps):
    """Independent torch implementation of APGD-CE/Linf (same paper
    mechanics as attacks/apgd.py), with the init point supplied so both
    frameworks share it."""
    rho, alpha = 0.75, 0.75
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    y_t = torch.from_numpy(y.copy()).long()
    n = x.shape[0]

    p = [0.0, 0.22]
    while p[-1] < 1.0:
        p.append(p[-1] + max(p[-1] - p[-2] - 0.03, 0.06))
    cks = sorted({min(int(math.ceil(pj * steps)), steps) for pj in p[1:]})

    def ball_box(u):
        return torch.clamp(x_t + torch.clamp(u - x_t, -eps, eps), 0, 1)

    def val_grad(u):
        u = u.clone().requires_grad_(True)
        logits = tm(u)
        per = F.cross_entropy(logits, y_t, reduction="none")
        (g,) = torch.autograd.grad(per.sum(), u)
        return per.detach(), logits.argmax(1).detach(), g

    x_adv = torch.from_numpy(x0_np.transpose(0, 3, 1, 2).copy())
    f_adv, pred, g = val_grad(x_adv)
    x_old = x_adv.clone()
    x_best, f_best, g_best = x_adv.clone(), f_adv.clone(), g.clone()
    x_bad = x_adv.clone()
    succ = pred != y_t
    step = torch.full((n,), 2.0 * eps)
    cnt = torch.zeros(n)
    ck_step, ck_fbest = step.clone(), f_best.clone()
    prev_w = 0
    for i in range(steps):
        a = 1.0 if i == 0 else alpha
        s4 = step[:, None, None, None]
        z = ball_box(x_adv + s4 * g.sign())
        x_new = ball_box(x_adv + a * (z - x_adv) + (1 - a) * (x_adv - x_old))
        f_new, pred, g_new = val_grad(x_new)
        cnt += (f_new > f_adv).float()
        better = f_new > f_best
        b4 = better[:, None, None, None]
        x_best = torch.where(b4, x_new, x_best)
        g_best = torch.where(b4, g_new, g_best)
        f_best = torch.where(better, f_new, f_best)
        fooled = pred != y_t
        x_bad = torch.where(fooled[:, None, None, None], x_new, x_bad)
        succ |= fooled
        if (i + 1) in cks:
            ival = (i + 1) - prev_w
            prev_w = i + 1
            cond1 = cnt < rho * ival
            cond2 = (step == ck_step) & (f_best == ck_fbest)
            halve = cond1 | cond2
            step = torch.where(halve, step * 0.5, step)
            h4 = halve[:, None, None, None]
            nxt = torch.where(h4, x_best, x_new)
            g_nxt = torch.where(h4, g_best, g_new)
            f_nxt = torch.where(halve, f_best, f_new)
            x_old = torch.where(h4, x_best, x_adv)
            x_adv, g, f_adv = nxt, g_nxt, f_nxt
            ck_step, ck_fbest = step.clone(), f_best.clone()
            cnt = torch.zeros(n)
        else:
            x_old = x_adv
            x_adv, g, f_adv = x_new, g_new, f_new
    out = torch.where(succ[:, None, None, None], x_bad, x_best)
    return out.numpy().transpose(0, 2, 3, 1)
