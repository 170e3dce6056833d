"""Carlini-Wagner l2 baseline: trajectory parity vs an independent torch
oracle, semantics, and compile sharing across the reference's c-grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from dl_attack_on_imagenet_tpu.attacks import CW
from dl_attack_on_imagenet_tpu.attacks.cw import cw_l2
from dl_attack_on_imagenet_tpu.models import create_model


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


def torch_cw(tm, x, y, c, kappa, lr, steps):
    """Independent torch implementation of the same (published) algorithm:
    tanh-space Adam on sum-l2 + c*f6, per-image lowest-l2 best tracking."""
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    y_t = torch.from_numpy(y.copy()).long()
    w = torch.atanh(torch.clamp(2 * x_t - 1, -1 + 1e-6, 1 - 1e-6))
    w = w.clone().requires_grad_(True)
    opt = torch.optim.Adam([w], lr=lr)
    best_adv = x_t.clone()
    best_l2 = torch.full((x.shape[0],), float("inf"))

    def eval_point(wv):
        adv = 0.5 * (torch.tanh(wv) + 1)
        l2 = ((adv - x_t) ** 2).sum(dim=(1, 2, 3))
        logits = tm(adv)
        true_logit = logits.gather(1, y_t[:, None])[:, 0]
        masked = logits.clone()
        masked.scatter_(1, y_t[:, None], -float("inf"))
        other = masked.max(dim=1).values
        f = torch.clamp(true_logit - other, min=-kappa)
        return adv, l2, logits, l2.sum() + c * f.sum()

    for _ in range(steps):
        adv, l2, logits, cost = eval_point(w)
        with torch.no_grad():
            pred = logits.argmax(dim=1)
            take = (pred != y_t) & (l2 < best_l2)
            best_l2 = torch.where(take, l2, best_l2)
            best_adv = torch.where(take[:, None, None, None], adv, best_adv)
        opt.zero_grad()
        cost.backward()
        opt.step()
    with torch.no_grad():
        adv, l2, logits, _ = eval_point(w)
        pred = logits.argmax(dim=1)
        take = (pred != y_t) & (l2 < best_l2)
        best_adv = torch.where(take[:, None, None, None], adv, best_adv)
    return best_adv.detach().numpy().transpose(0, 2, 3, 1)


class TestCW:
    def test_matches_torch_oracle(self, setup):
        victim, tm, x, y = setup
        c, kappa, lr, steps = 10.0, 0.0, 0.01, 30
        ours = np.asarray(cw_l2(victim.apply_fn, victim.variables,
                                jnp.asarray(x), jnp.asarray(y),
                                c, kappa, lr, steps))
        theirs = torch_cw(tm, x, y, c, kappa, lr, steps)
        np.testing.assert_allclose(ours, theirs, atol=2e-3)
        # the adversarial sets agree
        assert float(np.mean(np.abs(ours - theirs) <= 1e-3)) >= 0.99

    def test_fools_and_stays_in_box(self, setup):
        victim, _, x, y = setup
        adv = CW(victim, c=50.0, steps=100, lr=0.01)(
            jnp.asarray(x), jnp.asarray(y))
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        fool = float(jnp.mean(
            (victim.predict(adv) != jnp.asarray(y)).astype(jnp.float32)))
        assert fool >= 0.75
        # l2 economy: perturbations are small relative to an eps-ball attack
        l2 = jnp.sqrt(jnp.sum((adv - x) ** 2, axis=(1, 2, 3)))
        assert float(jnp.median(l2)) < 2.0

    def test_unfooled_images_return_clean(self, setup):
        """c=0 never rewards fooling — best tracking must hand back the
        clean images untouched (the torchattacks contract)."""
        victim, _, x, y = setup
        adv = CW(victim, c=0.0, steps=5, lr=0.01)(
            jnp.asarray(x), jnp.asarray(y))
        # with c=0 the cost is pure l2: iterates stay at (numerically) the
        # clean point, and any that never fool keep best_adv == clean
        still = victim.predict(adv) == jnp.asarray(y)
        diff = np.abs(np.asarray(adv) - x).max(axis=(1, 2, 3))
        assert np.all(diff[np.asarray(still)] <= 1e-4)

    def test_c_grid_shares_compile(self, setup):
        victim, _, x, y = setup
        from dl_attack_on_imagenet_tpu.attacks.cw import _cw_cache

        # the reference's sweep: logspace c grid (demo_dL_attack.py:89,:130)
        _ = CW(victim, c=0.1, steps=3)(jnp.asarray(x), jnp.asarray(y))
        fn = _cw_cache(victim.apply_fn, 3, False)
        n = fn._cache_size()
        assert n >= 1
        for c in (1.0, 100.0, 1e4):
            _ = CW(victim, c=c, steps=3)(jnp.asarray(x), jnp.asarray(y))
        assert fn._cache_size() == n, "c grid retraced CW"

    def test_targeted_hits_target(self, setup):
        victim, _, x, y = setup
        atk = CW(victim, c=50.0, steps=100, lr=0.01, targeted=True)
        adv = atk(jnp.asarray(x), jnp.asarray(y))
        logits = victim(jnp.asarray(x))
        target = jnp.argsort(logits, axis=-1)[:, -2]
        hit = float(jnp.mean(
            (victim.predict(adv) == target).astype(jnp.float32)))
        assert hit >= 0.5
