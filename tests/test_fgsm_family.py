"""FGSM-family baseline tests: budgets, trajectories vs independent torch
oracles, the DI²-FGSM diversity transform, and compile sharing.

The torch oracles implement the same published algorithms (R+FGSM, FFGSM,
MI-FGSM, TPGD) independently on a hand-mapped twin of the tiny victim —
randomness is generated once on the JAX side and fed to both frameworks, so
the deterministic trajectory is directly comparable. Signed-gradient attacks
can flip individual pixels where a gradient component sits at the f32 noise
floor, so elementwise comparisons allow a <1% mismatch fraction (the same
contract as tests/test_torch_parity_uap.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from dl_attack_on_imagenet_tpu.attacks import (
    DIFGSM, EOTPGD, FFGSM, GN, MIFGSM, RFGSM, TPGD, VANILA,
)
from dl_attack_on_imagenet_tpu.attacks import fgsm_family as ff
from dl_attack_on_imagenet_tpu.models import create_model

EPS = 16 / 255
ALPHA = 4 / 255


class TorchTiny(tnn.Module):
    """NCHW twin of models/tiny.py:TinyCNN (same mapping as
    tests/test_torch_parity.py)."""

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


def _nchw(a):
    return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2).copy())


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _ce_grad_torch(tm, adv, y):
    adv = adv.clone().requires_grad_(True)
    loss = F.cross_entropy(tm(adv), torch.from_numpy(y.copy()).long(),
                           reduction="mean")
    (g,) = torch.autograd.grad(loss, adv)
    return g


def _match_fraction(a, b, atol=1e-5):
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b)) <= atol))


def _fooling(victim, adv, y):
    return float(jnp.mean((victim.predict(adv) != jnp.asarray(y))
                          .astype(jnp.float32)))


# ---------------------------------------------------------------------------
# torch oracle trajectories
# ---------------------------------------------------------------------------


class TestOracles:
    def test_mifgsm_matches_torch(self, setup):
        victim, tm, x, y = setup
        steps, decay = 5, 0.1  # the reference's sweep decay (demo :132)
        ours = MIFGSM(victim, eps=EPS, alpha=ALPHA, steps=steps, decay=decay)(
            jnp.asarray(x), jnp.asarray(y))

        x_t = _nchw(x)
        adv, mom = x_t.clone(), torch.zeros_like(x_t)
        for _ in range(steps):
            g = _ce_grad_torch(tm, adv, y)
            g = g / torch.clamp(
                g.abs().mean(dim=(1, 2, 3), keepdim=True), min=1e-12)
            g = g + decay * mom
            mom = g
            adv = adv.detach() + ALPHA * g.sign()
            adv = torch.clamp(x_t + torch.clamp(adv - x_t, -EPS, EPS), 0, 1)
        assert _match_fraction(ours, _nhwc(adv)) >= 0.99

    def test_rfgsm_matches_torch(self, setup):
        victim, tm, x, y = setup
        steps, seed = 4, 11
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
        atk = RFGSM(victim, eps=EPS, alpha=ALPHA, steps=steps, seed=seed)
        ours = atk(jnp.asarray(x), jnp.asarray(y))

        init_sign = np.asarray(jnp.sign(
            jax.random.normal(key, x.shape)))  # same noise both frameworks
        x_t = _nchw(x)
        adv = torch.clamp(x_t + ALPHA * _nchw(init_sign), 0, 1)
        for _ in range(steps):
            g = _ce_grad_torch(tm, adv, y)
            adv = adv.detach() + (EPS - ALPHA) * g.sign()
            adv = torch.clamp(x_t + torch.clamp(adv - x_t, -EPS, EPS), 0, 1)
        assert _match_fraction(ours, _nhwc(adv)) >= 0.99

    def test_ffgsm_matches_torch(self, setup):
        victim, tm, x, y = setup
        seed = 5
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
        alpha = 10 / 255
        ours = FFGSM(victim, eps=EPS, alpha=alpha, seed=seed)(
            jnp.asarray(x), jnp.asarray(y))

        delta0 = np.asarray(jax.random.uniform(
            key, x.shape, minval=-EPS, maxval=EPS))
        x_t = _nchw(x)
        adv = torch.clamp(x_t + _nchw(delta0), 0, 1)
        g = _ce_grad_torch(tm, adv, y)
        adv = adv + alpha * g.sign()
        adv = torch.clamp(x_t + torch.clamp(adv - x_t, -EPS, EPS), 0, 1)
        assert _match_fraction(ours, _nhwc(adv)) >= 0.99

    def test_tpgd_matches_torch(self, setup):
        victim, tm, x, y = setup
        steps, seed = 4, 9
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
        ours = TPGD(victim, eps=EPS, alpha=ALPHA, steps=steps, seed=seed)(
            jnp.asarray(x), jnp.asarray(y))

        noise = np.asarray(0.001 * jax.random.normal(key, x.shape))
        x_t = _nchw(x)
        with torch.no_grad():
            p_ori = F.softmax(tm(x_t), dim=-1)
        adv = x_t + _nchw(noise)
        for _ in range(steps):
            adv = adv.clone().requires_grad_(True)
            kl = F.kl_div(F.log_softmax(tm(adv), dim=-1), p_ori,
                          reduction="sum")
            (g,) = torch.autograd.grad(kl, adv)
            adv = adv.detach() + ALPHA * g.sign()
            adv = torch.clamp(x_t + torch.clamp(adv - x_t, -EPS, EPS), 0, 1)
        assert _match_fraction(ours, _nhwc(adv)) >= 0.99


# ---------------------------------------------------------------------------
# budgets / semantics
# ---------------------------------------------------------------------------


class TestSemantics:
    @pytest.mark.parametrize("cls,kw", [
        (RFGSM, dict(steps=8)),
        (FFGSM, dict(alpha=10 / 255)),
        (MIFGSM, dict(steps=8, decay=1.0)),
        (TPGD, dict(steps=8)),
        (EOTPGD, dict(steps=8, eot_iter=2)),
        (DIFGSM, dict(steps=8)),
    ])
    def test_budget_and_range(self, setup, cls, kw):
        victim, _, x, y = setup
        adv = cls(victim, eps=EPS, **kw)(jnp.asarray(x), jnp.asarray(y))
        assert float(jnp.max(jnp.abs(adv - x))) <= EPS + 1e-6
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1

    def test_iterative_attacks_fool(self, setup):
        victim, _, x, y = setup
        for cls, kw in [(RFGSM, dict(steps=20)),
                        (MIFGSM, dict(steps=20, decay=1.0)),
                        (EOTPGD, dict(steps=20))]:
            adv = cls(victim, eps=EPS, alpha=ALPHA, **kw)(
                jnp.asarray(x), jnp.asarray(y))
            assert _fooling(victim, adv, y) >= 0.5, cls.__name__

    def test_vanila_identity_and_gn_noise(self, setup):
        victim, _, x, y = setup
        out = VANILA(victim)(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_array_equal(np.asarray(out), x)

        g = GN(victim, sigma=0.05)(jnp.asarray(x), jnp.asarray(y))
        assert float(g.min()) >= 0 and float(g.max()) <= 1
        inner = (x > 0.2) & (x < 0.8)  # clamp-free region
        resid = (np.asarray(g) - x)[inner]
        assert 0.03 <= float(np.std(resid)) <= 0.07

    def test_eotpgd_eot1_equals_pgd(self, setup):
        """With eot_iter=1 and the same key the EOT estimator degenerates to
        plain PGD — pure-function equality."""
        victim, _, x, y = setup
        from dl_attack_on_imagenet_tpu.attacks.pgd import pgd

        key = jax.random.PRNGKey(2)
        a = ff.eotpgd(victim.apply_fn, victim.variables, jnp.asarray(x),
                      jnp.asarray(y), EPS, ALPHA, 5, 1, key=key)
        b = pgd(victim.apply_fn, victim.variables, jnp.asarray(x),
                jnp.asarray(y), EPS, ALPHA, 5, key=key)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_targeted_mifgsm_moves_toward_target(self, setup):
        victim, _, x, y = setup
        atk = MIFGSM(victim, eps=32 / 255, alpha=8 / 255, steps=30,
                     decay=1.0, targeted=True)
        adv = atk(jnp.asarray(x), jnp.asarray(y))
        logits = victim(jnp.asarray(x))
        target = jnp.argsort(logits, axis=-1)[:, -2]
        hit = float(jnp.mean(
            (victim.predict(adv) == target).astype(jnp.float32)))
        assert hit >= 0.5


# ---------------------------------------------------------------------------
# DI²-FGSM diversity transform
# ---------------------------------------------------------------------------


class TestInputDiversity:
    def test_transform_equals_resize_then_pad(self, setup):
        _, _, x, _ = setup
        key = jax.random.PRNGKey(42)
        resize_low = int(32 * 0.9)  # 28
        out = ff.input_diversity(jnp.asarray(x), key, resize_low, 1.0)

        k1, k2, k3, _ = jax.random.split(key, 4)
        rnd = int(jax.random.randint(k1, (), resize_low, 32))
        rem = 32 - rnd
        top = int(jax.random.randint(k2, (), 0, rem))
        left = int(jax.random.randint(k3, (), 0, rem))
        r = jax.image.resize(jnp.asarray(x), (x.shape[0], rnd, rnd, 3),
                             method="linear", antialias=False)
        manual = jnp.zeros_like(jnp.asarray(x)).at[
            :, top:top + rnd, left:left + rnd, :].set(r)
        np.testing.assert_allclose(np.asarray(out), np.asarray(manual),
                                   atol=1e-5)

    def test_prob_zero_is_identity_and_difgsm_reduces_to_mifgsm(self, setup):
        victim, _, x, y = setup
        key = jax.random.PRNGKey(0)
        same = ff.input_diversity(jnp.asarray(x), key, 28, 0.0)
        np.testing.assert_array_equal(np.asarray(same), x)

        a = ff.difgsm(victim.apply_fn, victim.variables, jnp.asarray(x),
                      jnp.asarray(y), EPS, ALPHA, 1.0, 0.0, 5, key=key)
        b = ff.mifgsm(victim.apply_fn, victim.variables, jnp.asarray(x),
                      jnp.asarray(y), EPS, ALPHA, 1.0, 5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_difgsm_deterministic_per_seed(self, setup):
        victim, _, x, y = setup
        atk = DIFGSM(victim, eps=EPS, alpha=ALPHA, steps=5, seed=3)
        a = atk(jnp.asarray(x), jnp.asarray(y))
        atk2 = DIFGSM(victim, eps=EPS, alpha=ALPHA, steps=5, seed=3)
        b = atk2(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# compile sharing across hyper sweeps
# ---------------------------------------------------------------------------


class TestCompileReuse:
    def test_rfgsm_eps_sweep_shares_compile(self, setup):
        victim, _, x, y = setup
        from dl_attack_on_imagenet_tpu.attacks.fgsm_family import _rfgsm_cache

        a1 = RFGSM(victim, eps=8 / 255, alpha=2 / 255, steps=3)
        _ = a1(jnp.asarray(x), jnp.asarray(y))
        fn = _rfgsm_cache(victim.apply_fn, 3, False)
        n = fn._cache_size()
        assert n >= 1
        a2 = RFGSM(victim, eps=32 / 255, alpha=8 / 255, steps=3)
        adv2 = a2(jnp.asarray(x), jnp.asarray(y))
        assert fn._cache_size() == n, "eps sweep retraced RFGSM"
        assert float(jnp.max(jnp.abs(adv2 - x))) <= 32 / 255 + 1e-6

    def test_mifgsm_decay_sweep_shares_compile(self, setup):
        victim, _, x, y = setup
        from dl_attack_on_imagenet_tpu.attacks.fgsm_family import _mifgsm_cache

        _ = MIFGSM(victim, eps=8 / 255, steps=3, decay=0.1)(
            jnp.asarray(x), jnp.asarray(y))
        fn = _mifgsm_cache(victim.apply_fn, 3, False)
        n = fn._cache_size()
        _ = MIFGSM(victim, eps=8 / 255, steps=3, decay=1.0)(
            jnp.asarray(x), jnp.asarray(y))
        assert fn._cache_size() == n, "decay sweep retraced MIFGSM"
