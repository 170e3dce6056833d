"""FGSM-family baselines: RFGSM, FFGSM, MIFGSM, EOTPGD, TPGD, DIFGSM, GN, VANILA.

The reference driver's baseline block lists these torchattacks entries
(RFGSM/EOTPGD/TPGD/VANILA/GN at demo_dL_attack.py:97-102, DIFGSM :107,
FFGSM/MIFGSM in the attack grid :131-133) as the comparisons ADiL is judged
against. torchattacks is an external dependency of the reference, so there is
no reference source to cite per-line; each attack here is implemented from
its published algorithm with the torchattacks call signature the driver
sweeps (``performance.get_atks`` hyper-grids), TPU-first: one jitted
``lax.fori_loop`` per batch, eps/alpha/decay/sigma as traced arguments so a
hyper sweep shares a single compile per (victim, steps, variant).

Papers: R+FGSM — Tramèr et al., "Ensemble Adversarial Training" (2017);
FFGSM — Wong et al., "Fast is better than free" (2020); MI-FGSM — Dong et
al., "Boosting Adversarial Attacks with Momentum" (2018); TPGD — Zhang et
al., "Theoretically Principled Trade-off..." (TRADES, 2019); EOT-PGD —
Athalye et al., "Synthesizing Robust Adversarial Examples" (2018) applied to
PGD; DI²-FGSM — Xie et al., "Improving Transferability of Adversarial
Examples with Input Diversity" (2019).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import VictimModel
from ..ops import clamp_image, cross_entropy_mean
from .base import Attack
from .pgd import _ce_grad


# ---------------------------------------------------------------------------
# pure attack math (jittable; eps/alpha/... are traced)
# ---------------------------------------------------------------------------


def vanila(images):
    """Identity 'attack' (torchattacks VANILA): returns the clean images.

    Exists so the reference's baseline grid (demo_dL_attack.py:100) can carry
    a no-op row whose fooling rate is the victim's clean error."""
    return images


def gn(images, sigma, key):
    """Additive Gaussian noise, clamped to [0,1] (torchattacks GN;
    demo_dL_attack.py:101 calls it with ``sigma=0.1``)."""
    return clamp_image(images + sigma * jax.random.normal(key, images.shape))


def rfgsm(apply_fn, variables, images, labels, eps, alpha, steps,
          targeted=False, key=None):
    """R+FGSM (Tramèr et al. 2017), multi-step generalization.

    Start at ``x + alpha*sign(N(0,1))``, then ``steps`` signed-gradient steps
    of size ``eps - alpha``, each clamped to the eps-ball around the clean
    images then to [0,1]. Reference sweep: demo_dL_attack.py:97.
    """
    adv0 = clamp_image(images + alpha * jnp.sign(
        jax.random.normal(key, images.shape)))

    def body(_, adv):
        g = _ce_grad(apply_fn, variables, adv, labels, targeted)
        adv = adv + (eps - alpha) * jnp.sign(g)
        return clamp_image(images + jnp.clip(adv - images, -eps, eps))

    return jax.lax.fori_loop(0, steps, body, adv0)


def ffgsm(apply_fn, variables, images, labels, eps, alpha, targeted=False,
          key=None):
    """FFGSM (Wong et al. 2020): uniform random start in the eps-ball, ONE
    signed-gradient step of size alpha (alpha may exceed eps — the published
    operating point is alpha=10/255 at eps=8/255), eps-ball + [0,1] clamp."""
    adv = clamp_image(images + jax.random.uniform(
        key, images.shape, minval=-eps, maxval=eps))
    g = _ce_grad(apply_fn, variables, adv, labels, targeted)
    adv = adv + alpha * jnp.sign(g)
    return clamp_image(images + jnp.clip(adv - images, -eps, eps))


def mifgsm(apply_fn, variables, images, labels, eps, alpha, decay, steps,
           targeted=False):
    """MI-FGSM (Dong et al. 2018): momentum-accumulated signed-gradient
    iterations. Per step the gradient is L1-normalized per image
    (``g / mean(|g|)``; a 1e-12 floor guards the identically-zero-gradient
    corner, where the division is 0/0 in every framework), then
    ``m <- g_norm + decay*m`` and a signed step of size alpha.
    Reference sweep: demo_dL_attack.py:132 (decay=0.1 there)."""
    def body(_, carry):
        adv, mom = carry
        g = _ce_grad(apply_fn, variables, adv, labels, targeted)
        g = g / jnp.maximum(
            jnp.mean(jnp.abs(g), axis=(1, 2, 3), keepdims=True), 1e-12)
        g = g + decay * mom
        adv = adv + alpha * jnp.sign(g)
        adv = clamp_image(images + jnp.clip(adv - images, -eps, eps))
        return adv, g

    adv, _ = jax.lax.fori_loop(
        0, steps, body, (images, jnp.zeros_like(images)))
    return adv


def tpgd(apply_fn, variables, images, eps, alpha, steps, key=None):
    """TPGD (TRADES, Zhang et al. 2019): PGD ascent on the KL divergence
    KL(p_clean || p_adv) — labels are not used. Init ``x + 0.001*N(0,1)``
    (unclamped, as published; the first step's projection clamps). The KL is
    summed over the batch; any positive scaling (sum vs batchmean) leaves the
    signed-gradient trajectory identical. Reference sweep:
    demo_dL_attack.py:99."""
    logit_ori = jax.lax.stop_gradient(apply_fn(variables, images))
    p_ori = jax.nn.softmax(logit_ori.astype(jnp.float32), axis=-1)
    logp_ori = jax.nn.log_softmax(logit_ori.astype(jnp.float32), axis=-1)

    def kl(adv):
        logp_adv = jax.nn.log_softmax(
            apply_fn(variables, adv).astype(jnp.float32), axis=-1)
        return jnp.sum(p_ori * (logp_ori - logp_adv))

    adv0 = images + 0.001 * jax.random.normal(key, images.shape)

    def body(_, adv):
        g = jax.grad(kl)(adv)
        adv = adv + alpha * jnp.sign(g)
        return clamp_image(images + jnp.clip(adv - images, -eps, eps))

    return jax.lax.fori_loop(0, steps, body, adv0)


def eotpgd(apply_fn, variables, images, labels, eps, alpha, steps, eot_iter,
           random_start=True, targeted=False, key=None):
    """EOT-PGD (Athalye et al. 2018 + PGD): each step averages the CE
    gradient over ``eot_iter`` evaluations before taking the signed step.
    For a deterministic victim the evaluations coincide (the expectation is
    over the VICTIM's randomness — e.g. randomized-smoothing defenses);
    the loop still runs so stochastic victims get the published estimator.
    Reference sweep: demo_dL_attack.py:98 (eot_iter=2)."""
    if random_start:
        adv0 = clamp_image(images + jax.random.uniform(
            key, images.shape, minval=-eps, maxval=eps))
    else:
        adv0 = images

    def body(_, adv):
        def acc(_, g):
            return g + _ce_grad(apply_fn, variables, adv, labels, targeted)

        g = jax.lax.fori_loop(0, eot_iter, acc, jnp.zeros_like(adv))
        adv = adv + alpha * jnp.sign(g)
        return clamp_image(images + jnp.clip(adv - images, -eps, eps))

    return jax.lax.fori_loop(0, steps, body, adv0)


def input_diversity(x, key, resize_low: int, diversity_prob):
    """DI²-FGSM input-diversity transform, statically shaped.

    With probability ``diversity_prob``: bilinear-resize to a random
    ``rnd in [resize_low, size)`` and zero-pad back at a random offset.
    Implemented as one ``jax.image.scale_and_translate`` (output shape fixed
    at the input shape, scale/offset traced) — numerically identical to
    resize-then-pad (pinned in tests/test_fgsm_family.py) and differentiable,
    so the attack gradient flows through the transform as published.
    """
    size = x.shape[1]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rnd = jax.random.randint(k1, (), resize_low, size)
    rem = size - rnd
    pad_top = jax.random.randint(k2, (), 0, rem)
    pad_left = jax.random.randint(k3, (), 0, rem)
    scale = rnd.astype(jnp.float32) / size
    transformed = jax.image.scale_and_translate(
        x, x.shape, (1, 2),
        jnp.stack([scale, scale]),
        jnp.stack([pad_top, pad_left]).astype(jnp.float32),
        method="linear", antialias=False)
    use = jax.random.uniform(k4, ()) < diversity_prob
    return jnp.where(use, transformed, x)


def difgsm(apply_fn, variables, images, labels, eps, alpha, decay,
           diversity_prob, steps, resize_rate: float = 0.9,
           random_start=False, targeted=False, key=None):
    """DI²-FGSM (Xie et al. 2019): MI-FGSM whose per-step gradient is taken
    at a randomly resized+padded copy of the iterate (``input_diversity``),
    improving transferability. decay defaults to 0.0 (plain iterative FGSM
    with diversity) matching the torchattacks signature the reference
    sweeps (demo_dL_attack.py:107: resize_rate=0.9, diversity_prob=0.5)."""
    size = images.shape[1]
    resize_low = int(size * resize_rate)
    if not (1 <= resize_low < size):
        raise ValueError(f"resize_rate={resize_rate} leaves no valid sizes")

    if random_start:
        k0, key = jax.random.split(key)
        adv0 = clamp_image(images + jax.random.uniform(
            k0, images.shape, minval=-eps, maxval=eps))
    else:
        adv0 = images

    def body(i, carry):
        adv, mom = carry
        kd = jax.random.fold_in(key, i)

        def loss_at(a):
            xin = input_diversity(a, kd, resize_low, diversity_prob)
            logits = apply_fn(variables, xin).astype(jnp.float32)
            coeff = -1.0 if targeted else 1.0
            return coeff * cross_entropy_mean(logits, labels)

        g = jax.grad(loss_at)(adv)
        g = g / jnp.maximum(
            jnp.mean(jnp.abs(g), axis=(1, 2, 3), keepdims=True), 1e-12)
        g = g + decay * mom
        adv = adv + alpha * jnp.sign(g)
        adv = clamp_image(images + jnp.clip(adv - images, -eps, eps))
        return adv, g

    adv, _ = jax.lax.fori_loop(0, steps, body, (adv0, jnp.zeros_like(images)))
    return adv


# ---------------------------------------------------------------------------
# jit caches (one compile per victim+variant across hyper sweeps)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _gn_cache(apply_fn):
    del apply_fn  # keyed for symmetry; GN never calls the victim
    return jax.jit(lambda images, sigma, key: gn(images, sigma, key))


@functools.lru_cache(maxsize=None)
def _rfgsm_cache(apply_fn, steps: int, targeted: bool):
    return jax.jit(lambda variables, images, labels, key, eps, alpha: rfgsm(
        apply_fn, variables, images, labels, eps, alpha, steps,
        targeted=targeted, key=key))


@functools.lru_cache(maxsize=None)
def _ffgsm_cache(apply_fn, targeted: bool):
    return jax.jit(lambda variables, images, labels, key, eps, alpha: ffgsm(
        apply_fn, variables, images, labels, eps, alpha,
        targeted=targeted, key=key))


@functools.lru_cache(maxsize=None)
def _mifgsm_cache(apply_fn, steps: int, targeted: bool):
    return jax.jit(
        lambda variables, images, labels, eps, alpha, decay: mifgsm(
            apply_fn, variables, images, labels, eps, alpha, decay, steps,
            targeted=targeted))


@functools.lru_cache(maxsize=None)
def _tpgd_cache(apply_fn, steps: int):
    return jax.jit(lambda variables, images, key, eps, alpha: tpgd(
        apply_fn, variables, images, eps, alpha, steps, key=key))


@functools.lru_cache(maxsize=None)
def _eotpgd_cache(apply_fn, steps: int, eot_iter: int, random_start: bool,
                  targeted: bool):
    return jax.jit(lambda variables, images, labels, key, eps, alpha: eotpgd(
        apply_fn, variables, images, labels, eps, alpha, steps, eot_iter,
        random_start=random_start, targeted=targeted, key=key))


@functools.lru_cache(maxsize=None)
def _difgsm_cache(apply_fn, steps: int, resize_rate: float,
                  random_start: bool, targeted: bool):
    return jax.jit(
        lambda variables, images, labels, key, eps, alpha, decay, prob:
        difgsm(apply_fn, variables, images, labels, eps, alpha, decay, prob,
               steps, resize_rate=resize_rate, random_start=random_start,
               targeted=targeted, key=key))


# ---------------------------------------------------------------------------
# reference-shaped classes
# ---------------------------------------------------------------------------


class _Seeded(Attack):
    """Shared fold-in RNG plumbing (same scheme as attacks/pgd.py:PGD)."""

    def __init__(self, victim, name, targeted=False, seed: int = 0):
        super().__init__(victim, name, targeted)
        self.seed = seed
        self._rng_calls = 0

    def _next_key(self):
        self._rng_calls += 1
        return jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                  self._rng_calls)


class VANILA(Attack):
    """Identity baseline (demo_dL_attack.py:100)."""

    def __init__(self, victim: VictimModel):
        super().__init__(victim, "VANILA")

    def forward(self, images, labels):
        del labels
        return vanila(images)


class GN(_Seeded):
    """Gaussian-noise baseline. Accepts ``sigma`` (the reference's kwarg,
    demo_dL_attack.py:101) or ``std`` (the torchattacks parameter name)."""

    def __init__(self, victim: VictimModel, std: float = 0.1,
                 sigma: float = None, seed: int = 0):
        super().__init__(victim, "GN", False, seed)
        self.std = std if sigma is None else sigma
        self._fn = _gn_cache(victim.apply_fn)

    def forward(self, images, labels):
        del labels
        return self._fn(images, self.std, self._next_key())


class RFGSM(_Seeded):
    def __init__(self, victim: VictimModel, eps: float = 8 / 255,
                 alpha: float = 2 / 255, steps: int = 10,
                 targeted: bool = False, seed: int = 0):
        super().__init__(victim, "RFGSM", targeted, seed)
        self.eps, self.alpha, self.steps = eps, alpha, steps
        self._fn = _rfgsm_cache(victim.apply_fn, steps, targeted)

    def forward(self, images, labels):
        labels = self.get_target(images, labels)
        return self._fn(self.victim.variables, images, labels,
                        self._next_key(), self.eps, self.alpha)


class FFGSM(_Seeded):
    def __init__(self, victim: VictimModel, eps: float = 8 / 255,
                 alpha: float = 10 / 255, targeted: bool = False,
                 seed: int = 0):
        super().__init__(victim, "FFGSM", targeted, seed)
        self.eps, self.alpha = eps, alpha
        self._fn = _ffgsm_cache(victim.apply_fn, targeted)

    def forward(self, images, labels):
        labels = self.get_target(images, labels)
        return self._fn(self.victim.variables, images, labels,
                        self._next_key(), self.eps, self.alpha)


class MIFGSM(Attack):
    def __init__(self, victim: VictimModel, eps: float = 8 / 255,
                 alpha: float = 2 / 255, steps: int = 10, decay: float = 1.0,
                 targeted: bool = False):
        super().__init__(victim, "MIFGSM", targeted)
        self.eps, self.alpha, self.steps, self.decay = eps, alpha, steps, decay
        self._fn = _mifgsm_cache(victim.apply_fn, steps, targeted)

    def forward(self, images, labels):
        labels = self.get_target(images, labels)
        return self._fn(self.victim.variables, images, labels,
                        self.eps, self.alpha, self.decay)


class TPGD(_Seeded):
    """TRADES PGD — untargeted only (the objective has no label term)."""

    def __init__(self, victim: VictimModel, eps: float = 8 / 255,
                 alpha: float = 2 / 255, steps: int = 10, seed: int = 0):
        super().__init__(victim, "TPGD", False, seed)
        self.eps, self.alpha, self.steps = eps, alpha, steps
        self._fn = _tpgd_cache(victim.apply_fn, steps)

    def forward(self, images, labels):
        del labels
        return self._fn(self.victim.variables, images, self._next_key(),
                        self.eps, self.alpha)


class EOTPGD(_Seeded):
    def __init__(self, victim: VictimModel, eps: float = 8 / 255,
                 alpha: float = 2 / 255, steps: int = 10, eot_iter: int = 2,
                 random_start: bool = True, targeted: bool = False,
                 seed: int = 0):
        super().__init__(victim, "EOTPGD", targeted, seed)
        self.eps, self.alpha, self.steps = eps, alpha, steps
        self.eot_iter = eot_iter
        self._fn = _eotpgd_cache(victim.apply_fn, steps, eot_iter,
                                 random_start, targeted)

    def forward(self, images, labels):
        labels = self.get_target(images, labels)
        return self._fn(self.victim.variables, images, labels,
                        self._next_key(), self.eps, self.alpha)


class DIFGSM(_Seeded):
    def __init__(self, victim: VictimModel, eps: float = 8 / 255,
                 alpha: float = 2 / 255, steps: int = 10, decay: float = 0.0,
                 resize_rate: float = 0.9, diversity_prob: float = 0.5,
                 random_start: bool = False, targeted: bool = False,
                 seed: int = 0):
        super().__init__(victim, "DIFGSM", targeted, seed)
        self.eps, self.alpha, self.steps, self.decay = eps, alpha, steps, decay
        self.resize_rate, self.diversity_prob = resize_rate, diversity_prob
        self._fn = _difgsm_cache(victim.apply_fn, steps, resize_rate,
                                 random_start, targeted)

    def forward(self, images, labels):
        labels = self.get_target(images, labels)
        return self._fn(self.victim.variables, images, labels,
                        self._next_key(), self.eps, self.alpha, self.decay,
                        self.diversity_prob)
