"""Auto-PGD (APGD) and its targeted variant APGD-T.

The reference's baseline grid carries torchattacks rows for
``APGD(model, loss='ce', norm='Linf', eps=eps, steps=100)`` and the
AutoAttack ensemble built on it (demo_dL_attack.py:137-138). torchattacks is
an external dependency of the reference, so this is a from-the-paper
implementation (Croce & Hein, "Reliable evaluation of adversarial robustness
with an ensemble of diverse parameter-free attacks", ICML 2020), TPU-first:
the whole budget-aware schedule — momentum step, per-image step-size
halving at the paper's checkpoint sequence, best-iterate restarts — runs as
one jitted ``lax.fori_loop`` with per-image carried counters; ``eps`` and
the targeted-class vector are traced arguments, so an eps sweep and all
APGD-T target ranks share one compile per (victim, steps, norm, loss).

Paper mechanics implemented exactly:
- init on the eps-ball surface (Linf: ``x + eps*u/max|u|``, u~U(-1,1)^d;
  L2: ``x + eps*g/||g||``, g~N(0,1)^d), clamped to [0,1];
- eta0 = 2*eps; momentum alpha = 0.75 from the second step (1.0 first);
- checkpoint fractions p0=0, p1=0.22, p_{j+1} = p_j + max(p_j - p_{j-1}
  - 0.03, 0.06); w_j = ceil(p_j * n_iter);
- halve the per-image step when (cond1) fewer than rho=0.75 of the
  interval's updates improved the objective, OR (cond2) the step AND the
  best objective are both unchanged since the previous checkpoint; on a
  halving, restart the iterate from the best point seen (momentum reset —
  the carried previous iterate is set to the restart point);
- objective MAXIMIZED: per-image CE or DLR (ops/losses.py:dlr_loss), and
  targeted DLR for APGD-T (eq. 7).

Returned per image: the last iterate that actually fooled the victim, or —
if none ever did — the highest-objective iterate (x_best).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..models import VictimModel
from ..ops import dlr_loss, dlr_loss_targeted
from .base import Attack

RHO = 0.75
ALPHA_MOMENTUM = 0.75


def _schedule(n_iter: int):
    """Checkpoint mask + interval length per iteration (static)."""
    p = [0.0, 0.22]
    while p[-1] < 1.0:
        p.append(p[-1] + max(p[-1] - p[-2] - 0.03, 0.06))
    ckpts = sorted({min(int(math.ceil(pj * n_iter)), n_iter) for pj in p[1:]})
    is_ck = np.zeros(n_iter, bool)
    interval = np.zeros(n_iter, np.float32)
    prev = 0
    for w in ckpts:
        if 1 <= w <= n_iter:
            is_ck[w - 1] = True
            interval[w - 1] = w - prev
            prev = w
    return jnp.asarray(is_ck), jnp.asarray(interval)


def _per_image_loss(logits, labels, targets, loss: str):
    logits = logits.astype(jnp.float32)
    if loss == "ce":
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if loss == "dlr":
        return dlr_loss(logits, labels)
    if loss == "dlr-targeted":
        return dlr_loss_targeted(logits, labels, targets)
    raise ValueError(f"unknown APGD loss: {loss}")


def apgd(apply_fn, variables, images, labels, eps, steps,
         norm: str = "linf", loss: str = "ce", targets=None,
         eot_iter: int = 1, key=None):
    """One APGD run (jittable). ``targets`` required for 'dlr-targeted'.

    Returns (adv, succ): per-image result and ever-fooled flag."""
    x = images.astype(jnp.float32)
    n = x.shape[0]
    is_ck, interval = _schedule(steps)
    targeted = loss == "dlr-targeted"
    if targets is None:
        targets = labels  # unused by untargeted losses

    def ball_box(u):
        if norm == "linf":
            u = x + jnp.clip(u - x, -eps, eps)
        else:
            d = u - x
            nrm = jnp.sqrt(jnp.sum(d * d, axis=(1, 2, 3), keepdims=True))
            u = x + d * jnp.minimum(1.0, eps / jnp.maximum(nrm, 1e-12))
        return jnp.clip(u, 0.0, 1.0)

    def obj(u):
        logits = apply_fn(variables, u)
        per = _per_image_loss(logits, labels, targets, loss)
        pred = jnp.argmax(logits, axis=-1)
        return jnp.sum(per), (per, pred)

    def val_grad(u):
        if eot_iter == 1:
            (_, aux), g = jax.value_and_grad(obj, has_aux=True)(u)
            return aux, g

        def acc(_, carry):
            g_acc, _ = carry
            (_, aux), g = jax.value_and_grad(obj, has_aux=True)(u)
            return g_acc + g, aux

        g, aux = jax.lax.fori_loop(
            0, eot_iter, acc, (jnp.zeros_like(u), (jnp.zeros((n,)),
                                                  jnp.zeros((n,), jnp.int32))))
        return aux, g / eot_iter

    # -- init on the ball surface -----------------------------------------
    if norm == "linf":
        u = 2.0 * jax.random.uniform(key, x.shape) - 1.0
        mx = jnp.max(jnp.abs(u), axis=(1, 2, 3), keepdims=True)
        x0 = x + eps * u / jnp.maximum(mx, 1e-12)
    else:
        u = jax.random.normal(key, x.shape)
        nrm = jnp.sqrt(jnp.sum(u * u, axis=(1, 2, 3), keepdims=True))
        x0 = x + eps * u / jnp.maximum(nrm, 1e-12)
    x0 = jnp.clip(x0, 0.0, 1.0)

    (f0, pred0), g0 = val_grad(x0)
    succ0 = (pred0 == targets) if targeted else (pred0 != labels)
    step0 = jnp.full((n,), 2.0) * eps

    def body(i, carry):
        (x_adv, x_old, g, f_adv, x_best, f_best, g_best, x_bad, succ,
         step, cnt, ck_step, ck_fbest) = carry
        s4 = step[:, None, None, None]
        a = jnp.where(i == 0, 1.0, ALPHA_MOMENTUM)
        if norm == "linf":
            z = x_adv + s4 * jnp.sign(g)
        else:
            gn = jnp.sqrt(jnp.sum(g * g, axis=(1, 2, 3), keepdims=True))
            z = x_adv + s4 * g / jnp.maximum(gn, 1e-12)
        z = ball_box(z)
        x_new = ball_box(x_adv + a * (z - x_adv) + (1.0 - a) * (x_adv - x_old))

        (f_new, pred), g_new = val_grad(x_new)
        improved = f_new > f_adv
        cnt = cnt + improved.astype(jnp.float32)

        better = f_new > f_best
        b4 = better[:, None, None, None]
        x_best = jnp.where(b4, x_new, x_best)
        g_best = jnp.where(b4, g_new, g_best)
        f_best = jnp.where(better, f_new, f_best)

        fooled = (pred == targets) if targeted else (pred != labels)
        x_bad = jnp.where(fooled[:, None, None, None], x_new, x_bad)
        succ = succ | fooled

        # checkpoint logic (paper sec. 3.1; rho = 0.75)
        ck = is_ck[i]
        cond1 = cnt < RHO * interval[i]
        cond2 = (step == ck_step) & (f_best == ck_fbest)
        halve = ck & (cond1 | cond2)
        step = jnp.where(halve, step * 0.5, step)
        h4 = halve[:, None, None, None]
        x_next = jnp.where(h4, x_best, x_new)
        g_next = jnp.where(h4, g_best, g_new)
        f_next = jnp.where(halve, f_best, f_new)
        x_old_next = jnp.where(h4, x_best, x_adv)  # momentum reset on restart
        ck_step = jnp.where(ck, step, ck_step)
        ck_fbest = jnp.where(ck, f_best, ck_fbest)
        cnt = jnp.where(ck, 0.0, cnt)
        return (x_next, x_old_next, g_next, f_next, x_best, f_best, g_best,
                x_bad, succ, step, cnt, ck_step, ck_fbest)

    carry = (x0, x0, g0, f0, x0, f0, g0, x0, succ0,
             step0, jnp.zeros((n,)), step0, f0)
    (x_adv, _, _, _, x_best, _, _, x_bad, succ, *_ ) = jax.lax.fori_loop(
        0, steps, body, carry)
    adv = jnp.where(succ[:, None, None, None], x_bad, x_best)
    return adv.astype(images.dtype), succ


@functools.lru_cache(maxsize=None)
def _apgd_cache(apply_fn, steps: int, norm: str, loss: str, eot_iter: int):
    return jax.jit(
        lambda variables, images, labels, targets, key, eps: apgd(
            apply_fn, variables, images, labels, eps, steps, norm=norm,
            loss=loss, targets=targets, eot_iter=eot_iter, key=key))


class APGD(Attack):
    """Untargeted APGD (loss 'ce' or 'dlr'), n_restarts merged per image:
    the first restart to fool an image wins; never-fooled images keep the
    first run's highest-objective iterate."""

    def __init__(self, victim: VictimModel, norm: str = "Linf",
                 eps: float = 8 / 255, steps: int = 10, n_restarts: int = 1,
                 seed: int = 0, loss: str = "ce", eot_iter: int = 1,
                 rho: float = RHO):
        super().__init__(victim, "APGD", False)
        if rho != RHO:
            raise ValueError("rho is fixed at the paper's 0.75")
        self.norm = norm.lower()
        if self.norm not in ("linf", "l2"):
            raise ValueError(f"unsupported norm: {norm}")
        self.eps, self.steps, self.n_restarts = eps, steps, n_restarts
        self.loss, self.seed = loss, seed
        self._rng_calls = 0
        self._fn = _apgd_cache(victim.apply_fn, steps, self.norm, loss,
                               eot_iter)

    def forward(self, images, labels):
        self._rng_calls += 1
        base = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                  self._rng_calls)
        out, succ = None, None
        for r in range(self.n_restarts):
            adv, s = self._fn(self.victim.variables, images, labels, labels,
                              jax.random.fold_in(base, r), self.eps)
            if out is None:
                out, succ = adv, s
            else:
                take = (~succ) & s
                out = jnp.where(take[:, None, None, None], adv, out)
                succ = succ | s
        return out


class APGDT(Attack):
    """APGD-Targeted: one targeted-DLR run per candidate class (the 2nd
    through n_classes-th most-probable clean classes), first success per
    image wins. All runs share ONE compile (the target vector is traced)."""

    def __init__(self, victim: VictimModel, norm: str = "Linf",
                 eps: float = 8 / 255, steps: int = 10, n_restarts: int = 1,
                 seed: int = 0, eot_iter: int = 1, n_classes: int = 10):
        super().__init__(victim, "APGDT", True)
        self.norm = norm.lower()
        self.eps, self.steps, self.n_restarts = eps, steps, n_restarts
        self.seed, self.n_classes = seed, n_classes
        self._rng_calls = 0
        self._fn = _apgd_cache(victim.apply_fn, steps, self.norm,
                               "dlr-targeted", eot_iter)

    def forward(self, images, labels):
        self._rng_calls += 1
        base = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                  self._rng_calls)
        order = jnp.argsort(self.victim(images), axis=-1)  # ascending
        out, succ = None, None
        n_cand = min(self.n_classes - 1, order.shape[-1] - 1)
        for rank in range(2, 2 + n_cand):
            targets = order[:, -rank]
            for r in range(self.n_restarts):
                adv, s = self._fn(self.victim.variables, images, labels,
                                  targets,
                                  jax.random.fold_in(base, rank * 131 + r),
                                  self.eps)
                if out is None:
                    out, succ = adv, s
                else:
                    take = (~succ) & s
                    out = jnp.where(take[:, None, None, None], adv, out)
                    succ = succ | s
        return out
