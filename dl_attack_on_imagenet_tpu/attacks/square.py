"""Square Attack (l∞): gradient-free random search with square patches.

The reference's baseline grid carries the torchattacks row
``Square(model, eps=8/255, n_queries=5000, n_restarts=1, loss='ce')``
(demo_dL_attack.py:104). torchattacks wraps the authors' code; this is a
from-the-paper implementation (Andriushchenko et al., "Square Attack: a
query-efficient black-box adversarial attack via random search", ECCV 2020),
TPU-first: the whole query loop is one jitted ``lax.while_loop`` over the
batch (per-image active masking replaces the reference code's gather of
not-yet-fooled rows — same trajectory per image, constant shapes for XLA),
early-exiting once every image is fooled. ``eps`` is traced, so an eps sweep
shares one compile per (victim, n_queries, loss).

Paper mechanics (Alg. 2 + the released p-schedule):
- init: full-height vertical stripes of ±eps per (column, channel);
- square side s_i = round(sqrt(p_i · h · w)) clipped to [1, h-1], with the
  released piecewise p-schedule halving p at fractions {0.001, 0.005, 0.02,
  0.05, 0.1, 0.2, 0.4, 0.6, 0.8} of the query budget;
- each query: a uniform square location per image, one fresh ±eps value per
  channel painted over the square (in the eps-ball delta, then box-clipped),
  accepted iff the objective strictly improves;
- objective minimized: the margin f_y - max_{c≠y} f_c ('margin'), or -CE
  ('ce' — the reference's operating point); an image counts fooled when its
  MARGIN goes negative regardless of the acceptance objective.
Dropped detail of record: the released code resamples a candidate whose
box-clip makes it a no-op (saving the wasted query); here a no-op candidate
is simply rejected by the strict-improvement test — query accounting can
differ slightly, the accepted trajectory cannot.

Only norm='Linf' (the reference row's operating point) is implemented; the
L2 variant's pseudo-gaussian bump construction has no reference call site.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..models import VictimModel
from .base import Attack


def _p_schedule(p_init: float, n_queries: int) -> np.ndarray:
    """Released piecewise schedule, precomputed per query index."""
    frac = (np.arange(n_queries, dtype=np.float64) / max(n_queries, 1)) * 10000
    halvings = np.zeros(n_queries, np.int32)
    for k, lo in enumerate((10, 50, 200, 500, 1000, 2000, 4000, 6000, 8000)):
        halvings = np.where(frac > lo, k + 1, halvings)
    return p_init / (2.0 ** halvings)


def _sizes(p_init: float, n_queries: int, h: int, w: int) -> np.ndarray:
    p = _p_schedule(p_init, n_queries)
    s = np.round(np.sqrt(p * h * w)).astype(np.int32)
    return np.clip(s, 1, h - 1)


def square_linf(apply_fn, variables, images, labels, eps, n_queries,
                loss: str = "margin", p_init: float = 0.8, targeted=False,
                key=None):
    """Jittable Square-l∞. Returns (adv, margin) — fooled where margin < 0."""
    x = images.astype(jnp.float32)
    n, h, w, c = x.shape
    s_arr = jnp.asarray(_sizes(p_init, n_queries, h, w))

    def objective(u):
        logits = apply_fn(variables, u).astype(jnp.float32)
        one_hot = jax.nn.one_hot(labels, logits.shape[-1],
                                 dtype=logits.dtype)
        true_logit = jnp.sum(logits * one_hot, axis=-1)
        other = jnp.max(jnp.where(one_hot > 0, -jnp.inf, logits), axis=-1)
        margin = (other - true_logit) if targeted else (true_logit - other)
        if loss == "margin":
            obj = margin
        elif loss == "ce":
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            obj = -ce if not targeted else ce
        else:
            raise ValueError(f"unknown Square loss: {loss}")
        return obj, margin

    # init: vertical ±eps stripes per (column, channel)
    stripes = eps * (2.0 * jax.random.bernoulli(
        jax.random.fold_in(key, 0), 0.5, (n, 1, w, c)).astype(jnp.float32)
        - 1.0)
    x_best = jnp.clip(x + stripes, 0.0, 1.0)
    obj_min, margin_min = objective(x_best)

    rows = jnp.arange(h)
    cols = jnp.arange(w)

    def cond(carry):
        i, _, _, margin = carry
        return (i < n_queries) & jnp.any(margin > 0)

    def body(carry):
        i, x_best, obj_min, margin_min = carry
        k = jax.random.fold_in(key, i + 1)
        k1, k2, k3 = jax.random.split(k, 3)
        s = s_arr[i]
        h0 = jax.random.randint(k1, (n,), 0, h - s + 1)
        w0 = jax.random.randint(k2, (n,), 0, w - s + 1)
        rho = eps * (2.0 * jax.random.bernoulli(
            k3, 0.5, (n, 1, 1, c)).astype(jnp.float32) - 1.0)
        in_h = (rows[None, :] >= h0[:, None]) & (rows[None, :] < h0[:, None] + s)
        in_w = (cols[None, :] >= w0[:, None]) & (cols[None, :] < w0[:, None] + s)
        window = (in_h[:, :, None] & in_w[:, None, :])[..., None]  # (n,h,w,1)

        delta = x_best - x
        cand_delta = jnp.where(window, rho, delta)
        cand = jnp.clip(x + jnp.clip(cand_delta, -eps, eps), 0.0, 1.0)
        obj_c, margin_c = objective(cand)

        active = margin_min > 0
        improved = active & (obj_c < obj_min)
        i4 = improved[:, None, None, None]
        x_best = jnp.where(i4, cand, x_best)
        obj_min = jnp.where(improved, obj_c, obj_min)
        margin_min = jnp.where(improved, margin_c, margin_min)
        return i + 1, x_best, obj_min, margin_min

    _, x_best, _, margin_min = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), x_best, obj_min, margin_min))
    return x_best.astype(images.dtype), margin_min


@functools.lru_cache(maxsize=None)
def _square_cache(apply_fn, n_queries: int, loss: str, p_init: float,
                  targeted: bool):
    return jax.jit(
        lambda variables, images, labels, key, eps: square_linf(
            apply_fn, variables, images, labels, eps, n_queries, loss=loss,
            p_init=p_init, targeted=targeted, key=key))


class Square(Attack):
    def __init__(self, victim: VictimModel, norm: str = "Linf",
                 eps: float = 8 / 255, n_queries: int = 5000,
                 n_restarts: int = 1, p_init: float = 0.8,
                 loss: str = "ce", seed: int = 0, targeted: bool = False):
        super().__init__(victim, "Square", targeted)
        if norm.lower() != "linf":
            raise ValueError(
                "Square: only norm='Linf' (the reference row's operating "
                "point, demo_dL_attack.py:104) is implemented")
        self.eps, self.n_queries, self.n_restarts = eps, n_queries, n_restarts
        self.loss, self.p_init, self.seed = loss, p_init, seed
        self._rng_calls = 0
        self._fn = _square_cache(victim.apply_fn, n_queries, loss, p_init,
                                 targeted)

    def forward(self, images, labels):
        labels = self.get_target(images, labels)
        self._rng_calls += 1
        base = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                  self._rng_calls)
        out, best_margin = None, None
        for r in range(self.n_restarts):
            adv, margin = self._fn(self.victim.variables, images, labels,
                                   jax.random.fold_in(base, r), self.eps)
            if out is None:
                out, best_margin = adv, margin
            else:
                take = margin < best_margin
                out = jnp.where(take[:, None, None, None], adv, out)
                best_margin = jnp.where(take, margin, best_margin)
        return out
