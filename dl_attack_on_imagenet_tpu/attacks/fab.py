"""FAB: Fast Adaptive Boundary attack (l∞), untargeted and targeted.

The reference's baseline grid carries torchattacks rows
``FAB(model, eps=8/255, steps=100, n_classes=10, n_restarts=1,
targeted=False/True)`` (demo_dL_attack.py:102-103). torchattacks wraps the
authors' code; this is a from-the-paper implementation (Croce & Hein,
"Minimally distorted adversarial examples with a fast adaptive boundary
attack", ICML 2019), TPU-first: each run is one jitted ``lax.fori_loop``;
the per-candidate decision-boundary linearization uses a vmapped ``jacrev``
(one lockstep jacobian instead of the reference code's per-class backward
passes). The candidate class is selected by the released code's
unconstrained dual-norm distance |f_l|/‖w_l‖₁ (one reduction over the
jacobian), and the paper's exact l∞ projection onto {hyperplane ∩ box} is
then solved for the winner only, by a safeguarded-NEWTON waterfill
(``linf_hyperplane_box_project_t``): G(t) = Σ|w_i|·min(t, room_i) is
concave piecewise-linear, so Newton from 0 converges monotonically from
below and lands exactly, using only elementwise ops + reductions. No
per-candidate deltas are ever materialized — peak HBM is the (n, K, d)
jacobian, which is what lets the reference row (b64 × 9 candidates ×
150528 dims) run on one v5e; the exact sort/cumsum waterfill
(``linf_hyperplane_box_project``) is kept as the small-shape reference
implementation the tests cross-check against.

Paper mechanics (Alg. 1 with the released defaults alpha_max=0.1, eta=1.05,
beta=0.9):
- per step, linearize f_c = z_c - z_y at the iterate for the top
  ``n_classes - 1`` non-true candidate classes (re-ranked each step), and
  project BOTH the iterate and the original point onto each candidate's
  linearized boundary inside the [0,1] box, exactly, wrt l∞;
- move to the convex combination (1-a)(x_i + eta*d_i) + a(x_orig +
  eta*d_orig) of the extrapolated projections, a = min(||d_i|| / (||d_i||
  + ||d_orig||), alpha_max), box-clipped;
- whenever the iterate is misclassified, record it if it beats the best l∞
  distance so far, then take the backward step (1-beta)x_orig + beta*x.
FAB minimizes distortion — ``eps`` only sizes the random-restart sampling
radius (min(best_dist, eps)/2, the released scheme) and is NOT a projection
budget; per the torchattacks contract the attack returns the best
adversarial found, or the clean image for never-fooled inputs.

Only norm='Linf' (the reference rows' operating point) is implemented; the
L2/L1 projections have no reference call site.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import VictimModel
from .base import Attack

ALPHA_MAX = 0.1
ETA = 1.05
BETA = 0.9


def linf_hyperplane_box_project(x, w, hval):
    """Exact min-l∞ move of ``x`` (in [0,1]^d) onto {z: h(z)=0} for the
    linear model h(z) = hval + <w, z - x>, staying inside the box.

    Waterfill: every coordinate moves against sign(hval)*sign(w_i) by up to
    t; coordinate i saturates at its box wall after room_i; the reached
    decrease is G(t) = sum_i |w_i| min(t, room_i), nondecreasing piecewise
    linear — solve G(t*) = |hval| at the sorted knots. Returns (delta, t*);
    t* = +inf when the hyperplane is unreachable inside the box.

    Shapes: x, w (..., d); hval (...). Vectorized over leading dims.
    """
    a = jnp.abs(w)
    s = -jnp.sign(hval)[..., None] * jnp.sign(w)
    room = jnp.where(s > 0, 1.0 - x, jnp.where(s < 0, x, jnp.inf))
    # w_i == 0 contributes nothing; give it infinite room so it never caps G
    room = jnp.where(a > 0, room, jnp.inf)
    target = jnp.abs(hval)

    order = jnp.argsort(room, axis=-1)
    r_s = jnp.take_along_axis(room, order, axis=-1)
    a_s = jnp.take_along_axis(a, order, axis=-1)
    total = jnp.sum(a_s, axis=-1, keepdims=True)
    pre_a = jnp.cumsum(a_s, axis=-1)
    pre_ar = jnp.cumsum(a_s * jnp.where(jnp.isfinite(r_s), r_s, 0.0), axis=-1)
    # G at knot k. Infinite-room knots (w_i == 0 coords, sorted last) cap G
    # at pre_ar: for target > 0 every inf-room coordinate has |w_i| == 0
    # (s == 0 with |w_i| > 0 needs hval == 0, and target == 0 reaches at
    # knot 0 regardless), so the true remaining slope there is exactly zero.
    # Computing it as total - pre_a and multiplying by the inf knot used to
    # turn f32 cumsum residue into +inf, inverting unreachability whenever
    # zero-weight coordinates existed.
    slope_after = total - pre_a
    g_knot = pre_ar + jnp.where(jnp.isfinite(r_s), slope_after * r_s, 0.0)

    # first knot whose G >= target
    reach = g_knot >= target[..., None]
    k = jnp.argmax(reach, axis=-1)
    any_reach = jnp.any(reach, axis=-1)

    def gather(v, idx):
        return jnp.take_along_axis(v, idx[..., None], axis=-1)[..., 0]

    pre_a_km1 = jnp.where(k > 0, gather(pre_a, jnp.maximum(k - 1, 0)), 0.0)
    pre_ar_km1 = jnp.where(k > 0, gather(pre_ar, jnp.maximum(k - 1, 0)), 0.0)
    slope = total[..., 0] - pre_a_km1
    t = (target - pre_ar_km1) / jnp.maximum(slope, 1e-30)
    t = jnp.where(any_reach, jnp.maximum(t, 0.0), jnp.inf)

    # moving coords have s != 0; infinite-room coords always have s == 0
    # (only w_i == 0 / hval == 0 produce them), and infeasible projections
    # (t = inf) return delta = 0 — guard both against 0 * inf NaNs.
    move = jnp.minimum(t[..., None], room)
    delta = jnp.where((s != 0) & jnp.isfinite(move), s * move, 0.0)
    delta = jnp.where(jnp.isfinite(t[..., None]), delta, 0.0)
    return delta, t


def linf_hyperplane_box_project_t(x, w, hval, max_iters: int = 64):
    """Newton twin of :func:`linf_hyperplane_box_project`, t* only.

    G(t) = sum_i |w_i| min(t, room_i) is CONCAVE piecewise-linear and
    nondecreasing, so safeguarded Newton from t=0 converges to t*
    monotonically from below (the tangent at any t < t* over-estimates G,
    so each update stays <= t*); in exact arithmetic it lands exactly once
    the iterate enters t*'s final linear segment, and in f32 a relative
    stopping rule (step <= 1e-6·t) ends the loop once the iterate is
    converged past the twin-test tolerance — without it, rows whose target
    sits at the f32 reduction's noise floor dither in tiny positive steps
    to the ``max_iters`` safety cap, and one such row in a batch drags
    every row's wall time with it. Typical convergence is < 10 iterations.
    Memory-light by design: every temporary is an ELEMENTWISE
    function of (x, w) followed by a reduction — no sort, no cumsum, no
    index gather — so peak HBM stays at the operands themselves. This is
    the production path for FAB at the reference operating point, where the
    sort/cumsum waterfill's value+index temporaries faulted the v5e
    (BENCHMARKS.md round 4); the sort version remains the small-shape
    reference implementation the tests cross-check.

    Returns t* with +inf where the hyperplane is unreachable in the box.
    """
    a = jnp.abs(w)
    s = -jnp.sign(hval)[..., None] * jnp.sign(w)
    # w_i == 0 => s == 0 => room 0: contributes 0 to G either way (the sort
    # version's inf-room convention is only needed to avoid capping G).
    room = jnp.where(s > 0, 1.0 - x, jnp.where(s < 0, x, 0.0))
    target = jnp.abs(hval)
    gmax = jnp.sum(a * room, axis=-1)
    feasible = gmax >= target

    def cond(carry):
        i, t, active = carry
        return (i < max_iters) & jnp.any(active)

    def body(carry):
        i, t, _ = carry
        te = t[..., None]
        # one fused pass over (a, room): value + right-derivative of G
        g = jnp.sum(a * jnp.minimum(te, room), axis=-1)
        gp = jnp.sum(jnp.where(room > te, a, 0.0), axis=-1)
        step = jnp.where(feasible,
                         jnp.maximum((target - g), 0.0)
                         / jnp.maximum(gp, 1e-30), 0.0)
        t_new = t + step
        return i + 1, t_new, step > 1e-6 * t_new

    _, t, _ = jax.lax.while_loop(
        cond, body, (0, jnp.zeros_like(target), feasible))
    return jnp.where(feasible, t, jnp.inf)


def linf_hyperplane_box_delta(x, w, hval, t):
    """The projection step for a known t*: each coordinate moves against
    sign(hval)·sign(w_i) by min(t*, room_i); zero where unreachable."""
    s = -jnp.sign(hval)[..., None] * jnp.sign(w)
    room = jnp.where(s > 0, 1.0 - x, jnp.where(s < 0, x, 0.0))
    move = jnp.minimum(t[..., None], room)
    return jnp.where((s != 0) & jnp.isfinite(t)[..., None], s * move, 0.0)


def _fab_run(apply_fn, variables, images, labels, x0, targets, steps: int,
             n_cand: int, targeted: bool):
    """One FAB run from ``x0``. Returns (x_best, d_best, found)."""
    x = images.astype(jnp.float32)
    n = x.shape[0]
    d = int(x[0].size)
    flat = lambda u: u.reshape(n, d)

    def logits_of(u):
        return apply_fn(variables, u).astype(jnp.float32)

    def cand_classes(logits):
        if targeted:
            return targets[:, None]  # (n, 1) — logits unused (None passed)
        masked = jnp.where(
            jax.nn.one_hot(labels, logits.shape[-1], dtype=bool),
            -jnp.inf, logits)
        return jnp.argsort(masked, axis=-1)[:, -n_cand:]  # (n, K)

    def f_and_jac(u, cands):
        # f_c = z_c - z_y and its input-jacobian for each candidate class,
        # one vmapped jacrev (deepfool.py uses the same lockstep pattern)
        def per_image(ui, yi, ci):
            def sel(uu):
                z = apply_fn(variables, uu[None]).astype(jnp.float32)[0]
                return z[ci] - z[yi]

            return sel(ui), jax.jacrev(sel)(ui)

        f, jac = jax.vmap(per_image)(u, labels, cands)
        return f, jac.reshape(n, cands.shape[1], d)

    def body(_, carry):
        x_i, x_best, d_best, found = carry
        # Targeted mode never reads the iterate's logits (the candidate set
        # IS the target), so the ranking forward exists only untargeted.
        # XLA already DCE'd the dead forward (FAB-T re-measured flat at
        # 13.1 s/batch either way, BENCHMARKS.md round 4) — tracing it only
        # untargeted just makes the 2-fwd-1-bwd targeted step explicit.
        cands = cand_classes(logits_of(x_i)) if not targeted \
            else cand_classes(None)
        f, w = f_and_jac(x_i, cands)  # (n,K), (n,K,d)

        # Candidate selection: the released FAB code picks the closest
        # linearized boundary by the UNCONSTRAINED dual-norm distance
        # |f_l| / ||w_l||_1 (l∞ point-to-hyperplane duality; torchattacks
        # fab.py `dist1 = df.abs() / dg.abs().sum(...)`), NOT by the
        # box-projected distance — so the exact hyperplane∩box waterfill is
        # needed only for the WINNING candidate. One ||w||_1 reduction over
        # the (n, K, d) jacobian replaces a 60-pass bisection over it; peak
        # HBM stays at the jacobian itself.
        xi_f = flat(x_i)  # (n,d)
        dist1 = jnp.abs(f) / jnp.maximum(
            jnp.sum(jnp.abs(w), axis=-1), 1e-12)  # (n,K)

        best_c = jnp.argmin(dist1, axis=-1)  # (n,)
        idx = jnp.arange(n)
        w_b = w[idx, best_c]  # (n,d)
        f_b = f[idx, best_c]
        # Box-unreachable winner (t* = inf): saturate every coordinate
        # toward the boundary (t capped at 1 >= all rooms in the unit box)
        # instead of freezing with delta = 0 — the released code's
        # Lagrangian projection has no infeasibility branch and yields
        # exactly this saturating point, and since the dual-norm selection
        # does not screen for box feasibility, a frozen iterate would
        # otherwise re-select the same candidate forever.
        cap = lambda t: jnp.where(jnp.isfinite(t), t, 1.0)
        t_i_b = cap(linf_hyperplane_box_project_t(xi_f, w_b, f_b))
        d_i = linf_hyperplane_box_delta(xi_f, w_b, f_b, t_i_b)
        # same linear model, projected from the ORIGINAL point
        h_b = f_b + jnp.sum(w_b * (flat(x) - xi_f), axis=-1)
        t_o_b = cap(linf_hyperplane_box_project_t(flat(x), w_b, h_b))
        d_o = linf_hyperplane_box_delta(flat(x), w_b, h_b, t_o_b)
        ni = jnp.max(jnp.abs(d_i), axis=-1)
        no = jnp.max(jnp.abs(d_o), axis=-1)
        alpha = jnp.clip(ni / jnp.maximum(ni + no, 1e-12), 0.0, ALPHA_MAX)

        x_new = (1.0 - alpha)[:, None] * (flat(x_i) + ETA * d_i) \
            + alpha[:, None] * (flat(x) + ETA * d_o)
        x_new = jnp.clip(x_new, 0.0, 1.0).reshape(x.shape)

        pred = jnp.argmax(logits_of(x_new), axis=-1)
        # Success is MISCLASSIFICATION in both modes: the paper's targeted
        # variant (Croce & Hein ICML 2020 §4, "FAB-T") restricts only the
        # boundary linearization to the target class as a scalability
        # device — the success test stays pred != y, and the authors'
        # released targeted code records `y1 != y` identically. (Replaces
        # the round-4 `pred == target` guess; PARITY.md, round-5 note.)
        fooled = pred != labels
        dist = jnp.max(jnp.abs(flat(x_new) - flat(x)), axis=-1)
        better = fooled & (dist < d_best)
        x_best = jnp.where(better[:, None, None, None], x_new, x_best)
        d_best = jnp.where(better, dist, d_best)
        found = found | fooled

        # backward step toward the original where misclassified (beta=0.9)
        x_next = jnp.where(fooled[:, None, None, None],
                           (1.0 - BETA) * x + BETA * x_new, x_new)
        return x_next, x_best, d_best, found

    carry = (x0.astype(jnp.float32), x, jnp.full((n,), jnp.inf),
             jnp.zeros((n,), bool))
    _, x_best, d_best, found = jax.lax.fori_loop(0, steps, body, carry)
    return x_best.astype(images.dtype), d_best, found


@functools.lru_cache(maxsize=None)
def _fab_cache(apply_fn, steps: int, n_cand: int, targeted: bool):
    return jax.jit(
        lambda variables, images, labels, x0, targets: _fab_run(
            apply_fn, variables, images, labels, x0, targets, steps, n_cand,
            targeted))


class FAB(Attack):
    def __init__(self, victim: VictimModel, norm: str = "Linf",
                 eps: float = 8 / 255, steps: int = 10, n_restarts: int = 1,
                 alpha_max: float = ALPHA_MAX, eta: float = ETA,
                 beta: float = BETA, n_classes: int = 10,
                 targeted: bool = False, seed: int = 0):
        super().__init__(victim, "FAB", targeted)
        if norm.lower() != "linf":
            raise ValueError(
                "FAB: only norm='Linf' (the reference rows' operating point, "
                "demo_dL_attack.py:102-103) is implemented")
        if (alpha_max, eta, beta) != (ALPHA_MAX, ETA, BETA):
            raise ValueError("alpha_max/eta/beta are fixed at the paper's "
                             "0.1/1.05/0.9")
        self.eps, self.steps, self.n_restarts = eps, steps, n_restarts
        self.n_classes, self.seed = n_classes, seed
        self._rng_calls = 0
        n_cand = 1 if targeted else max(n_classes - 1, 1)
        self._fn = _fab_cache(victim.apply_fn, steps, n_cand, targeted)

    def _restart_point(self, images, key, radius):
        u = 2.0 * jax.random.uniform(key, images.shape) - 1.0
        mx = jnp.max(jnp.abs(u), axis=(1, 2, 3), keepdims=True)
        r = radius[:, None, None, None]
        return jnp.clip(images + 0.5 * r * u / jnp.maximum(mx, 1e-12), 0, 1)

    def forward(self, images, labels):
        self._rng_calls += 1
        base = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                  self._rng_calls)
        if self.targeted:
            order = jnp.argsort(self.victim(images), axis=-1)
            n_cand = min(self.n_classes - 1, order.shape[-1] - 1)
            target_sets = [order[:, -r] for r in range(2, 2 + n_cand)]
        else:
            target_sets = [labels]

        x_out = images
        d_out = jnp.full(images.shape[:1], jnp.inf)
        run = 0
        for targets in target_sets:
            for r in range(self.n_restarts):
                if r == 0:
                    x0 = images
                else:
                    radius = jnp.minimum(d_out, self.eps)
                    radius = jnp.where(jnp.isfinite(radius), radius, self.eps)
                    x0 = self._restart_point(
                        images, jax.random.fold_in(base, run), radius)
                run += 1
                xb, db, fnd = self._fn(self.victim.variables, images, labels,
                                       x0, targets)
                better = fnd & (db < d_out)
                x_out = jnp.where(better[:, None, None, None], xb, x_out)
                d_out = jnp.where(better, db, d_out)
        return x_out
