"""OnePixel attack: black-box differential evolution over a few pixels.

The reference's baseline grid carries the torchattacks row
``OnePixel(model, pixels=5, inf_batch=50)`` (demo_dL_attack.py:105). This is
a from-the-paper implementation (Su et al., "One pixel attack for fooling
deep neural networks", 2019) at torchattacks' operating point: scipy-style
``differential_evolution(strategy='best1bin', init='random',
recombination=1, mutation=(0.5, 1), polish=False)`` with the per-pixel
bounds ``[(0, H), (0, W)] + [(0, 1)] * C`` and a per-image early stop once
the best member fools — rebuilt TPU-first:

- the whole evolution is ONE jitted ``lax.while_loop``; all N images evolve
  their populations in lockstep with per-image freeze masks replacing
  torchattacks' serial per-image scipy calls (same per-image math — images
  never interact);
- population energies (the true-class softmax probability being minimized,
  torchattacks ``OnePixel._loss``) are evaluated through the victim in
  ``inf_batch``-sized chunks via ``lax.map`` — the knob the reference row
  sets to 50. Candidates are PAINTED inside each chunk (the chunk gathers
  its source images and applies its candidate parameters right before the
  forward), so peak live memory is ``inf_batch`` adversarial images, not
  the full ``n*pop`` candidate tensor — ``inf_batch`` bounds HBM as well
  as the forward batch (advisor round-3 medium);
- candidate application is exact torchattacks ``_perturb`` semantics:
  ``int()`` truncation of the two coordinates, channels overwritten.

Documented divergences from the scipy path torchattacks drives (both noted
because scipy's defaults are stateful/serial in ways XLA can't be):
- *deferred* population updating (scipy's ``updating='immediate'`` mutates
  the population mid-generation member-by-member; the deferred rule is what
  scipy itself switches to whenever ``workers != 1``);
- out-of-bounds mutant entries are resampled uniformly inside their bounds
  (scipy ``_ensure_constraint``), with the resample driven by this loop's
  own fold_in RNG rather than scipy's global ``RandomState`` stream.

Population size follows torchattacks exactly: ``popmul = max(1, popsize //
dims)`` is passed to scipy as its multiplier, so the population holds
``popmul * dims`` members (``dims = pixels * (2 + C)``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import VictimModel
from .base import Attack


def _apply_candidate(img, cand, h: int, w: int):
    """Paint one candidate onto one image (torchattacks ``_perturb``).

    ``cand`` is (pixels, 2+C): int-truncated (row, col) then the channel
    values that overwrite that pixel.
    """

    def body(i, im):
        row = jnp.clip(cand[i, 0].astype(jnp.int32), 0, h - 1)
        col = jnp.clip(cand[i, 1].astype(jnp.int32), 0, w - 1)
        return im.at[row, col, :].set(cand[i, 2:].astype(im.dtype))

    return jax.lax.fori_loop(0, cand.shape[0], body, img)


def one_pixel_de(apply_fn, variables, images, labels, *, steps: int,
                 pixels: int, pop: int, inf_batch: int, targeted: bool,
                 recombination: float = 1.0, key=None):
    """Jittable vectorized DE. Returns (adv, best_energy, best_fooled).

    Energy per candidate is the softmax probability of ``labels`` (untargeted
    — minimized) or ``1 - p_target`` (targeted), torchattacks ``_loss``; the
    early-stop test is the torchattacks callback's: does the argmax of the
    current BEST member differ from the label (match the target)?
    """
    if key is None:
        raise ValueError(
            "one_pixel_de requires an explicit PRNG key (e.g. "
            "jax.random.PRNGKey(seed)) — the evolution stream is derived "
            "from it by fold_in per generation")
    x = images.astype(jnp.float32)
    n, h, w, c = x.shape
    dims = pixels * (2 + c)
    lo = jnp.tile(jnp.array([0.0, 0.0] + [0.0] * c, jnp.float32), pixels)
    hi = jnp.tile(jnp.array([float(h), float(w)] + [1.0] * c, jnp.float32),
                  pixels)

    def energies(pop_all):
        # Chunk over CANDIDATE PARAMETERS (tiny: (pixels, 2+c) floats each)
        # and paint inside the chunk body, so only inf_batch adversarial
        # images are ever live — inf_batch bounds peak HBM, not just the
        # victim's forward batch (advisor round-3 medium finding).
        cands = pop_all.reshape(n * pop, pixels, 2 + c)
        src = jnp.arange(n * pop, dtype=jnp.int32) // pop
        pad = (-(n * pop)) % inf_batch
        if pad:
            cands = jnp.pad(cands, ((0, pad), (0, 0), (0, 0)))
            src = jnp.pad(src, (0, pad))
        cand_chunks = cands.reshape(-1, inf_batch, pixels, 2 + c)
        src_chunks = src.reshape(-1, inf_batch)

        def fwd(args):
            cds, isrc = args
            advs = jax.vmap(
                lambda i, cd: _apply_candidate(x[i], cd, h, w))(isrc, cds)
            logits = apply_fn(variables, advs).astype(jnp.float32)
            return jax.nn.softmax(logits, axis=-1), jnp.argmax(logits, -1)

        probs, preds = jax.lax.map(fwd, (cand_chunks, src_chunks))
        probs = probs.reshape(-1, probs.shape[-1])[: n * pop]
        preds = preds.reshape(-1)[: n * pop].reshape(n, pop)
        p_lab = jnp.take_along_axis(
            probs.reshape(n, pop, -1), labels[:, None, None], axis=2)[..., 0]
        if targeted:
            return 1.0 - p_lab, preds == labels[:, None]
        return p_lab, preds != labels[:, None]

    def span(k, shape):
        return lo + (hi - lo) * jax.random.uniform(k, shape + (dims,))

    # init='random': uniform within bounds (the torchattacks call site).
    pop0 = span(jax.random.fold_in(key, 0), (n, pop))
    e0, s0 = energies(pop0)

    members = jnp.arange(pop)

    def best_state(pop_all, e, s):
        bidx = jnp.argmin(e, axis=1)
        bcand = jnp.take_along_axis(pop_all, bidx[:, None, None], axis=1)[:, 0]
        bfool = jnp.take_along_axis(s, bidx[:, None], axis=1)[:, 0]
        return bcand, bfool

    def cond(carry):
        step, _, e, s = carry
        _, bfool = best_state(carry[1], e, s)
        return (step < steps) & jnp.any(~bfool)

    def body(carry):
        step, pop_all, e, s = carry
        k = jax.random.fold_in(key, step + 1)
        kf, ka, kb, kx, kg, kr = jax.random.split(k, 6)
        # scipy dithering: one F per generation, uniform in [0.5, 1).
        f = jax.random.uniform(kf, (), minval=0.5, maxval=1.0)
        best, _ = best_state(pop_all, e, s)

        # r1, r2: distinct members, both != j (exact without-replacement).
        j = members[None, :]
        a = jax.random.randint(ka, (n, pop), 0, pop - 1)
        r1 = a + (a >= j)
        b = jax.random.randint(kb, (n, pop), 0, pop - 2)
        lo_j = jnp.minimum(j, r1)
        hi_j = jnp.maximum(j, r1)
        r2 = b + (b >= lo_j)
        r2 = r2 + (r2 >= hi_j)

        take = lambda idx: jnp.take_along_axis(  # noqa: E731
            pop_all, idx[..., None], axis=1)
        mutant = best[:, None, :] + f * (take(r1) - take(r2))
        viol = (mutant < lo) | (mutant > hi)
        mutant = jnp.where(viol, span(kg, (n, pop)), mutant)

        # binomial crossover with one guaranteed dimension per member.
        cross = jax.random.uniform(kx, (n, pop, dims)) < recombination
        forced = jax.nn.one_hot(
            jax.random.randint(kr, (n, pop), 0, dims), dims, dtype=bool)
        trial = jnp.where(cross | forced, mutant, pop_all)

        e_t, s_t = energies(trial)
        _, bfool = best_state(pop_all, e, s)
        accept = (e_t < e) & ~bfool[:, None]
        pop_all = jnp.where(accept[..., None], trial, pop_all)
        e = jnp.where(accept, e_t, e)
        s = jnp.where(accept, s_t, s)
        return step + 1, pop_all, e, s

    _, pop_f, e_f, s_f = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), pop0, e0, s0))
    bcand, bfool = best_state(pop_f, e_f, s_f)
    adv = jax.vmap(
        lambda img, cd: _apply_candidate(
            img, cd.reshape(pixels, 2 + c), h, w))(x, bcand)
    return adv.astype(images.dtype), jnp.min(e_f, axis=1), bfool


@functools.lru_cache(maxsize=None)
def _one_pixel_cache(apply_fn, steps: int, pixels: int, pop: int,
                     inf_batch: int, targeted: bool, recombination: float):
    return jax.jit(
        lambda variables, images, labels, key: one_pixel_de(
            apply_fn, variables, images, labels, steps=steps, pixels=pixels,
            pop=pop, inf_batch=inf_batch, targeted=targeted,
            recombination=recombination, key=key))


class OnePixel(Attack):
    """Reference row: ``OnePixel(model, pixels=5, inf_batch=50)``.

    Documented divergence of record — stateful per-instance RNG: each
    ``forward`` advances ``_rng_calls`` and folds it into ``PRNGKey(seed)``,
    so calling the SAME instance twice on identical inputs draws fresh
    randomness (matching torchattacks' consumption of the ambient torch RNG
    stream across calls). Runs are reproducible per (seed, call-sequence);
    for idempotent calls construct a fresh instance or reset ``_rng_calls``.
    The other stochastic baselines (Square/FAB/APGD/fgsm_family) share this
    convention.
    """

    def __init__(self, victim: VictimModel, pixels: int = 1, steps: int = 10,
                 popsize: int = 10, inf_batch: int = 128, seed: int = 0,
                 targeted: bool = False, recombination: float = 1.0):
        super().__init__(victim, "OnePixel", targeted)
        self.pixels, self.steps, self.popsize = pixels, steps, popsize
        self.inf_batch, self.seed = inf_batch, seed
        self.recombination = recombination
        self._rng_calls = 0

    def population(self, n_channels: int) -> int:
        """torchattacks' scipy multiplier: pop = max(1, popsize//dims)·dims."""
        dims = self.pixels * (2 + n_channels)
        popmul = max(1, self.popsize // dims)
        return max(popmul * dims, 5)  # best1bin needs j, r1, r2 + best

    def forward(self, images, labels):
        labels = self.get_target(images, labels)
        fn = _one_pixel_cache(self.victim.apply_fn, self.steps, self.pixels,
                              self.population(images.shape[-1]),
                              self.inf_batch, self.targeted,
                              self.recombination)
        self._rng_calls += 1
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                 self._rng_calls)
        adv, _, _ = fn(self.victim.variables, images, labels, key)
        return adv
