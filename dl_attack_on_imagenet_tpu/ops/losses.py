"""Attack losses: CW margin ('logits') and cross-entropy, targeted/untargeted.

Reference: adil.py:103-112 (``f_loss``), criterion construction at
adil.py:146 / :544 and the ``coeff`` sign convention (adil.py:128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cw_margin_loss(
    logits: jax.Array,
    labels: jax.Array,
    kappa: float = 50.0,
    targeted: bool = False,
) -> jax.Array:
    """Carlini-Wagner margin loss, per-sample.

    Untargeted: clamp(logit[label] - runner_up, min=-kappa) — minimizing
    drives the true-class logit below the runner-up. Targeted (labels =
    target class): clamp(runner_up - logit[t], min=-kappa).

    Reference: adil.py:103-112 (``f_loss``). Faithful detail: the reference
    computes the runner-up as ``max((1 - one_hot) * outputs)`` (adil.py:106),
    which leaves a literal 0 in the true-class slot — so the runner-up is
    FLOORED AT ZERO whenever every non-true logit is negative (and in that
    regime carries no gradient to any logit). We replicate that exactly;
    masking the true class to -inf instead changes both loss values and
    gradients in the all-negative-logits regime. The reference also
    materializes a CPU-side eye matrix per call; here the one-hot mask is
    traced in-graph.
    """
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    true_logit = jnp.sum(logits * one_hot, axis=-1)
    # max over (1 - one_hot) * logits: true-class slot contributes 0
    # (reference adil.py:106 semantics — see docstring).
    runner_up = jnp.max((1.0 - one_hot) * logits, axis=-1)
    if targeted:
        margin = runner_up - true_logit
    else:
        margin = true_logit - runner_up
    return jnp.maximum(margin, -kappa)


def cross_entropy_sum(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Sum-reduced softmax cross entropy (reference uses reduction='sum')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.sum(nll)


def cross_entropy_mean(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean-reduced softmax cross entropy (reference DDP / inference path)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def dlr_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Difference-of-Logits-Ratio loss, per-sample (Croce & Hein, ICML 2020,
    eq. 6) — the scale-invariant objective behind APGD-DLR (the reference's
    commented 'APGD'/'AutoAttack' baseline rows, demo_dL_attack.py:137-138).

    Untargeted: -(z_y - max_{i!=y} z_i) / (z_pi1 - z_pi3 + 1e-12), where
    pi sorts logits descending. MAXIMIZED by the attack.
    """
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    true_logit = jnp.sum(logits * one_hot, axis=-1)
    other = jnp.max(jnp.where(one_hot > 0, -jnp.inf, logits), axis=-1)
    sorted_z = jnp.sort(logits, axis=-1)  # ascending
    z1, z3 = sorted_z[:, -1], sorted_z[:, -3]
    return -(true_logit - other) / (z1 - z3 + 1e-12)


def dlr_loss_targeted(logits: jax.Array, labels: jax.Array,
                      targets: jax.Array) -> jax.Array:
    """Targeted DLR, per-sample (Croce & Hein 2020, eq. 7 — APGD-T):
    -(z_y - z_t) / (z_pi1 - (z_pi3 + z_pi4)/2 + 1e-12). MAXIMIZED."""
    idx = jnp.arange(logits.shape[0])
    true_logit = logits[idx, labels]
    target_logit = logits[idx, targets]
    sorted_z = jnp.sort(logits, axis=-1)
    z1, z3, z4 = sorted_z[:, -1], sorted_z[:, -3], sorted_z[:, -4]
    return -(true_logit - target_logit) / (z1 - 0.5 * (z3 + z4) + 1e-12)


def attack_loss(
    logits: jax.Array,
    labels: jax.Array,
    loss: str = "ce",
    targeted: bool = False,
    kappa: float = 50.0,
    reduction: str = "sum",
) -> jax.Array:
    """Dispatch on the reference's two loss modes.

    'ce':     coeff * CE with coeff = +1 targeted / -1 untargeted
              (adil.py:128, :179-180).
    'logits': CW margin summed (adil.py:181-182); sign handled inside the
              margin itself, no coeff.
    """
    if loss == "ce":
        coeff = 1.0 if targeted else -1.0
        if reduction == "mean":
            return coeff * cross_entropy_mean(logits, labels)
        return coeff * cross_entropy_sum(logits, labels)
    if loss == "logits":
        margins = cw_margin_loss(logits, labels, kappa=kappa, targeted=targeted)
        if reduction == "mean":
            return jnp.mean(margins)
        return jnp.sum(margins)
    raise ValueError(f"unknown loss: {loss}")
