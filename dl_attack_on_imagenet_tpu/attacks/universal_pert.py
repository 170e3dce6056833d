"""Moosavi-style universal perturbation (iterated DeepFool).

Reference: /root/reference/attacks/attacks_classes/universal_pert.py:25-115.
Loops over the dataset accumulating DeepFool increments for images the
current perturbation fails to fool, projecting onto the lp ball, until the
validation fooling rate reaches 1-delta (or the iteration cap).

Differences from the reference, by documented intent (SURVEY.md §2.4):
- validation fooling is measured over the WHOLE val set (the reference
  breaks after the first batch, universal_pert.py:92-104);
- the perturbation is returned and optionally saved via the artifact cache
  (the reference np.save's to a name-mangled file in cwd).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data import as_array_dataset
from ..models import VictimModel
from .deepfool import cached_deepfool, cached_predict_fn
from .uap_pgd import additive_fooling_rate, fold_increments


def universal_perturbation(
    data_train,
    data_val,
    victim: VictimModel,
    delta: float = 0.2,
    max_iter_uni: int = 100,
    xi: float = 20 / 255.0,
    p: str = "linf",
    num_classes: int = 10,
    overshoot: float = 0.02,
    max_iter_df: int = 10,
    seed: int = 0,
    verbose: bool = False,
    save_path: Optional[str] = None,
    chunk: int = 1,
) -> Tuple[jax.Array, list]:
    """Returns (perturbation (H,W,C), fooling-rate history).

    ``p``: 'l2' or 'linf' (the reference's np.inf). ``delta`` controls the
    target fooling rate 1-delta (universal_pert.py:31).

    ``chunk`` batches the per-image gate + DeepFool solve (VERDICT round-2
    #7): the clean/perturbed predictions for a chunk come from two batched
    forwards, DeepFool runs lockstep over the gated subset (``active_init``),
    and accepted increments fold in image order with the projection between
    folds. ``chunk=1`` (default) reproduces the reference's strictly
    sequential trajectory (universal_pert.py:55-110) exactly; larger chunks
    gate against the chunk-start perturbation. Measured on the v5e
    (benchmarks/attack_family_bench.py universal_e2e, n=64, df<=10):
    chunk=1 5.8 s/pass vs chunk=8 13.5 s — sequential wins because the
    accumulated perturbation fools later images before their turn (gate
    skips the solve), while a chunk gates against the stale pass-start
    perturbation and always pays the lockstep solve; chunk stays a knob
    for slow-dispatch hosts.
    """
    train = as_array_dataset(data_train)
    val = as_array_dataset(data_val)
    images = jnp.asarray(train.images, jnp.float32)
    val_images = jnp.asarray(val.images, jnp.float32)
    n = len(train)
    vars_ = victim.variables

    # Shared across calls/instances (deepfool.py::cached_deepfool) — the
    # DeepFool jacrev compile is paid once per victim, not per invocation.
    df = cached_deepfool(victim.apply_fn, num_classes, overshoot, max_iter_df)
    predict1 = cached_predict_fn(victim.apply_fn)

    v = jnp.zeros(train.image_shape)
    fooling_rate = 0.0
    history = []
    rng = np.random.default_rng(seed)
    n_iter = 0

    xi_t = jnp.float32(xi)
    while fooling_rate < 1 - delta and n_iter < max_iter_uni:
        order = rng.permutation(n)
        for s in range(0, n, chunk):
            idx_np = order[s : s + chunk]
            valid = None
            if len(idx_np) < chunk:
                # Pad the ragged tail to the chunk shape (one compile for
                # the jitted gate/DeepFool/fold kernels); padded rows are
                # gated inactive below.
                pad = chunk - len(idx_np)
                valid = jnp.arange(chunk) < chunk - pad
                idx_np = np.concatenate([idx_np, np.repeat(idx_np[-1:], pad)])
            idx = jnp.asarray(idx_np)
            x = jnp.take(images, idx, axis=0)
            pert = x + v[None]
            gate = predict1(vars_, x) == predict1(vars_, pert)
            if valid is not None:
                gate = gate & valid
            if not bool(jnp.any(gate)):
                continue
            dr, iters = df(vars_, pert, active_init=gate)
            accept = gate & (iters < max_iter_df - 1)
            v = fold_increments(v, dr, accept, xi_t, p)
        fooling_rate = additive_fooling_rate(
            victim.apply_fn, vars_, v[None], val_images
        )
        history.append(fooling_rate)
        n_iter += 1
        if verbose:
            print(f"[universal_pert] iter {n_iter} fooling {fooling_rate:.3f}")

    if save_path:
        # .npy persistence parity (universal_pert.py:112-113), explicit path
        # instead of the reference's name-mangled cwd file.
        np.save(save_path, np.asarray(v))
    return v, history
