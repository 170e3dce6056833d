"""AutoAttack: the parameter-free ensemble over APGD-CE/APGD-T/FAB-T/Square.

The reference's baseline grid carries the torchattacks row
``AutoAttack(model, norm='Linf', eps=eps, n_classes=1000)``
(demo_dL_attack.py:138). This is the ensemble of Croce & Hein (ICML 2020)
composed from this package's own implementations (attacks/apgd.py,
attacks/fab.py, attacks/square.py):

- 'standard': APGD-CE, APGD-T (targeted DLR, 9 target classes), FAB-T,
  Square — the published standard suite;
- 'rand': APGD-CE and APGD-DLR with EOT gradient averaging (eot_iter=20),
  the published variant for randomized defenses.

Sequencing follows the paper: initially-misclassified images keep their
clean input; each attack contributes adversarial examples only for images
no earlier attack fooled. The official implementation gathers the
still-robust subset before each attack to save compute; under XLA that
would recompile per subset shape, so each attack runs on the full batch and
the ensemble merges by mask — per-image results are identical because every
member attack is per-image independent.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models import VictimModel
from .apgd import APGD, APGDT
from .base import Attack
from .fab import FAB
from .square import Square


class AutoAttack(Attack):
    def __init__(self, victim: VictimModel, norm: str = "Linf",
                 eps: float = 8 / 255, version: str = "standard",
                 n_classes: int = 10, seed: int = 0, steps: int = 100,
                 n_queries: int = 5000, attacks_to_run=None):
        super().__init__(victim, "AutoAttack", False)
        if norm.lower() != "linf":
            raise ValueError(
                "AutoAttack: only norm='Linf' (the reference row's operating "
                "point, demo_dL_attack.py:138) is implemented")
        self.eps, self.version, self.seed = eps, version, seed
        # the published suite uses 9 target classes regardless of how many
        # the dataset has (n_classes only caps it for small label spaces)
        n_target = min(9, max(n_classes - 1, 1)) + 1
        if attacks_to_run is None:
            if version == "standard":
                attacks_to_run = ("apgd-ce", "apgd-t", "fab-t", "square")
            elif version == "rand":
                attacks_to_run = ("apgd-ce-rand", "apgd-dlr-rand")
            else:
                raise ValueError(f"unknown AutoAttack version: {version}")
        self.attacks_to_run = tuple(attacks_to_run)
        builders = {
            "apgd-ce": lambda: APGD(victim, eps=eps, steps=steps, loss="ce",
                                    seed=seed),
            "apgd-dlr": lambda: APGD(victim, eps=eps, steps=steps,
                                     loss="dlr", seed=seed),
            "apgd-t": lambda: APGDT(victim, eps=eps, steps=steps,
                                    n_classes=n_target, seed=seed),
            "fab-t": lambda: FAB(victim, eps=eps, steps=steps,
                                 n_classes=n_target, targeted=True,
                                 seed=seed),
            "square": lambda: Square(victim, eps=eps, n_queries=n_queries,
                                     loss="margin", seed=seed),
            "apgd-ce-rand": lambda: APGD(victim, eps=eps, steps=steps,
                                         loss="ce", eot_iter=20, seed=seed),
            "apgd-dlr-rand": lambda: APGD(victim, eps=eps, steps=steps,
                                          loss="dlr", eot_iter=20,
                                          seed=seed),
        }
        self._attacks = [(name, builders[name]()) for name in
                         self.attacks_to_run]

    def forward(self, images, labels):
        clean_pred = self.victim.predict(images)
        robust = clean_pred == labels  # already-misclassified: keep clean
        adv_out = images
        for _, atk in self._attacks:
            if not bool(jnp.any(robust)):
                break
            cand = atk(images, labels)
            # FAB is minimum-distortion: only in-budget results count here
            dist = jnp.max(jnp.abs(cand - images), axis=(1, 2, 3))
            fooled = (self.victim.predict(cand) != labels) \
                & (dist <= self.eps + 1e-6)
            take = robust & fooled
            adv_out = jnp.where(take[:, None, None, None], cand, adv_out)
            robust = robust & ~fooled
        return adv_out
