"""Example: cross-model transfer matrix of a trained attack.

The reference workflow of performance.get_transfer_performance
(performance.py:183-232): build adversaries against one victim, measure
fooling/RMSE/MSE on every model in a zoo.

  python examples/transfer_matrix.py
"""

import os
import sys

# Runnable as `python examples/transfer_matrix.py` from a source checkout
# (no install needed): the script dir is on sys.path, the repo root isn't.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from dl_attack_on_imagenet_tpu import evaluation as ev
from dl_attack_on_imagenet_tpu.attacks import PGD
from dl_attack_on_imagenet_tpu.models import create_model


def main():
    victims = {
        "victim-a": create_model("tiny", rng=jax.random.PRNGKey(7)),
        "victim-b": create_model("tiny", rng=jax.random.PRNGKey(8)),
        "victim-c": create_model("tiny", rng=jax.random.PRNGKey(9)),
    }
    source = victims["victim-a"]
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (32, 32, 32, 3)))
    y = np.asarray(source.predict(x))
    loader = [(x[i : i + 16], y[i : i + 16]) for i in range(0, 32, 16)]

    atks = {"pgd": [PGD(source, eps=16 / 255, alpha=4 / 255, steps=10)]}
    matrix = ev.get_transfer_performance(atks, victims, loader)

    print(f"{'target':10s} {'fooling':>8s} {'rmse':>10s} {'mse':>10s}")
    for name, perf in matrix["pgd"].items():
        print(f"{name:10s} {perf['fooling_rate']:8.3f} {perf['rmse']:10.5f} {perf['mse']:10.4f}")


if __name__ == "__main__":
    main()
