"""Example: train an adversarial dictionary and attack held-out images.

Mirrors the reference's core workflow (demo_dL_attack.py) as a minimal
script. Runs self-contained on synthetic data (pass --data-root for a real
ILSVRC tree).

  python examples/train_dictionary.py                  # synthetic, tiny victim
  python examples/train_dictionary.py --model resnet50 --data-root ./data/ImageNet
"""

import argparse
import os
import sys

# Runnable as `python examples/train_dictionary.py` from a source checkout
# (no install needed): the script dir is on sys.path, the repo root isn't.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dl_attack_on_imagenet_tpu.attacks import ADIL
from dl_attack_on_imagenet_tpu.data import ArrayDataset, load_imagenet, split_by_class
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--data-root", default=None)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--n-atoms", type=int, default=8)
    p.add_argument("--eps", type=float, default=8 / 255)
    args = p.parse_args()

    victim = create_model(args.model, rng=jax.random.PRNGKey(0))

    if args.data_root:
        folder = load_imagenet(args.data_root)
        dataset = folder.materialize()
        train, val, test = split_by_class(dataset, [10, 2, 5])
    else:
        size = victim.input_size
        x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (32, size, size, 3)))
        dataset = ArrayDataset(x, np.arange(32) % 4)
        train, val, test = split_by_class(dataset, [4, 2, 2], number_of_classes=4)

    attack = ADIL(
        victim,
        eps=args.eps,
        n_atoms=args.n_atoms,
        steps=args.steps,
        batch_size=min(16, len(train)),
        loss="logits",
        data_train=train,
        data_val=val,
        model_name=f"{args.model}-example",
        cache=ArtifactCache("trained_dicts"),
        verbose=True,
        metrics_log="trained_dicts/train_metrics.jsonl",
    )
    if attack.timing:
        print("training throughput:", attack.timing)
    else:
        print("dictionary loaded from cache (trained_dicts/) — delete it to retrain")

    x_test = jnp.asarray(test.images[:8], jnp.float32)
    adv = attack(x_test)
    clean = victim.predict(x_test)
    fooled = float(jnp.mean((victim.predict(adv) != clean).astype(jnp.float32)))
    # NOTE: the default inference mode is the reference's DDrague solver,
    # which eps-clamps its latent z but returns dv = D D†z — the projection
    # onto span(D), which is not l∞-contractive, so max|dv| can exceed eps
    # (faithful reference property, adil.py:560-567; use
    # attack.forward_supervised_adamw(x) for a hard l1-code budget).
    print(f"held-out fooling rate: {fooled:.3f}; "
          f"max perturbation {float(jnp.max(jnp.abs(adv - jnp.clip(x_test, 0, 1)))):.4f} "
          f"(eps budget on z: {args.eps:.4f})")


if __name__ == "__main__":
    main()
