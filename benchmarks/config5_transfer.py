"""Config-5 on chip: ViT-B/16 ADiL dictionary + cross-architecture transfer.

BASELINE.json config 5 — "ViT-B/16 attack with enlarged dictionary +
cross-architecture transfer sweep" (reference workflow:
performance.py:183-232 ``get_transfer_performance``) — measured with REAL
zoo architectures at 224²/b64 on the v5e (VERDICT round-4 directive #2):

1. train 4 zoo victims (vit_b16, resnet50, mobilenet_v2, densenet121) on
   the same separable synthetic set until they genuinely classify
   (protocol of benchmarks/fooling_realism.py — no ImageNet/pretrained
   weights exist in this environment),
2. learn an ADIL dictionary with an ENLARGED K=200 against ViT-B/16
   (config 5's operating point; a resnet50-sourced K=100 row is added so
   the result is a real source×target matrix),
3. run evaluation.get_transfer_performance across all victims on the
   held-out split at b64.

    python benchmarks/config5_transfer.py

Results -> benchmarks/out_transfer.json + BENCHMARKS.md round 5.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import fooling_realism as fr  # dataset + on-chip victim training protocol

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out_transfer.json")

VICTIMS = ("vit_b16", "resnet50", "mobilenet_v2", "densenet121")
TRAIN_STEPS = {"vit_b16": 300}  # ViT from scratch needs a few more steps
DEFAULT_STEPS = 150
BATCH = 64


def main():
    from dl_attack_on_imagenet_tpu.attacks import ADIL
    from dl_attack_on_imagenet_tpu.data import ArrayDataset
    from dl_attack_on_imagenet_tpu.evaluation import (
        get_transfer_performance,
        metrics,
    )
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.utils import ArtifactCache

    images, labels = fr.make_dataset(7)
    train_x, val_x = images[: fr.N_TRAIN], images[fr.N_TRAIN :]
    train_y, val_y = labels[: fr.N_TRAIN], labels[fr.N_TRAIN :]
    ds_train = ArrayDataset(np.asarray(train_x), np.asarray(train_y))

    report = {"victims": {}, "sources": {}}
    victims = {}
    for name in VICTIMS:
        t0 = time.perf_counter()
        v = create_model(
            name, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
            **fr.victim_kwargs(name),
        )
        v, loss, train_dt = fr.train_victim(
            v, train_x, train_y, steps=TRAIN_STEPS.get(name, DEFAULT_STEPS)
        )
        acc = metrics.model_accuracy(
            ArrayDataset(np.asarray(val_x), np.asarray(val_y)), v
        )
        victims[name] = v
        report["victims"][name] = {
            "val_acc": round(float(acc), 4),
            "train_loss": round(loss, 4),
            "train_seconds": round(train_dt, 1),
            "wall_seconds": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps({name: report["victims"][name]}), flush=True)

    shutil.rmtree("/tmp/config5_dicts", ignore_errors=True)
    cache = ArtifactCache("/tmp/config5_dicts")

    # source dictionaries: config 5's enlarged-K ViT row + a resnet50 row
    sources = [("vit_b16", 200, 40), ("resnet50", 100, 40)]
    atks = {}
    for src, k_atoms, steps in sources:
        t0 = time.perf_counter()
        atk = ADIL(
            victims[src], eps=8 / 255, n_atoms=k_atoms, loss="logits",
            kappa=50.0, steps=steps, batch_size=BATCH, steps_inference=30,
            cache=cache, model_name=f"c5_{src}", seed=0, val_every=10,
            verbose=False,
        )
        atk.learn_dictionary(ds_train, None)
        learn_dt = time.perf_counter() - t0
        hist = atk.history
        key = f"adil@{src}_K{k_atoms}"
        atks[key] = [atk]
        report["sources"][key] = {
            "n_atoms": k_atoms,
            "epochs": len(hist["loss"]),
            "final_train_fooling": round(hist["fooling_rate"][-1], 3),
            "learn_seconds": round(learn_dt, 1),
        }
        print(json.dumps({key: report["sources"][key]}), flush=True)

    data = [(np.asarray(val_x), np.asarray(val_y))]  # one b64 batch
    t0 = time.perf_counter()
    matrix = get_transfer_performance(atks, victims, data)
    transfer_dt = time.perf_counter() - t0

    report["transfer_seconds"] = round(transfer_dt, 1)
    report["matrix"] = {
        src: {
            tgt: {m: round(float(val), 4) for m, val in row.items()}
            for tgt, row in cols.items()
        }
        for src, cols in matrix.items()
    }
    print(json.dumps({"matrix": report["matrix"]}, indent=1), flush=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
