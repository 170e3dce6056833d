"""Baseline-grid fooling realism: the full commented grid vs a TRAINED victim.

The round-4 baseline-suite table (benchmarks/baseline_suite_bench.py) runs
the reference's commented grid (/root/reference/demo_dL_attack.py:96-143)
against a RANDOM-weight victim, so its fooling column is a sanity signal
only — a random ResNet's argmax is nearly input-insensitive, which is why
Square reads 0.20 there while the gradient attacks read 1.00. This driver
re-runs every grid row against the on-chip TRAINED synthetic victim from
benchmarks/fooling_realism.py (bf16 ResNet-50 fitted until it actually
classifies, so its margins respond to perturbations like a pretrained
model) and reports what the reference's harness would (performance.py:
154-177): fooling among the CORRECTLY-CLASSIFIED inputs, the achieved
distortion, and wall time. Because the trained victim resists apgd-ce,
this is also the first measurement of AutoAttack's cascade outside the
short-circuit regime (the random-victim run ended after member 1).

    python benchmarks/baseline_fooling_realism.py            # everything
    python benchmarks/baseline_fooling_realism.py fab square  # subset

Results land in benchmarks/out_baseline_fooling.json and feed BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import fooling_realism as fr  # dataset + on-chip victim training (same config)

EPS = 8 / 255


def main(only=(), victim_name="resnet50", train_steps=150):
    from dl_attack_on_imagenet_tpu.attacks import (
        APGD, APGDT, BIM, CW, DeepFool, DIFGSM, EOTPGD, FAB, FFGSM, FGSM,
        GN, MIFGSM, PGD, RFGSM, TPGD, VANILA, AutoAttack, OnePixel, Square,
    )
    from dl_attack_on_imagenet_tpu.data import ArrayDataset
    from dl_attack_on_imagenet_tpu.evaluation import metrics
    from dl_attack_on_imagenet_tpu.models import create_model

    victim = create_model(
        victim_name, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
        **fr.victim_kwargs(victim_name),
    )
    images, labels = fr.make_dataset(7)
    train_x, val_x = images[: fr.N_TRAIN], images[fr.N_TRAIN:]
    train_y, val_y = labels[: fr.N_TRAIN], labels[fr.N_TRAIN:]
    victim, final_loss, train_dt = fr.train_victim(
        victim, train_x, train_y, steps=train_steps)
    acc_val = metrics.model_accuracy(
        ArrayDataset(np.asarray(val_x), np.asarray(val_y)), victim)

    predict = jax.jit(
        lambda img: jnp.argmax(
            victim.apply_fn(victim.variables, img).astype(jnp.float32), -1))
    # The reference harness filters to correctly-classified inputs
    # (performance.py:163-166); fooling is reported over that subset.
    correct = np.asarray(predict(val_x) == val_y)
    n_correct = int(correct.sum())
    x = val_x
    y = val_y

    results = {"victim": victim_name, "train_loss": round(final_loss, 4),
               "val_acc": round(float(acc_val), 4),
               "n_val": int(val_x.shape[0]), "n_correct": n_correct,
               "train_seconds": round(train_dt, 1)}
    print(json.dumps({"victim_train": results}), flush=True)

    def run(tag, build, note=""):
        if only and tag not in only:
            return
        atk = build()
        t0 = time.perf_counter()
        adv = atk(x, y)
        jax.block_until_ready(adv)
        dt = time.perf_counter() - t0
        pred = np.asarray(predict(adv))
        fooled = (pred != np.asarray(y)) & correct
        fool = float(fooled.sum()) / max(n_correct, 1)
        delta = np.asarray(adv.astype(jnp.float32) - x)
        linf = float(np.abs(delta).max())
        l2 = float(np.sqrt((delta.reshape(len(delta), -1) ** 2).sum(-1)).mean())
        row = {"fooling_correct": round(fool, 4), "linf": round(linf, 5),
               "mean_l2": round(l2, 3), "s_per_batch": round(dt, 3),
               "note": note}
        results[tag] = row
        print(json.dumps({"bench": tag, **row}), flush=True)

    a = 2 / 255
    run("vanila", lambda: VANILA(victim), "demo:100")
    run("gn", lambda: GN(victim, sigma=0.1), "sigma=0.1 (demo:101)")
    run("fgsm", lambda: FGSM(victim, eps=EPS), "demo:131")
    run("ffgsm", lambda: FFGSM(victim, eps=EPS, alpha=10 / 255), "demo:132")
    run("rfgsm", lambda: RFGSM(victim, eps=EPS, alpha=a, steps=100), "demo:97")
    run("pgd100", lambda: PGD(victim, eps=EPS, alpha=a, steps=100,
                              random_start=True), "demo:134")
    run("bim100", lambda: BIM(victim, eps=EPS, alpha=a, steps=100), "demo:96")
    run("mifgsm", lambda: MIFGSM(victim, eps=EPS, alpha=a, steps=100,
                                 decay=0.1), "demo:133")
    run("tpgd", lambda: TPGD(victim, eps=EPS, alpha=a, steps=100), "demo:99")
    run("eotpgd", lambda: EOTPGD(victim, eps=EPS, alpha=a, steps=100,
                                 eot_iter=2), "demo:98")
    run("difgsm", lambda: DIFGSM(victim, eps=EPS, alpha=a, steps=100,
                                 diversity_prob=0.5, resize_rate=0.9),
        "demo:106")
    run("deepfool", lambda: DeepFool(victim, steps=100), "demo:128")
    run("cw_c1", lambda: CW(victim, c=1.0, steps=100, lr=0.001),
        "c=1 from the demo:129 grid")
    run("apgd", lambda: APGD(victim, eps=EPS, steps=100, loss="ce"),
        "demo:136")
    run("apgdt", lambda: APGDT(victim, eps=EPS, steps=100, n_classes=10),
        "AA standard member")
    run("square", lambda: Square(victim, eps=EPS, n_queries=5000, loss="ce"),
        "demo:104")
    run("fab", lambda: FAB(victim, eps=EPS, steps=100, n_classes=10),
        "demo:102")
    run("fabt", lambda: FAB(victim, eps=EPS, steps=100, n_classes=10,
                            targeted=True), "demo:103")
    run("onepixel", lambda: OnePixel(victim, pixels=5, inf_batch=50),
        "demo:105")
    run("autoattack",
        lambda: AutoAttack(victim, norm="Linf", eps=EPS, n_classes=1000),
        "demo:137 — full cascade engages on the resisting images")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "out_baseline_fooling.json")
    existing = {}
    if os.path.exists(out) and only:
        with open(out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps({"rows": len(existing), "out": out}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("tags", nargs="*", default=[])
    ap.add_argument("--victim", default="resnet50")
    ap.add_argument("--train-steps", type=int, default=150)
    args = ap.parse_args()
    main(tuple(args.tags), args.victim, args.train_steps)
