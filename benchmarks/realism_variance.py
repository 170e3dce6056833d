"""Error bars for the strongest realism rows + the FAB-T re-measurement.

VERDICT round-4 directive #7: the baseline-grid realism table ran ONE b64
batch; the reference evaluates over a loader (performance.py:154-177).
This re-runs the strongest rows — AutoAttack (full cascade), FAB, APGD-T —
over >= 4 fresh b64 batches against the same on-chip trained victim and
records per-batch fooling/distortion so the 100%-fooling claims carry
variance. FAB-T is included because round 5 corrected its success
criterion to the paper rule (misclassification, PARITY.md round-5 note) —
this is its re-measured suite row (VERDICT directive #5).

Fresh batches reuse the EXACT class patterns the victim was trained on
(the base patterns are a pure function of the dataset key) with new noise
and labels, i.e. iid draws from the training distribution.

    python benchmarks/realism_variance.py

Results -> benchmarks/out_realism_variance.json + BENCHMARKS.md round 5.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import fooling_realism as fr

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "out_realism_variance.json")
EPS = 8 / 255
BATCH = 64
N_BATCHES = 4


def fresh_batches(n_batches, batch, seed=1234):
    """iid draws from fr.make_dataset's distribution: same base patterns
    (pure function of the kc split of PRNGKey(7)), fresh labels + noise.

    The base resize runs on the CPU backend like make_dataset itself —
    threefry bits are backend-invariant but the f32 resize arithmetic is
    not, and the victim was trained on the CPU-computed patterns."""
    with jax.default_device(jax.devices("cpu")[0]):
        kc, _, _ = jax.random.split(jax.random.PRNGKey(7), 3)
        base = jax.random.uniform(kc, (fr.N_CLASSES, 7, 7, 3))
        base = jax.image.resize(base, (fr.N_CLASSES, fr.SIZE, fr.SIZE, 3),
                                "bilinear")
    base = jax.device_put(np.asarray(base), jax.devices()[0])
    out = []
    key = jax.random.PRNGKey(seed)
    for _ in range(n_batches):
        key, kl, kn = jax.random.split(key, 3)
        labels = jax.random.randint(kl, (batch,), 0, fr.N_CLASSES)
        noise = jax.random.uniform(kn, (batch, fr.SIZE, fr.SIZE, 3)) * 0.25
        images = jnp.clip(base[labels] * 0.75 + noise, 0.0, 1.0)
        out.append((images, labels))
    return out


def main(victim_name="resnet50", train_steps=150):
    from dl_attack_on_imagenet_tpu.attacks import APGDT, FAB, AutoAttack
    from dl_attack_on_imagenet_tpu.data import ArrayDataset
    from dl_attack_on_imagenet_tpu.evaluation import metrics
    from dl_attack_on_imagenet_tpu.models import create_model

    victim = create_model(
        victim_name, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
        **fr.victim_kwargs(victim_name),
    )
    images, labels = fr.make_dataset(7)
    victim, final_loss, train_dt = fr.train_victim(
        victim, images[: fr.N_TRAIN], labels[: fr.N_TRAIN], steps=train_steps
    )
    acc = metrics.model_accuracy(
        ArrayDataset(np.asarray(images[fr.N_TRAIN :]),
                     np.asarray(labels[fr.N_TRAIN :])), victim)
    print(json.dumps({"victim": {"val_acc": float(acc),
                                 "train_loss": round(final_loss, 4)}}),
          flush=True)

    predict = jax.jit(
        lambda img: jnp.argmax(
            victim.apply_fn(victim.variables, img).astype(jnp.float32), -1))

    batches = fresh_batches(N_BATCHES, BATCH)

    rows = {
        "autoattack": lambda: AutoAttack(victim, eps=EPS, n_classes=10,
                                         steps=100, n_queries=5000, seed=0),
        "fab": lambda: FAB(victim, eps=EPS, steps=100, n_classes=10,
                           n_restarts=1, seed=0),
        "fab_t": lambda: FAB(victim, eps=EPS, steps=100, n_classes=10,
                             n_restarts=1, targeted=True, seed=0),
        "apgd_t": lambda: APGDT(victim, eps=EPS, steps=100, n_classes=10,
                                seed=0),
    }

    results = {"victim": victim_name, "val_acc": float(acc),
               "n_batches": N_BATCHES, "batch": BATCH, "rows": {}}
    for tag, build in rows.items():
        atk = build()
        per_batch = []
        t_all = 0.0
        for bi, (x, y) in enumerate(batches):
            pre = predict(x)
            keep = np.asarray(pre == y)  # harness filter (performance.py:163)
            k = int(keep.sum())
            xk = x[keep]
            yk = jnp.asarray(pre)[keep]
            # cycle-pad kept rows back to BATCH (evaluation.harness does the
            # same) so every attack sees ONE shape — ragged keep-counts
            # would recompile the multi-minute jitted programs per batch
            reps = -(-BATCH // max(k, 1))
            x_in = jnp.concatenate([xk] * reps)[:BATCH]
            y_in = jnp.concatenate([yk] * reps)[:BATCH]
            t0 = time.perf_counter()
            adv_full = atk(x_in, y_in)
            jax.block_until_ready(adv_full)
            dt = time.perf_counter() - t0
            t_all += dt
            adv = adv_full[:k]
            post = predict(adv_full)[:k]  # fixed-shape forward (no recompiles)
            fool = float(jnp.mean(post != yk))
            linf = float(jnp.max(jnp.abs(adv - xk)))
            rmse = float(metrics.compute_rmse(adv, xk, reduction="mean"))
            per_batch.append({"n": int(keep.sum()), "fooling": round(fool, 4),
                              "linf": round(linf, 4), "rmse": round(rmse, 5),
                              "seconds": round(dt, 2)})
            print(json.dumps({tag: per_batch[-1]}), flush=True)
        fools = [b["fooling"] for b in per_batch]
        results["rows"][tag] = {
            "per_batch": per_batch,
            "fooling_mean": round(float(np.mean(fools)), 4),
            "fooling_std": round(float(np.std(fools)), 4),
            "fooling_min": round(float(np.min(fools)), 4),
            "total_seconds": round(t_all, 1),
        }
        print(json.dumps({f"{tag}_summary": results["rows"][tag]
                          | {"per_batch": "..."}}), flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
