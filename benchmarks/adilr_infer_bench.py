"""ADILR Laplace-conditioned serving at production shape (VERDICT r4 #4).

The round-4 ADILR production bench covered the trainers and
learn_coding_vectors; this measures the SERVING paths of the reference's
§3.4 hot loop (adil_regularized.py:817-1002) at 224²/K=100/b64 on the
v5e, completing the ADILR cost story:

  * the four Laplace-conditioned unsupervised samplers ('none', 'atoms',
    'labels_atoms', 'predictions_atoms') at the reference default
    trials=100 — each trial is one victim forward over the batch
    (:892-913), so these rows are ~100 victim-forwards of device work,
  * the supervised budget-clamped path (learn_coding_vectors at its
    production call site, step 100 / niter 100, then the Dv budget clamp,
    :980-1002).

Cost rows (random-weight bf16 resnet50 + a synthetic-fit Laplace): serving
time is weight-independent; fooling realism for ADILR lives in the
round-4/5 realism sections.

    python benchmarks/adilr_infer_bench.py

Results -> benchmarks/out_adilr_infer.json + BENCHMARKS.md round 5.
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

import fooling_realism as fr  # cache config + dataset protocol

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "out_adilr_infer.json")
K = 100
BATCH = 64
N_FIT = 256


def main(victim_name="resnet50"):
    from dl_attack_on_imagenet_tpu.attacks import ADILR
    from dl_attack_on_imagenet_tpu.data import ArrayDataset
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.utils import ArtifactCache

    victim = create_model(
        victim_name, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
        **fr.victim_kwargs(victim_name),
    )
    images, labels = fr.make_dataset(7)
    fit_x = np.asarray(images[:N_FIT])
    fit_y = np.asarray(labels[:N_FIT])
    ds = ArrayDataset(fit_x, fit_y)
    x = jnp.asarray(images[fr.N_TRAIN :][:BATCH], jnp.float32)
    y = jnp.asarray(labels[fr.N_TRAIN :][:BATCH])

    rng = np.random.default_rng(0)
    d = (rng.standard_normal((K, 224, 224, 3)) * 0.01).astype(np.float32)
    v = rng.laplace(0.0, 0.05, (N_FIT, K)).astype(np.float32)

    shutil.rmtree("/tmp/adilr_infer_cache", ignore_errors=True)
    cache = ArtifactCache("/tmp/adilr_infer_cache")
    lam1, lam2, steps = 0.1, 0.1, 100
    cache.save(
        {"d": d, "v": v, "loss": np.zeros(1, np.float32), "labels": fit_y},
        "ADILR", model="prod", lam1=lam1, lam2=lam2, atoms=K, steps=steps,
        tag="param_selecting",
    )
    t0 = time.perf_counter()
    atk = ADILR(
        victim, steps=steps, lambda_l1=lam1, lambda_l2=lam2, n_atoms=K,
        attack="unsupervised", trials=100, targeted=False,
        model_name="prod", cache=cache, data_train=ds, seed=0,
    )
    fit_dt = time.perf_counter() - t0  # artifact load + all-mode Laplace fit

    results = {"victim": victim_name, "batch": BATCH, "n_atoms": K,
               "trials": 100, "laplace_fit_seconds": round(fit_dt, 2),
               "rows": {}}

    def time_path(tag, fn, warm_iters=3):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(warm_iters):
            out = fn()
            jax.block_until_ready(out)
        warm = (time.perf_counter() - t0) / warm_iters
        row = {"cold_s_incl_compile": round(cold, 2),
               "warm_s_per_b64": round(warm, 3),
               "imgs_per_sec": round(BATCH / warm, 1)}
        results["rows"][tag] = row
        print(json.dumps({tag: row}), flush=True)

    # unsupervised: all four conditioning modes (adil_regularized.py:1018-1030)
    for mode in ("none", "atoms", "labels_atoms", "predictions_atoms"):
        atk.attack_conditioned = mode
        time_path(f"unsupervised_{mode}", lambda: atk(x, y))

    # supervised budget-clamped path (:980-1002)
    atk.attack_mode = "supervised"
    time_path("supervised_lcv", lambda: atk(x, y), warm_iters=2)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
