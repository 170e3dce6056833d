"""ADILR solvers at the reference grid row's production shape (real chip).

The reference's commented ADiLR grid row (demo_dL_attack.py:110-112) pins
the operating point: lambda_l1 = lambda_l2 = 1e-4, n_atoms=100,
version='stochastic' (-> sadil), batch_size=100, steps=150, 224² ImageNet
images. Rounds 1-2 measured the regularized solvers only at oracle shapes
(b16, K=10); this driver runs every ADILR training/inference solver at the
row's own shape against the bf16 suite victim so the per-epoch cost of the
one reference-own commented row is measured, not extrapolated:

- ``sadil``            (version='stochastic', the row's solver)
- ``sadil_updated``    (version='stochastic_update')
- ``adilr_adamw``      (the reference's *executed* learn_dictionary)
- ``learn_coding_vectors`` (supervised inference at the :990 call site)

Epochs here run 5 batches of the row's bs=100 (N=500 synthetic images);
the reference's own N (num_train_per_class=10 x 1000 classes = 10k images,
100 batches) costs 20x the per-epoch number — per-batch cost is shape-
static, so the scaling is exactly linear in the batch count.

    python benchmarks/adilr_prod_bench.py [--victim resnet18] [--n 500]

Results land in benchmarks/out_adilr_prod.json and feed BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _cpu_cache import compilation_cache_dir

jax.config.update(
    "jax_compilation_cache_dir",
    compilation_cache_dir(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

SIZE = 224
K = 100
BSZ = 100  # the row's own batch_size (demo_dL_attack.py:112)


def main(victim_name="resnet18", n=500, size=SIZE, k=K, bsz=BSZ):
    global SIZE, K, BSZ
    SIZE, K, BSZ = size, k, bsz
    from dl_attack_on_imagenet_tpu.attacks import adil_regularized as reg
    from dl_attack_on_imagenet_tpu.attacks.adil_regularized import (
        RegularizedConfig,
    )
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.ops.projections import project_atoms

    victim = create_model(victim_name, rng=jax.random.PRNGKey(0),
                          dtype=jnp.bfloat16)
    apply_fn, variables = victim.apply_fn, victim.variables
    cfg = RegularizedConfig(lambda_l1=1e-4, lambda_l2=1e-4, n_atoms=K,
                            steps=150, batch_size=BSZ)

    x = jax.random.uniform(jax.random.PRNGKey(1), (n, SIZE, SIZE, 3))
    targets = reg._targets(apply_fn, variables, x, None, cfg.targeted)
    jax.block_until_ready(targets)
    key = jax.random.PRNGKey(2)
    batches = n // BSZ

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "out_adilr_prod.json")
    results = {"victim": victim_name, "n": n, "batch_size": BSZ,
               "n_atoms": K, "size": SIZE}

    def record(tag, payload):
        results[tag] = payload
        print(json.dumps({"bench": tag, **payload}), flush=True)

    def epoch_rate(tag, fn):
        """Marginal wall between a 1-epoch and a (1+reps)-epoch run: the
        warm per-epoch rate with init/compile subtracted (tol=0 keeps the
        loop from early-stopping on synthetic data)."""
        t0 = time.perf_counter()
        fn(1)
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(1)
        base = time.perf_counter() - t0
        reps = 4
        t0 = time.perf_counter()
        fn(1 + reps)
        per_epoch = (time.perf_counter() - t0 - base) / reps
        record(tag, {
            "s_per_epoch": round(per_epoch, 4),
            "ms_per_batch_step": round(per_epoch / batches * 1e3, 2),
            "s_per_reference_epoch_10k": round(per_epoch * (10000 / n), 2),
            "first_call_s": round(first, 1),
            "note": f"{batches} batches of b{BSZ}; epoch incl. the "
                    f"full-batch loss eval the solver does per epoch",
        })

    epoch_rate("sadil", lambda ne: jax.block_until_ready(
        reg.sadil(apply_fn, variables, x, targets, cfg, key,
                  nepochs=ne, tol=0.0)[0]))
    epoch_rate("sadil_updated", lambda ne: jax.block_until_ready(
        reg.sadil_updated(apply_fn, variables, x, targets, cfg, key,
                          nepochs=ne, tol=0.0)[0]))
    epoch_rate("adilr_adamw", lambda ne: jax.block_until_ready(
        reg.adilr_adamw(apply_fn, variables, x, cfg, key,
                        nepochs=ne, tol=0.0)[0]))

    # Supervised inference: fresh codes vs a frozen dictionary at the
    # forward_supervised call site's niter=100/step_size=100 (:990-993).
    d = project_atoms(
        jax.random.normal(jax.random.PRNGKey(3), (K, SIZE, SIZE, 3)),
        cfg.dict_set)
    xb, tb = x[:BSZ], targets[:BSZ]
    t0 = time.perf_counter()
    v = reg.learn_coding_vectors(apply_fn, variables, d, xb, tb, cfg)
    jax.block_until_ready(v)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        v = reg.learn_coding_vectors(apply_fn, variables, d, xb, tb, cfg)
        jax.block_until_ready(v)
    dt = (time.perf_counter() - t0) / 3
    record("learn_coding_vectors", {
        "s_per_batch": round(dt, 4),
        "img_per_s": round(BSZ / dt, 1),
        "first_call_s": round(first, 1),
        "note": f"b{BSZ}, niter=100, step_size=100 (reference :990-993)",
    })

    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"out": out}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--victim", default="resnet18")
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--size", type=int, default=SIZE,
                    help="image side (smoke-test knob; the row pins 224)")
    ap.add_argument("--k", type=int, default=K)
    ap.add_argument("--bsz", type=int, default=BSZ)
    a = ap.parse_args()
    main(a.victim, a.n, a.size, a.k, a.bsz)
