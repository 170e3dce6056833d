"""Batch-size scaling for training + DDrague serving throughput (real chip).

VERDICT r3 #7: the headline contract pins b64 (the reference's own bs=100
choice lives at adil.py:130), but the serving CLI (cli/generate.py) is
free to pick its batch. This measures img/s at b32/64/128/256 for the
projected-AdamW training step and the DDrague inference solver on the
headline bf16 ResNet-50 victim, so the serving default is a measured
optimum rather than an inherited constant.

    python benchmarks/batch_scaling.py [--victim resnet50]

Results land in benchmarks/out_batch_scaling.json and feed BENCHMARKS.md;
cli/generate.py's default --batch-size follows the measured optimum.
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

from dl_attack_on_imagenet_tpu.attacks import adil_core as core
from dl_attack_on_imagenet_tpu.attacks.adil_core import AdilConfig
from dl_attack_on_imagenet_tpu.models import create_model

SIZE = 224
K = 100
SCAN_LEN = 20
BATCHES = (32, 64, 128, 256)


def main(victim_name="resnet50"):
    victim = create_model(victim_name, rng=jax.random.PRNGKey(0),
                          dtype=jnp.bfloat16, stem_s2d=True, fold_bn=True)
    apply_fn, variables = victim.apply_fn, victim.variables
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "out_batch_scaling.json")
    results = {}

    for b in BATCHES:
        cfg = AdilConfig(
            eps=8 / 255, norm="linf", n_atoms=K, loss="logits", kappa=50.0,
            step_size=0.01, batch_size=b, perturb_dtype="bfloat16",
            steps_inference=30,
        )
        x = jax.random.uniform(jax.random.PRNGKey(1), (b, SIZE, SIZE, 3))
        labels = core.predict_labels(apply_fn, variables, x)
        xb = x.astype(jnp.bfloat16)
        state = core.init_state(jax.random.PRNGKey(2), (SIZE, SIZE, 3), b, cfg)
        idx = jnp.arange(b)
        mask = jnp.ones((b,))

        # Training step (bench.py chained-scan protocol).
        scan = core.make_train_scan(apply_fn, cfg, "both", n_steps=SCAN_LEN)
        t0 = time.perf_counter()
        state2, _, _ = scan(state, variables, xb, labels, idx, mask)
        jax.block_until_ready(state2.d)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2):
            state2, _, _ = scan(state2, variables, xb, labels, idx, mask)
        jax.block_until_ready(state2.d)
        dt_train = (time.perf_counter() - t0) / (2 * SCAN_LEN)

        # DDrague serving (attack_family_bench protocol, <=30 iters).
        d = jax.random.uniform(jax.random.PRNGKey(5), (K, SIZE, SIZE, 3),
                               minval=-1, maxval=1)
        # variables as a jit ARGUMENT, not a closure constant: baked-in
        # params exceed the axon remote-compile request size for the big
        # victims (HTTP 413 — see zoo_infer_bench.py).
        dd = jax.jit(lambda vars_, d_, img: core.supervised_ddrague(
            apply_fn, vars_, d_, img, cfg))
        adv = dd(variables, d, x)
        jax.block_until_ready(adv)
        t0 = time.perf_counter()
        for _ in range(3):
            adv = dd(variables, d, x)
            jax.block_until_ready(adv)
        dt_dd = (time.perf_counter() - t0) / 3

        row = {
            "batch": b,
            "train_ms_per_step": round(dt_train * 1e3, 2),
            "train_img_per_s": round(b / dt_train, 0),
            "ddrague_s_per_batch": round(dt_dd, 4),
            "ddrague_img_per_s": round(b / dt_dd, 1),
            "first_call_s": round(compile_s, 1),
        }
        results[str(b)] = row
        print(json.dumps(row), flush=True)

    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"victim": victim_name, "out": out}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--victim", default="resnet50")
    main(ap.parse_args().victim)
