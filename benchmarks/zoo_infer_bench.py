"""ADiL inference (serving) throughput across the victim zoo (real chip).

VERDICT r3 #6: the round-3 zoo table covers the dictionary TRAINING step
for every victim, but the serving-side rates (what the reference's eval
harness pays per victim, performance.py:154-177) existed only for
resnet50. This bench measures the three trained-dict attack paths the
reference exposes (adil.py:432-655) per victim, same protocol as the
round-2 resnet50 rows (attack_family_bench.py): b64, K=100, bf16 victim,
mixed-precision inner forwards (`perturb_dtype='bfloat16'`), <=30 DDrague
iters / <=100 v-AdamW iters / 10 unsupervised trials.

    python benchmarks/zoo_infer_bench.py                     # everything
    python benchmarks/zoo_infer_bench.py resnet50 googlenet  # subset

Results land in benchmarks/out_zoo_infer.json and feed BENCHMARKS.md.
"""

from __future__ import annotations

import dataclasses
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

BATCH = 64
K = 100

# (tag, registry name, input size, model kwargs) — the per-victim exact
# knobs cli.demo --fast-victim applies (s2d stems transfer to DenseNet /
# GoogLeNet; fold_bn where conv->BN->relu). Inception at the reference's
# blanket 224 (DS_ImageNet.py:14-18) AND its native 299.
ZOO = [
    ("mobilenet_v2", "mobilenet_v2", 224, {}),
    ("resnet18", "resnet18", 224, {"stem_s2d": True, "fold_bn": True}),
    ("googlenet", "googlenet", 224, {"stem_s2d": True}),
    ("resnet50", "resnet50", 224, {"stem_s2d": True, "fold_bn": True}),
    ("inception_v3_224", "inception_v3", 224, {}),
    ("vgg11", "vgg11", 224, {}),
    ("densenet121", "densenet121", 224, {"stem_s2d": True}),
    ("inception_v3_299", "inception_v3", 299, {}),
    ("vit_b16", "vit_b16", 224, {}),
]


def timed(fn, *args, warmup=1, iters=3):
    out = None
    t_first = None
    for i in range(warmup):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        if i == 0:
            t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, t_first


def bench_victim(tag, name, size, kwargs, results):
    victim = create_model(name, rng=jax.random.PRNGKey(0),
                          dtype=jnp.bfloat16, input_size=size, **kwargs)
    apply_fn, variables = victim.apply_fn, victim.variables
    cfg = AdilConfig(eps=8 / 255, n_atoms=K, loss="ce",
                     steps_inference=30, perturb_dtype="bfloat16")
    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, size, size, 3))
    d = jax.random.uniform(jax.random.PRNGKey(5), (K, size, size, 3),
                           minval=-1, maxval=1)

    row = {"victim": tag, "input": size}

    # `variables` is a jit ARGUMENT, not a closure capture: closing over
    # the params bakes them into the HLO as constants, and for the large
    # victims (vgg11 ~265 MB bf16, vit_b16 ~172 MB) the serialized
    # computation exceeds the axon remote-compile request limit (HTTP 413).
    dd = jax.jit(lambda v_, d_, img: core.supervised_ddrague(
        apply_fn, v_, d_, img, cfg))
    dt, t_first = timed(dd, variables, d, x)
    row["ddrague_s_per_batch"] = round(dt, 4)
    row["ddrague_img_per_s"] = round(BATCH / dt, 1)
    row["ddrague_first_call_s"] = round(t_first, 1)

    ac = jax.jit(lambda v_, d_, img: core.supervised_adamw_codes(
        apply_fn, v_, d_, img, cfg))
    dt, t_first = timed(ac, variables, d, x)
    row["vadamw_s_per_batch"] = round(dt, 4)
    row["vadamw_img_per_s"] = round(BATCH / dt, 1)
    row["vadamw_first_call_s"] = round(t_first, 1)

    us = jax.jit(lambda v_, d_, img, k_: core.unsupervised_sample(
        apply_fn, v_, d_, img, k_, cfg))
    dt, t_first = timed(us, variables, d, x, jax.random.PRNGKey(9))
    row["unsup_s_per_batch"] = round(dt, 4)
    row["unsup_img_per_s"] = round(BATCH / dt, 1)
    row["unsup_first_call_s"] = round(t_first, 1)

    results[tag] = row
    print(json.dumps(row), flush=True)


def main():
    only = set(sys.argv[1:])
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "out_zoo_infer.json")
    results = {}
    if os.path.exists(out) and only:
        with open(out) as f:
            results = json.load(f)
    for tag, name, size, kwargs in ZOO:
        if only and tag not in only:
            continue
        bench_victim(tag, name, size, kwargs, results)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"rows": len(results), "out": out}))


if __name__ == "__main__":
    main()
