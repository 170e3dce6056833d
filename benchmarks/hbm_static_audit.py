"""Static HBM audit of the scale-risky attack programs (XLA memory analysis).

The axon tunnel's device API exposes no ``memory_stats()``, so the
baseline-suite table reports ``hbm_peak_gb: null`` and peak-memory safety
was enforced only structurally (the eval_shape CI guards in
tests/test_scale_shapes.py). This driver closes the gap with the
compiler's own numbers: each attack's jitted core program is lowered and
compiled for the TPU backend and its ``compiled.memory_analysis()`` is
recorded — argument / output / temp / alias bytes and the derived
peak-estimate = args + outputs + temps − aliased. These are XLA's static
buffer-assignment totals for the exact programs the suite benchmarks run
(same shapes, same hypers), i.e. the allocation the chip must satisfy —
not a runtime watermark, but a hard upper bound certified by the
compiler that assigned the buffers.

Rows mirror the suite's scale-risky set (VERDICT r3 watch list): FAB /
FAB-T (the (n, K, d) jacobian), Square (5000-query while_loop), OnePixel
(chunked candidate painting), APGD (the ensemble's workhorse), plus the
ADIL train step and DDrague serving solver for the headline.

    python benchmarks/hbm_static_audit.py [--victim resnet18]

Results land in benchmarks/out_hbm_static.json and feed BENCHMARKS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

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
BATCH = 64
EPS = 8 / 255


def analyze(tag, fn, *args, results, notes=""):
    """Lower + compile ``fn`` for abstract ``args``; record XLA's memory
    analysis. Args are passed as ShapeDtypeStructs — nothing materializes."""
    structs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
        if hasattr(a, "shape") else a, args)
    ma = fn.lower(*structs).compile().memory_analysis()
    gib = 2.0 ** 30
    row = {
        "argument_gib": round(ma.argument_size_in_bytes / gib, 3),
        "output_gib": round(ma.output_size_in_bytes / gib, 3),
        "temp_gib": round(ma.temp_size_in_bytes / gib, 3),
        "alias_gib": round(ma.alias_size_in_bytes / gib, 3),
        "peak_estimate_gib": round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / gib, 3),
        "note": notes,
    }
    results[tag] = row
    print(json.dumps({"audit": tag, **row}), flush=True)


def main(victim_name="resnet18", size=SIZE, batch=BATCH):
    global SIZE, BATCH
    SIZE, BATCH = size, batch
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core
    from dl_attack_on_imagenet_tpu.attacks.adil_core import AdilConfig
    from dl_attack_on_imagenet_tpu.attacks.apgd import _apgd_cache
    from dl_attack_on_imagenet_tpu.attacks.fab import _fab_cache
    from dl_attack_on_imagenet_tpu.attacks.one_pixel import _one_pixel_cache
    from dl_attack_on_imagenet_tpu.attacks.square import _square_cache
    from dl_attack_on_imagenet_tpu.models import create_model

    victim = create_model(victim_name, rng=jax.random.PRNGKey(0),
                          dtype=jnp.bfloat16)
    apply_fn, variables = victim.apply_fn, victim.variables

    x = jax.ShapeDtypeStruct((BATCH, SIZE, SIZE, 3), jnp.float32)
    y = jax.ShapeDtypeStruct((BATCH,), jnp.int32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    eps = jnp.float32(EPS)

    results = {"victim": victim_name, "batch": BATCH, "size": SIZE}

    analyze("fab", _fab_cache(apply_fn, 100, 9, False),
            variables, x, y, x, y, results=results,
            notes="steps=100 n_cand=9: (64,9,150528) jacobian resident")
    analyze("fabt_run", _fab_cache(apply_fn, 100, 1, True),
            variables, x, y, x, y, results=results,
            notes="one of FAB-T's 9 sequential target runs")
    analyze("apgd", _apgd_cache(apply_fn, 100, "linf", "ce", 1),
            variables, x, y, y, key, eps, results=results,
            notes="steps=100 loss=ce")
    analyze("square", _square_cache(apply_fn, 5000, "ce", 0.8, False),
            variables, x, y, key, eps, results=results,
            notes="n_queries=5000 while_loop")
    analyze("onepixel", _one_pixel_cache(apply_fn, 10, 5, 25, 50, False, 1.0),
            variables, x, y, key, results=results,
            notes="pixels=5 pop=25 inf_batch=50 chunked painting")

    cfg = AdilConfig(eps=EPS, n_atoms=100, loss="logits", kappa=50.0,
                     step_size=0.01, batch_size=BATCH,
                     perturb_dtype="bfloat16", steps_inference=30)
    xb = jax.ShapeDtypeStruct((BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    d = jax.ShapeDtypeStruct((100, SIZE, SIZE, 3), jnp.float32)
    state = core.init_state(jax.random.PRNGKey(2), (SIZE, SIZE, 3), BATCH, cfg)
    idx = jnp.arange(BATCH)
    mask = jnp.ones((BATCH,))
    scan = core.make_train_scan(apply_fn, cfg, "both", n_steps=20)
    analyze("adil_train_scan20", scan,
            state, variables, xb, y, idx, mask, results=results,
            notes="headline step, 20-step chained scan, b64 K=100")
    dd = jax.jit(lambda d_, img: core.supervised_ddrague(
        apply_fn, variables, d_, img, cfg))
    analyze("ddrague", dd, d, x, results=results,
            notes="serving solver, <=30 iters, bf16 inner")

    # victim-suffixed so the resnet18 and resnet50 audits coexist
    # (the round-4 file name is kept for resnet18 compatibility)
    suffix = "" if victim_name == "resnet18" else f"_{victim_name}"
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"out_hbm_static{suffix}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"out": out}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--victim", default="resnet18")
    ap.add_argument("--size", type=int, default=SIZE,
                    help="image side (smoke-test knob; the suite pins 224)")
    ap.add_argument("--batch", type=int, default=BATCH)
    a = ap.parse_args()
    main(a.victim, a.size, a.batch)
