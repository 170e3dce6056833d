"""ADiL attack-step throughput across the victim zoo (real chip).

The headline bench (bench.py) measures the BASELINE.md operating point on
ResNet-50; the reference driver, however, runs the same hot loop
(adil.py:168-191) against any of its six victims (main.py:41-52). This
bench measures the identical chained-scan protocol per victim so the
framework's per-victim attack cost is on record: one projected-AdamW
dictionary step (fwd + bwd through the frozen victim, AdamW, projections)
at batch 64, K=100, bf16 victim, CW loss — the bench.py protocol minus the
resnet-only blocked layout (stem_s2d/fold_bn applied where the
architecture supports them).

Inception is measured at BOTH its torchvision-native 299 and the
reference's blanket 224 (DS_ImageNet.py:14-18 center-crops every victim's
input to 224 — models/__init__.py::blanket_input_size).

Usage: python benchmarks/zoo_step_bench.py [victim ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _cpu_cache import compilation_cache_dir

# Platform-dispatched cache dir: '.jax_cache' on the chip, the host-salted
# CPU dir under JAX_PLATFORMS=cpu (see _cpu_cache.compilation_cache_dir).
jax.config.update(
    "jax_compilation_cache_dir",
    compilation_cache_dir(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from dl_attack_on_imagenet_tpu.attacks import adil_core as core
from dl_attack_on_imagenet_tpu.attacks.adil_core import AdilConfig
from dl_attack_on_imagenet_tpu.models import create_model

# (tag, registry name, input size, extra model kwargs)
# fold_bn everywhere the architecture supports it (conv->BN->relu order;
# densenet is pre-activation and has no folded mode — models/fold.py).
ZOO = [
    ("resnet18", "resnet18", 224, {"stem_s2d": True, "fold_bn": True}),
    ("resnet50", "resnet50", 224, {"stem_s2d": True, "fold_bn": True}),
    ("vgg11", "vgg11", 224, {}),
    ("densenet121", "densenet121", 224, {}),
    ("densenet121_s2d", "densenet121", 224, {"stem_s2d": True}),
    ("densenet121_blocked", "densenet121", 224, {"blocked_input": True}),
    ("googlenet", "googlenet", 224, {}),
    ("googlenet_s2d", "googlenet", 224, {"stem_s2d": True}),
    ("googlenet_blocked", "googlenet", 224, {"blocked_input": True}),
    ("googlenet_fold", "googlenet", 224, {"fold_bn": True}),
    ("mobilenet_v2", "mobilenet_v2", 224, {}),
    ("mobilenet_v2_fold", "mobilenet_v2", 224, {"fold_bn": True}),
    ("inception_v3", "inception_v3", 299, {}),
    ("inception_v3_fold", "inception_v3", 299, {"fold_bn": True}),
    # the reference's blanket-224 operating point
    ("inception_v3_224", "inception_v3", 224, {}),
    ("inception_v3_224_fold", "inception_v3", 224, {"fold_bn": True}),
    ("vit_b16", "vit_b16", 224, {}),
]

SCAN_LEN = 30
BATCH = 64


def bench_victim(tag, name, size, kwargs):
    cfg = AdilConfig(
        eps=8 / 255, norm="linf", n_atoms=100, loss="logits", kappa=50.0,
        step_size=0.01, batch_size=BATCH, perturb_dtype="bfloat16",
    )
    victim = create_model(name, rng=jax.random.PRNGKey(0),
                          dtype=jnp.bfloat16, input_size=size, **kwargs)
    key = jax.random.PRNGKey(1)
    if kwargs.get("blocked_input"):
        from dl_attack_on_imagenet_tpu.models.layers import space_to_depth

        images = space_to_depth(jax.random.uniform(key, (BATCH, size, size, 3)))
        state = core.init_state(jax.random.PRNGKey(2),
                                (size // 2, size // 2, 12), BATCH, cfg)
    else:
        images = jax.random.uniform(key, (BATCH, size, size, 3))
        state = core.init_state(jax.random.PRNGKey(2), (size, size, 3),
                                BATCH, cfg)
    labels = core.predict_labels(victim.apply_fn, victim.variables, images)
    images = images.astype(jnp.bfloat16)
    idx = jnp.arange(BATCH)
    mask = jnp.ones((BATCH,))

    scan = core.make_train_scan(victim.apply_fn, cfg, "both", n_steps=SCAN_LEN)
    t0 = time.perf_counter()
    state, losses, foolings = scan(state, victim.variables, images, labels, idx, mask)
    jax.block_until_ready(state.d)
    compile_s = time.perf_counter() - t0

    n_dispatch = 2
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        state, losses, foolings = scan(state, victim.variables, images, labels, idx, mask)
    jax.block_until_ready(state.d)
    dt = (time.perf_counter() - t0) / (n_dispatch * SCAN_LEN)
    row = {
        "victim": tag, "input": size,
        "ms_per_step": round(dt * 1e3, 2),
        "iters_per_sec": round(1.0 / dt, 1),
        "img_per_sec": round(BATCH / dt, 0),
        "first_call_s": round(compile_s, 1),
    }
    try:
        # XLA's own flop count for the compiled scan -> fraction of the
        # chip's MEASURED 83 TF/s chained-matmul ceiling (BENCHMARKS.md
        # round 2) the step achieves. XLA's cost model counts a scan body
        # ONCE (verified: 30-step scan == single step to 0.003%), so the
        # reported total IS the per-step count. Matmul-light victims are
        # legitimately low here (their steps are HBM-bandwidth-bound, not
        # MXU-bound).
        cost = scan.lower(state, victim.variables, images, labels, idx,
                          mask).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
        if flops:
            row["gflops_per_step"] = round(flops / 1e9, 1)
            row["achieved_tf_s"] = round(flops / dt / 1e12, 1)
            # v5e spec bf16 peak. The repo's measured 83 TF/s "chained
            # matmul" ceiling (BENCHMARKS.md round 2) is shape-specific
            # and conservative: the ViT step sustains ~118 TF/s.
            row["pct_of_197tf_peak"] = round(100 * flops / dt / 197e12, 1)
    except Exception:
        pass
    print(json.dumps(row), flush=True)


def main():
    only = set(sys.argv[1:])
    for tag, name, size, kwargs in ZOO:
        if only and tag not in only:
            continue
        bench_victim(tag, name, size, kwargs)


if __name__ == "__main__":
    main()
