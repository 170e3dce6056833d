"""On-chip timings for the reference's FULL commented baseline grid
(VERDICT r3 #1/#2) at the grid's own operating points.

The reference harness times every attack it evaluates
(/root/reference/performance.py:136-144); its commented grid
(/root/reference/demo_dL_attack.py:96-143) fixes the operating points:
eps=8/255, steps=100, alpha=2/255, CW c-grid logspace(-1,4,5) lr=0.001,
Square n_queries=5000 loss='ce', FAB n_classes=10 (untargeted + targeted),
OnePixel pixels=5 inf_batch=50, EOTPGD eot_iter=2, DIFGSM
diversity_prob=0.5 resize_rate=0.9, MIFGSM decay=0.1, AutoAttack
norm='Linf' n_classes=1000. This driver runs every one of those rows
against a bf16 zoo victim at b64/224²/1000 classes on one v5e chip and
records s/batch, img/s, fooling rate, first-call (compile-inclusive) wall,
and the HBM high-water mark after each attack.

    python benchmarks/baseline_suite_bench.py                  # everything
    python benchmarks/baseline_suite_bench.py square fab       # subset
    python benchmarks/baseline_suite_bench.py --victim resnet50

Results land in benchmarks/out_baseline_suite_<victim>.json and feed the
BENCHMARKS.md table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import jax.numpy as jnp

from _cpu_cache import compilation_cache_dir

jax.config.update(
    "jax_compilation_cache_dir",
    compilation_cache_dir(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

SIZE = 224
EPS = 8 / 255


def hbm_peak_gb():
    """Process HBM high-water mark (monotone watermark — per-attack deltas
    attribute growth to the attack that caused them)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats["peak_bytes_in_use"] / 2**30, 3)
    except Exception:
        return None


def main(only=(), victim_name="resnet18", batch=64):
    from dl_attack_on_imagenet_tpu.attacks import (
        APGD,
        APGDT,
        BIM,
        CW,
        DeepFool,
        DIFGSM,
        EOTPGD,
        FAB,
        FFGSM,
        FGSM,
        GN,
        MIFGSM,
        PGD,
        RFGSM,
        TPGD,
        VANILA,
        AutoAttack,
        OnePixel,
        Square,
    )
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core
    from dl_attack_on_imagenet_tpu.models import create_model

    kwargs = {"stem_s2d": True} if victim_name.startswith(("resnet", "densenet")) else {}
    victim = create_model(
        victim_name, rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16, **kwargs
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, SIZE, SIZE, 3))
    labels = core.predict_labels(victim.apply_fn, victim.variables, x)
    jax.block_until_ready(labels)

    predict = jax.jit(
        lambda img: jnp.argmax(
            victim.apply_fn(victim.variables, img).astype(jnp.float32), -1
        )
    )

    results = {}

    def record(tag, payload):
        # per-row batch: subset runs merge into an existing file, so the
        # row must carry its own operating point (review finding, round 4)
        payload = {"batch": batch, **payload}
        results[tag] = payload
        print(json.dumps({"bench": tag, **payload}), flush=True)

    def run(tag, build, iters=2, note=""):
        if only and tag not in only:
            return
        atk = build()
        t0 = time.perf_counter()
        adv = atk(x, labels)
        jax.block_until_ready(adv)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            adv = atk(x, labels)
            jax.block_until_ready(adv)
        dt = (time.perf_counter() - t0) / iters
        fool = float(jnp.mean((predict(adv) != labels).astype(jnp.float32)))
        dist = float(jnp.max(jnp.abs(adv.astype(jnp.float32) - x)))
        record(tag, {
            "s_per_batch": round(dt, 4),
            "img_per_s": round(batch / dt, 1),
            "fooling": round(fool, 4),
            "first_call_s": round(t_first, 1),
            "linf": round(dist, 5),
            "hbm_peak_gb": hbm_peak_gb(),
            "note": note,
        })

    a = 2 / 255
    run("vanila", lambda: VANILA(victim), iters=3,
        note="demo_dL_attack.py:100")
    run("gn", lambda: GN(victim, sigma=0.1), iters=3,
        note="sigma=0.1 (demo:101)")
    run("fgsm", lambda: FGSM(victim, eps=EPS), iters=3, note="demo:131")
    run("ffgsm", lambda: FFGSM(victim, eps=EPS, alpha=10 / 255), iters=3,
        note="alpha=10/255 (demo:132)")
    run("rfgsm", lambda: RFGSM(victim, eps=EPS, alpha=a, steps=100),
        note="steps=100 (demo:97)")
    run("pgd100", lambda: PGD(victim, eps=EPS, alpha=a, steps=100,
                              random_start=True),
        note="steps=100 random_start (demo:134)")
    run("bim100", lambda: BIM(victim, eps=EPS, alpha=a, steps=100),
        note="steps=100 (demo:96)")
    run("mifgsm", lambda: MIFGSM(victim, eps=EPS, alpha=a, steps=100,
                                 decay=0.1),
        note="steps=100 decay=0.1 (demo:133)")
    run("tpgd", lambda: TPGD(victim, eps=EPS, alpha=a, steps=100),
        note="steps=100 (demo:99)")
    run("eotpgd", lambda: EOTPGD(victim, eps=EPS, alpha=a, steps=100,
                                 eot_iter=2),
        note="steps=100 eot_iter=2 (demo:98)")
    run("difgsm", lambda: DIFGSM(victim, eps=EPS, alpha=a, steps=100,
                                 diversity_prob=0.5, resize_rate=0.9),
        note="steps=100 p=0.5 rr=0.9 (demo:106)")
    run("deepfool", lambda: DeepFool(victim, steps=100), iters=1,
        note="steps=100, top-10 boundary linearization (demo:128)")

    # --- CW c-grid (demo:129): np.logspace(-1, 4, 5), steps=100, lr=0.001.
    # c is a traced arg, so the whole grid shares ONE compile.
    if not only or "cw" in only:
        c_grid = np.logspace(-1, 4, 5)
        atk = CW(victim, c=float(c_grid[0]), steps=100, lr=0.001)
        t0 = time.perf_counter()
        adv = atk(x, labels)
        jax.block_until_ready(adv)
        t_first = time.perf_counter() - t0
        per_c = {}
        for c in c_grid:
            atk.c = float(c)
            t0 = time.perf_counter()
            adv = atk(x, labels)
            jax.block_until_ready(adv)
            dt = time.perf_counter() - t0
            fool = float(jnp.mean((predict(adv) != labels).astype(jnp.float32)))
            per_c[f"c={c:g}"] = {"s_per_batch": round(dt, 4),
                                 "fooling": round(fool, 4)}
        dts = [v["s_per_batch"] for v in per_c.values()]
        record("cw_cgrid", {
            "s_per_batch": round(float(np.mean(dts)), 4),
            "img_per_s": round(batch / float(np.mean(dts)), 1),
            "fooling": max(v["fooling"] for v in per_c.values()),
            "first_call_s": round(t_first, 1),
            "hbm_peak_gb": hbm_peak_gb(),
            "per_c": per_c,
            "note": "logspace(-1,4,5) shares one compile (demo:129)",
        })

    run("apgd", lambda: APGD(victim, eps=EPS, steps=100, loss="ce"),
        note="steps=100 loss=ce (demo:136)")
    run("apgdt", lambda: APGDT(victim, eps=EPS, steps=100, n_classes=10),
        iters=1, note="9 targeted DLR runs x 100 steps (AA standard member)")
    run("square", lambda: Square(victim, eps=EPS, n_queries=5000, loss="ce"),
        iters=1, note="n_queries=5000 loss=ce (demo:104)")
    run("fab", lambda: FAB(victim, eps=EPS, steps=100, n_classes=10),
        iters=1, note="steps=100 n_classes=10 untargeted (demo:102)")
    run("fabt", lambda: FAB(victim, eps=EPS, steps=100, n_classes=10,
                            targeted=True),
        iters=1, note="targeted: 9 target sets x 100 steps (demo:103)")
    run("onepixel", lambda: OnePixel(victim, pixels=5, inf_batch=50),
        iters=1, note="pixels=5 inf_batch=50 pop=25 steps=10 (demo:105)")
    run("autoattack",
        lambda: AutoAttack(victim, norm="Linf", eps=EPS, n_classes=1000),
        iters=1,
        note="standard: apgd-ce/apgd-t/fab-t/square @1000 classes (demo:137)")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"out_baseline_suite_{victim_name}.json")
    existing = {}
    if os.path.exists(out) and only:
        with open(out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps({"victim": victim_name, "batch": batch,
                      "rows": len(existing), "out": out}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("tags", nargs="*", default=[])
    ap.add_argument("--victim", default="resnet18")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    main(tuple(args.tags), args.victim, args.batch)
