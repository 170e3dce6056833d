"""Config-4 scale rehearsal: raw-JPEG tree -> dictionary, on the chip.

BASELINE.md config 4 ("full 50k-val ADiL generation ... end-to-end
runnable") was plumbed and unit-tested at toy scale but never exercised at
ImageNet-like volume (VERDICT round-2 missing #3). This script:

1. synthesizes an ILSVRC-shaped JPEG tree (n images over 1000 wnid
   folders, mixed source sizes so the shorter-side resize path is real);
2. measures the native C++ loader's decode throughput alone
   (decode+resize+crop into the ring buffer, no compute);
3. runs ``ADIL.learn_dictionary(folder)`` end-to-end through
   ``_learn_gd_from_folder`` (native streaming -> device-put lookahead ->
   jitted projected-AdamW steps) and reports steady-state img/s + the
   loader/device utilization split;
4. runs the streamed resident-host path (`stream=True`) on the
   materialized arrays for the same shape;
5. times the vectorized 1000-class conditioned Laplace fit at 10k and
   50k rows (ops/laplace.py);
6. reports device HBM peak.

Run on the TPU (default platform):

    python benchmarks/config4_rehearsal.py --n 10000 --epochs 3

Reference: adil.py:130/:362-364 (the pinned-memory DataLoader the native
loader replaces) + BASELINE.md config 4.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from _cpu_cache import compilation_cache_dir

# Platform-dispatched cache dir: '.jax_cache' on the chip, the host-salted
# CPU dir under JAX_PLATFORMS=cpu (see _cpu_cache.compilation_cache_dir).
jax.config.update(
    "jax_compilation_cache_dir",
    compilation_cache_dir(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

SIZES = [(256, 256), (320, 256), (256, 320), (280, 280)]


def build_tree(root: str, n: int, n_classes: int = 1000, quality: int = 85):
    """Synthesize an ILSVRC-val-shaped tree: root/n<c>/img.JPEG.

    Images are smooth low-frequency patterns (fast to encode, realistic
    decode cost) at mixed source sizes.
    """
    from PIL import Image

    marker = os.path.join(root, f".complete_{n}")
    if os.path.exists(marker):
        return
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for i in range(n):
        c = i % n_classes
        cdir = os.path.join(root, f"n{c:08d}")
        if i < n_classes:
            os.makedirs(cdir, exist_ok=True)
        h, w = SIZES[i % len(SIZES)]
        yy = np.linspace(0, 2 * np.pi, h, dtype=np.float32)[:, None]
        xx = np.linspace(0, 2 * np.pi, w, dtype=np.float32)[None, :]
        f1, f2, ph = rng.uniform(1, 6, 2).astype(np.float32).tolist() + [
            float(rng.uniform(0, 6.28))
        ]
        base = np.sin(f1 * yy + ph) * np.cos(f2 * xx)
        img = np.stack(
            [base * a + b for a, b in zip(rng.uniform(0.2, 0.5, 3), rng.uniform(0.3, 0.6, 3))],
            axis=-1,
        )
        arr = np.clip(img * 255, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(cdir, f"img_{i:07d}.JPEG"), quality=quality
        )
    with open(marker, "w") as f:
        f.write(str(n))
    print(f"built {n} JPEGs in {time.perf_counter()-t0:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--root", default="/tmp/synth_ilsvrc")
    ap.add_argument("--victim", default="resnet50")
    ap.add_argument("--skip-streamed", action="store_true")
    ap.add_argument("--skip-loader-only", action="store_true",
                    help="skip phase 2 (already measured at this n)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from dl_attack_on_imagenet_tpu.attacks import ADIL
    from dl_attack_on_imagenet_tpu.data import load_imagenet
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.runtime.host_loader import HostLoader, get_runtime
    from dl_attack_on_imagenet_tpu.utils import ArtifactCache

    out = {"n": args.n, "epochs": args.epochs, "victim": args.victim}

    build_tree(args.root, args.n)
    folder = load_imagenet(args.root)
    assert len(folder) == args.n, len(folder)

    runtime = get_runtime()
    assert runtime is not None, "native runtime unavailable"

    # Touch the device FIRST: the axon handshake + victim init happen
    # before the loader saturates the single host core (a first device
    # contact after a 90 s CPU-bound phase was observed to wedge the
    # tunnel rendezvous).
    victim = create_model(args.victim, rng=jax.random.PRNGKey(0),
                          dtype=jnp.bfloat16, fold_bn=True)
    jax.block_until_ready(victim(jax.numpy.zeros((1, 224, 224, 3))))
    print("device ready", flush=True)

    # --- 2. loader-only decode throughput -------------------------------
    if not args.skip_loader_only:
        paths = [p for p, _ in folder.samples]
        loader = HostLoader(runtime, paths, [0] * args.n, args.batch, 224,
                            shuffle=True)
        t0 = time.perf_counter()
        seen = 0
        for _, x, labs, idxs in loader.iter_indexed():
            seen += x.shape[0]
        loader.close()
        dt_loader = time.perf_counter() - t0
        out["loader_only_img_s"] = round(seen / dt_loader, 1)
        print(f"loader-only: {seen} imgs in {dt_loader:.2f}s = "
              f"{out['loader_only_img_s']} img/s", flush=True)

    # --- 3. native end-to-end training ----------------------------------
    cache = ArtifactCache("/tmp/config4_dicts")
    cache.remove("ImageNet", model="config4")
    attack = ADIL(victim, steps=args.epochs, n_atoms=100, loss="logits",
                  batch_size=args.batch, model_name="config4", cache=cache,
                  val_every=None, verbose=True, seed=0)
    t0 = time.perf_counter()
    attack.learn_dictionary(folder, None)
    dt_total = time.perf_counter() - t0
    steady = attack.timing.get("mean_s")
    # StepTimer(warmup=1) yields NaN mean_s on single-epoch runs; NaN is
    # truthy, so normalize to None for the guards below.
    if steady is not None and math.isnan(steady):
        steady = None
    out["native_total_s"] = round(dt_total, 2)
    out["native_epoch_steady_s"] = round(steady, 2) if steady else None
    if steady:
        out["native_img_s"] = round(args.n / steady, 1)
        if "loader_only_img_s" in out:
            out["device_utilization_vs_loader"] = round(
                (args.n / steady) / out["loader_only_img_s"], 3
            )
    print(f"native train: total {dt_total:.1f}s, steady epoch "
          f"{steady and round(steady,2)}s -> {out.get('native_img_s')} img/s",
          flush=True)

    try:
        stats = jax.local_devices()[0].memory_stats()
        out["hbm_peak_gib"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    except Exception:
        out["hbm_peak_gib"] = None

    # --- 4. streamed path on materialized arrays -------------------------
    if not args.skip_streamed:
        ds = folder.materialize(runtime=runtime)
        cache.remove("ImageNet", model="config4s")
        attack_s = ADIL(victim, steps=args.epochs, n_atoms=100, loss="logits",
                        batch_size=args.batch, model_name="config4s",
                        cache=cache, val_every=None, verbose=True, seed=0,
                        stream=True)
        t0 = time.perf_counter()
        attack_s.learn_dictionary(ds, None)
        dt_s = time.perf_counter() - t0
        steady_s = attack_s.timing.get("mean_s")
        if steady_s is not None and math.isnan(steady_s):
            steady_s = None
        out["streamed_total_s"] = round(dt_s, 2)
        out["streamed_epoch_steady_s"] = round(steady_s, 2) if steady_s else None
        if steady_s:
            out["streamed_img_s"] = round(args.n / steady_s, 1)
        print(f"streamed train: total {dt_s:.1f}s, steady epoch "
              f"{steady_s and round(steady_s, 2)}s", flush=True)
        try:
            stats = jax.local_devices()[0].memory_stats()
            out["hbm_peak_gib_after_streamed"] = round(
                stats["peak_bytes_in_use"] / 2**30, 2
            )
        except Exception:
            pass

    # --- 5. 1000-class conditioned Laplace fit ---------------------------
    from dl_attack_on_imagenet_tpu.ops.laplace import laplace_fit_conditioned

    rng = np.random.default_rng(1)
    for rows in (args.n, 50_000):
        v = rng.standard_normal((rows, 100)).astype(np.float32)
        groups = rng.integers(0, 1000, size=rows)
        t0 = time.perf_counter()
        loc, scale = laplace_fit_conditioned(v, groups, 1000)
        out[f"laplace_fit_{rows}_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
