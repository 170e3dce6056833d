"""Batch adversarial generation: the production serving path.

Streams a directory (ILSVRC layout) or a dataset blob through a trained
ADiL dictionary in fixed-size batches — native C++ decode when available,
double-buffered host->device prefetch, jitted shape-cached inference — and
writes adversarial PNGs plus a JSONL report (per-batch fooling/mse/timing).

The reference has no batch-serving entry point (its attacks run inside the
eval harness only); this generalizes main.py's single-image flow to bulk
generation.

Usage:
  python -m dl_attack_on_imagenet_tpu.cli.generate \
      --model resnet50 --data-root ./data/ImageNet --out-dir ./adv \
      [--blob imagenet_val.npz] [--batch-size 64] [--mode supervised]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("adil-generate")
    p.add_argument("--model", default="resnet50")
    p.add_argument("--data-root", default="./data/ImageNet")
    p.add_argument("--blob", default=None, help="npz blob from cli.dataset")
    p.add_argument("--out-dir", default="./adv_out")
    p.add_argument("--dict-dir", default="trained_dicts")
    # Measured serving optimum on the v5e (benchmarks/batch_scaling.py:
    # DDrague 160.6 img/s at b128 vs 133.1 at b64; training peaks at b128
    # too) — the reference hardcodes bs=100 (adil.py:130).
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--mode", default="supervised",
                   choices=["supervised", "unsupervised"])
    p.add_argument("--eps", type=float, default=8 / 255)
    p.add_argument("--steps-inference", type=int, default=100)
    p.add_argument("--save-images", action="store_true",
                   help="write adversarial PNGs (default: metrics only)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--input-size", type=int, default=None,
                   help="victim input size; default resolves to the "
                        "reference's blanket 224 crop for every ImageNet "
                        "victim incl. inception (DS_ImageNet.py:14-18), "
                        "native size for the tiny test victim")
    # TPU serving knobs (same semantics as cli.demo; defaults keep the
    # reference trajectory exactly).
    from ._victim import add_victim_args

    add_victim_args(p)
    p.add_argument("--mixed-precision", action="store_true",
                   help="perturb_dtype=bfloat16: bf16 inner forwards, fp32 "
                        "master state and budget clamps")
    return p


def main(args) -> dict:
    from ..attacks import ADIL
    from ..data import prefetch_to_device
    from ..utils import ArtifactCache, MetricLogger

    from ._victim import build_victim

    victim = build_victim(args)
    attack = ADIL(
        victim, eps=args.eps, model_name=args.model, attack=args.mode,
        steps_inference=args.steps_inference, cache=ArtifactCache(args.dict_dir),
        perturb_dtype="bfloat16" if getattr(args, "mixed_precision", False)
        else "float32",
    )

    if args.blob:
        from .dataset import load_blob

        ds, _ = load_blob(args.blob)
        images, labels = ds.images, ds.labels
        if args.limit:
            images, labels = images[: args.limit], labels[: args.limit]

        def host_batches():
            b = args.batch_size
            for s in range(0, len(images), b):
                xb, yb = images[s : s + b], labels[s : s + b]
                yield s, xb, yb, len(xb)

    else:
        from ..data.imagenet import ImageNetFolder
        from ..runtime import get_runtime

        folder = ImageNetFolder(args.data_root, image_size=victim.input_size)
        n = min(args.limit or len(folder), len(folder))
        runtime = get_runtime()

        def host_batches():
            b = args.batch_size
            if runtime is not None:
                from ..runtime import HostLoader

                paths = [folder.samples[i][0] for i in range(n)]
                labs = [folder.samples[i][1] for i in range(n)]
                loader = HostLoader(runtime, paths, labs, b, victim.input_size)
                for idx, x, y in loader:
                    # Padding (-1) and failed decodes (-2) get replaced by
                    # cycled valid rows so every batch keeps ONE jit shape
                    # (ragged keep-counts would recompile the solver per
                    # distinct size); metrics/outputs use only real rows.
                    keep = y >= 0
                    if not keep.any():
                        continue
                    xk, yk = x[keep], y[keep]
                    if len(xk) < b:
                        reps = -(-b // len(xk))
                        xk = np.concatenate([xk] * reps)[:b]
                        yk = np.concatenate([yk] * reps)[:b]
                    yield idx * b, xk, yk, int(keep.sum())
                loader.close()
            else:
                for s in range(0, n, b):
                    sub = folder.materialize(range(s, min(s + b, n)))
                    yield s, sub.images, sub.labels, len(sub)

    os.makedirs(args.out_dir, exist_ok=True)
    log = MetricLogger(os.path.join(args.out_dir, "report.jsonl"))

    total = 0
    fooled = 0.0
    t0 = time.time()
    # Two-deep device lookahead: while the attack blocks on batch n, batch
    # n+1's decode and H2D transfer are already in flight (jax.device_put is
    # async) — without this the native decoder and the TPU idle-wait on each
    # other every batch.
    for start, x, y, k in prefetch_to_device(host_batches(), size=2):
        start, k = int(start), int(k)
        x = jnp.asarray(x, jnp.float32)
        tb = time.time()
        adv = attack(x, jnp.asarray(y))
        adv.block_until_ready()
        dt = time.time() - tb
        # only the first k rows are real (the rest are shape padding)
        x_r, adv_r = x[:k], adv[:k]
        clean_pred = victim.predict(x_r)
        adv_pred = victim.predict(adv_r)
        batch_fool = float(jnp.sum(clean_pred != adv_pred))
        mse = float(jnp.mean(jnp.sum((adv_r - x_r) ** 2, axis=(1, 2, 3))))
        total += k
        fooled += batch_fool
        log.log(start, n=k, fooling=batch_fool / k, mse=mse, seconds=dt)
        if args.save_images:
            from PIL import Image

            arr = np.asarray(jnp.clip(adv_r, 0, 1) * 255).astype(np.uint8)
            for j in range(arr.shape[0]):
                Image.fromarray(arr[j]).save(
                    os.path.join(args.out_dir, f"adv_{start + j:06d}.png")
                )

    summary = {
        "total": total,
        "fooling_rate": fooled / max(total, 1),
        "seconds": time.time() - t0,
        "images_per_sec": total / max(time.time() - t0, 1e-9),
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(build_argparser().parse_args())
