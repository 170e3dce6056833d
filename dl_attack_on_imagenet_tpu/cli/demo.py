"""Full ADiL experiment driver: clean accuracy -> class-balanced split ->
hyper-grid attack training -> val + test evaluation -> artifact dump.

Mirror of /root/reference/demo_dL_attack.py (argparse :159-206, accuracy
check :65-66, split :76-78, grids :88-94, get_atks :114-118, eval+save
:146-156). The ``--synthetic N`` flag substitutes a random dataset + tiny
victim so the pipeline is exercisable without the ILSVRC tree.

Usage: python -m dl_attack_on_imagenet_tpu.cli.demo --model densenet \
           --num-train-per-class 10 [--distributed] [--synthetic 0]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("adil-experiment")
    p.add_argument("--model", default="densenet")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num-train-per-class", type=int, default=10)
    p.add_argument("--trained-classes", type=int, default=1000)
    p.add_argument("--distributed", action="store_true",
                   help="train the dictionary over the full device mesh")
    p.add_argument("--steps-inference", type=int, default=100)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--n-atoms", type=int, default=100)
    p.add_argument("--kappa", type=float, default=50.0)
    p.add_argument("--eps", type=float, default=8 / 255)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--data-root", default="./data/ImageNet")
    p.add_argument("--dict-dir", default="trained_dicts")
    p.add_argument("--results-dir", default="dict_model_ImageNet_version_constrained")
    p.add_argument("--synthetic", type=int, default=0,
                   help=">0: use a synthetic dataset of this size + tiny victim")
    p.add_argument("--input-size", type=int, default=None,
                   help="victim input size. Default resolves to the "
                        "reference's blanket Resize(256)+CenterCrop(224) "
                        "transform fed to EVERY ImageNet victim including "
                        "inception_v3 (DS_ImageNet.py:14-18, main.py:47-48); "
                        "pass 299 for Inception's native size")
    # TPU performance knobs (BENCHMARKS.md; defaults keep the reference
    # trajectory exactly).
    p.add_argument("--mixed-precision", action="store_true",
                   help="perturb_dtype=bfloat16: bf16 inner forwards, fp32 "
                        "master state and budget clamps (~7%% faster steps)")
    from ._victim import add_victim_args

    add_victim_args(p)
    return p


def main(args) -> dict:
    from .. import evaluation as perf
    from ..attacks import ADIL
    from ..data import ArrayDataset, load_imagenet, split_by_class
    from ..evaluation import model_accuracy
    from ..models import create_model
    from ..parallel import data_mesh
    from ..utils import ArtifactCache, save_artifact

    rng = jax.random.PRNGKey(args.seed)

    if args.synthetic:
        victim = create_model("tiny", rng=rng)
        n = args.synthetic
        images = np.asarray(jax.random.uniform(rng, (n, 32, 32, 3)))
        # Balanced synthetic labels so the class-split always works.
        labels = np.arange(n) % 4
        dataset = ArrayDataset(images, labels)
        num_classes = 4
        per_class = [2, 1, 1]
        model_name = "tiny"
    else:
        # Blanket input size for every victim (incl. inception) — the
        # reference's single dataset transform (DS_ImageNet.py:14-18) —
        # plus --fast-victim knobs and optional --weights conversion.
        from ._victim import build_victim

        victim = build_victim(args)
        folder = load_imagenet(args.data_root)
        dataset = folder.materialize()
        num_classes = args.trained_classes
        per_class = [args.num_train_per_class, 2, 5]
        model_name = args.model

    acc = model_accuracy(dataset, victim)
    print(f"accuracy of model {model_name}: {acc * 100:.2f}%")

    train_ds, val_ds, test_ds = split_by_class(
        dataset, per_class, number_of_classes=num_classes, seed=args.seed
    )

    mesh = data_mesh() if args.distributed else None
    cache = ArtifactCache(args.dict_dir)

    attacks_hyper = {
        "adil": perf.get_atks(
            victim, ADIL,
            "n_atoms", [args.n_atoms], "kappa", [args.kappa],
            data_train=train_ds, data_val=val_ds, norm="linf",
            attack="supervised", eps=args.eps, steps=args.steps,
            targeted=False, step_size=0.01,
            batch_size=min(args.batch_size, len(train_ds)),
            model_name=model_name, mesh=mesh, steps_in=1, loss="logits",
            method="gd", warm_start=False,
            steps_inference=args.steps_inference, cache=cache,
            perturb_dtype="bfloat16" if getattr(args, "mixed_precision", False)
            else "float32",
        ),
    }

    val_loader = list(
        (x, y) for _, x, y in val_ds.batches(min(10, len(val_ds)))
    )
    test_loader = list(
        (x, y) for _, x, y in test_ds.batches(min(20, len(test_ds)))
    )

    val_perf = perf.get_performance(attacks_hyper, victim, val_loader, verbose=True)
    test_perf = perf.get_performance(attacks_hyper, victim, test_loader, verbose=True)

    results = {"val": val_perf, "test": test_perf, "accuracy": float(acc)}
    out_path = f"{args.results_dir}/results_{model_name}_seed{args.seed}.msgpack"
    save_artifact(out_path, _flatten(results))
    print(f"saved results to {out_path}")
    print("val:", val_perf)
    print("test:", test_perf)
    return results


def _flatten(tree, prefix=""):
    """Flatten nested result dicts into msgpack-serializable leaves.

    Numeric leaves become floats/arrays; string leaves (the harness's
    ``group_key``/``sub_names`` name-mapping entries) pass through as-is.
    """
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key + "/"))
        elif isinstance(v, str):
            flat[key] = v
        elif isinstance(v, (list, tuple)):
            if v and all(isinstance(e, str) for e in v):
                flat[key] = list(v)
            else:
                flat[key] = np.asarray(v, np.float64)
        else:
            flat[key] = float(v)
    return flat


if __name__ == "__main__":
    main(build_argparser().parse_args())
