"""Class-API end-to-end training rate at the headline operating point.

The isolated-step bench (bench.py) measures the compute; this measures
what a USER gets from `ADIL.learn_dictionary` — blocked auto-dispatch,
pre-sliced epochs, mixed precision, metric readbacks and all. N=256
synthetic images, ResNet-50 bf16, batch 64, K=100, CW loss.

    python benchmarks/class_e2e.py [--steps 30]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _cpu_cache import compilation_cache_dir

# Platform-dispatched cache dir: '.jax_cache' on the chip, the host-salted
# CPU dir under JAX_PLATFORMS=cpu (see _cpu_cache.compilation_cache_dir).
jax.config.update(
    "jax_compilation_cache_dir",
    compilation_cache_dir(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from dl_attack_on_imagenet_tpu.attacks import ADIL
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--no-pipeline", action="store_true",
                   help="disable the depth-1 epoch pipeline (A/B)")
    args = p.parse_args()

    victim = create_model(
        "resnet50", rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
        stem_s2d=True, fold_bn=True,
    )
    images = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (args.n, 224, 224, 3)),
        np.float32,
    )
    ds = ArrayDataset(images, np.zeros((args.n,), np.int32))
    atk = ADIL(
        victim, eps=8 / 255, norm="linf", steps=args.steps, n_atoms=100,
        batch_size=64, loss="logits", kappa=50.0, val_every=None,
        cache=ArtifactCache(tempfile.mkdtemp()), perturb_dtype="bfloat16",
        pipeline_epochs=not args.no_pipeline,
    )
    t0 = time.perf_counter()
    atk.learn_dictionary(ds)
    wall = time.perf_counter() - t0
    t = atk.timing
    steps_per_epoch = -(-args.n // 64)
    print(
        f"class e2e: {args.steps} epochs x {steps_per_epoch} steps, "
        f"wall {wall:.1f}s (incl. compile); steady epoch {t['mean_s']*1000:.1f} ms "
        f"= {steps_per_epoch/t['mean_s']:.1f} it/s, "
        f"{args.n/t['mean_s']:.0f} img/s through the class API"
    )


if __name__ == "__main__":
    main()
