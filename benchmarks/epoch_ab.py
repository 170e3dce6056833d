"""A/B: ADiL epoch with in-scan gather vs pre-sliced batches (real chip).

Measures a full shuffled epoch (N=256, b=64, ResNet-50 bf16, blocked
pipeline off — the class-API configuration) both ways, preslice cost
included. Decides which epoch path _learn_gd should default to.
"""

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


def main():
    n, b = 256, 64
    cfg = AdilConfig(eps=8 / 255, norm="linf", n_atoms=100, loss="logits",
                     kappa=50.0, batch_size=b, perturb_dtype="bfloat16")
    victim = create_model("resnet50", rng=jax.random.PRNGKey(0),
                          dtype=jnp.bfloat16, stem_s2d=True, fold_bn=True)
    images = jax.random.uniform(jax.random.PRNGKey(1), (n, 224, 224, 3))
    labels = core.predict_labels(victim.apply_fn, victim.variables, images)
    images = images.astype(jnp.bfloat16)

    def run(tag, make_args, epoch_fn, iters=8):
        state = core.init_state(jax.random.PRNGKey(2), (224, 224, 3), n, cfg)
        key = jax.random.PRNGKey(3)
        # warmup/compile
        key, sub = jax.random.split(key)
        state, loss, _ = epoch_fn(state, victim.variables,
                                  *make_args(core.make_batches(sub, n, b)))
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            state, loss, _ = epoch_fn(state, victim.variables,
                                      *make_args(core.make_batches(sub, n, b)))
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: {dt*1000:.1f} ms/epoch ({n/dt:.0f} img/s, "
              f"{dt/ (n//b) *1000:.2f} ms/step)")
        return dt

    gather = core.make_epoch_fn(victim.apply_fn, cfg, "both")
    run("gather-epoch   ", lambda bt: (images, labels, bt), gather)

    presliced = core.make_epoch_fn_presliced(victim.apply_fn, cfg, "both")
    run("presliced-epoch", lambda bt: core.preslice_epoch(images, labels, bt),
        presliced)


if __name__ == "__main__":
    main()
