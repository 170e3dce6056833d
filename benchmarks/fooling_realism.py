"""End-to-end on-chip fooling realism (VERDICT r1 item #8).

Round 1 only ever attacked random-init victims on the TPU (fooling 0→2%:
a random ResNet's argmax is nearly input-insensitive). This run closes the
gap between "the step is fast" and "the attack works at speed":

1. make a separable synthetic 10-class dataset (224x224, per-class smooth
   color pattern + noise — no ImageNet files ship in this env),
2. TRAIN the bf16 ResNet-50 victim on-chip until it actually classifies
   (so its margins respond to perturbations like a real pretrained model),
3. run the real ADiL class API (dictionary learning + DDrague inference)
   against the frozen victim and report it/s together with the fooling
   curve and held-out fooling rate.

    python benchmarks/fooling_realism.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from _cpu_cache import compilation_cache_dir

# Platform-dispatched cache dir: '.jax_cache' on the chip, the host-salted
# CPU dir under JAX_PLATFORMS=cpu (see _cpu_cache.compilation_cache_dir).
jax.config.update(
    "jax_compilation_cache_dir",
    compilation_cache_dir(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

N_CLASSES = 10
SIZE = 224
N_TRAIN = 256
N_VAL = 64


def make_dataset(key):
    """Per-class smooth pattern (7x7 noise, bilinear-upsampled) + pixel noise.

    Computed on the host CPU backend and returned as NUMPY, so the 193 MB
    device->host readback disappears — the axon tunnel's bulk D2H was
    measured at ~0.35 MB/s on some hosts (~9 min for this array), which
    dominated whole driver runs. Consumers upload (H2D is ~20-200 MB/s)
    as needed; train_victim does so itself. The threefry DRAWS are
    backend-invariant, but the f32 resize arithmetic is not — the images
    differ in ulps from the former on-chip version (see the BENCHMARKS
    round-5 config-5 sensitivity note for a measured consequence).
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)  # created ON cpu: no tunnel hop
        else:
            # a key minted on the axon device needs one (tiny but, on a
            # degraded tunnel, minutes-slow) D2H hop — pull it once here
            key = jax.device_put(key, cpu)
        kc, kn, kl = jax.random.split(key, 3)
        base = jax.random.uniform(kc, (N_CLASSES, 7, 7, 3))
        base = jax.image.resize(base, (N_CLASSES, SIZE, SIZE, 3), "bilinear")
        labels = jax.random.randint(kl, (N_TRAIN + N_VAL,), 0, N_CLASSES)
        noise = jax.random.uniform(kn, (N_TRAIN + N_VAL, SIZE, SIZE, 3)) * 0.25
        images = jnp.clip(base[labels] * 0.75 + noise, 0.0, 1.0)
    return np.asarray(images), np.asarray(labels)


def victim_kwargs(name: str) -> dict:
    """The realism drivers' shared create_model extras: stem_s2d on the
    victims these benchmarks have always run with it (resnets/densenets;
    kept as-is for comparability with earlier rounds' rows). Passing the
    kwarg to a model whose ctor lacks the field raises — create_model
    forwards unknown kwargs — so non-stem victims get an empty dict."""
    return {"stem_s2d": True} if name.startswith(("resnet", "densenet")) else {}


def train_victim(victim, images, labels, steps=150, batch=64, lr=2e-4):
    # one H2D upload; the per-step gather then stays device-side
    images = jax.device_put(jnp.asarray(images, jnp.float32), jax.devices()[0])
    labels = jax.device_put(jnp.asarray(labels, jnp.int32), jax.devices()[0])
    tx = optax.adam(lr)
    opt_state = tx.init(victim.variables["params"])
    variables = victim.variables

    @jax.jit
    def step(params, opt_state, x, y, batch_stats):
        def loss_fn(p):
            logits = victim.module.apply(
                {"params": p, **({"batch_stats": batch_stats} if batch_stats else {})},
                (x - jnp.asarray([0.485, 0.456, 0.406])) / jnp.asarray([0.229, 0.224, 0.225]),
            ).astype(jnp.float32)
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    key = jax.random.PRNGKey(42)
    n = images.shape[0]
    t0 = time.perf_counter()
    loss = None
    for it in range(steps):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (batch,), 0, n)
        params, opt_state, loss = step(params, opt_state, images[idx], labels[idx], batch_stats)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    new_vars = {"params": params}
    if batch_stats:
        new_vars["batch_stats"] = batch_stats
    import dataclasses

    victim = dataclasses.replace(victim, variables=new_vars)
    return victim, float(loss), dt


def main():
    from dl_attack_on_imagenet_tpu.attacks import ADIL
    from dl_attack_on_imagenet_tpu.data import ArrayDataset
    from dl_attack_on_imagenet_tpu.evaluation import metrics
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.utils import ArtifactCache

    victim = create_model(
        "resnet50", rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16, stem_s2d=True
    )
    images, labels = make_dataset(7)
    train_x, val_x = images[:N_TRAIN], images[N_TRAIN:]
    train_y, val_y = labels[:N_TRAIN], labels[N_TRAIN:]

    victim, final_loss, train_dt = train_victim(victim, train_x, train_y)
    ds_train = ArrayDataset(np.asarray(train_x), np.asarray(train_y))
    ds_val = ArrayDataset(np.asarray(val_x), np.asarray(val_y))
    acc_train = metrics.model_accuracy(ds_train, victim)
    acc_val = metrics.model_accuracy(ds_val, victim)
    print(json.dumps({
        "victim_train": {"steps": 150, "loss": round(final_loss, 4),
                          "train_acc": acc_train, "val_acc": acc_val,
                          "seconds": round(train_dt, 1)}
    }), flush=True)

    import shutil

    shutil.rmtree("/tmp/fooling_realism_dicts", ignore_errors=True)
    cache = ArtifactCache("/tmp/fooling_realism_dicts")

    def run(eps, tag, steps=40):
        atk = ADIL(
            victim, eps=eps, n_atoms=100, loss="logits", kappa=50.0,
            steps=steps, batch_size=64, steps_inference=30, cache=cache,
            model_name=tag, seed=0, val_every=10, verbose=False,
        )
        t0 = time.perf_counter()
        atk.learn_dictionary(ds_train, ds_val)
        learn_dt = time.perf_counter() - t0
        hist = atk.history
        n_epochs = len(hist["loss"])
        its = n_epochs * (-(-N_TRAIN // 64)) / learn_dt
        adv = atk(jnp.asarray(val_x))  # DDrague on never-seen images
        fool = float(metrics.compute_fooling_rate(victim, adv, jnp.asarray(val_x))) / N_VAL
        # Hard-budget fooling: the v-AdamW solver never exceeds eps
        # (DDrague's dv = D D†z is not l∞-contractive — documented property).
        adv_budget = atk.forward_supervised_adamw(jnp.asarray(val_x))
        fool_budget = float(
            metrics.compute_fooling_rate(victim, adv_budget, jnp.asarray(val_x))
        ) / N_VAL
        linf = float(jnp.max(jnp.abs(adv_budget - val_x)))
        return {
            "eps": round(eps, 4),
            "epochs": n_epochs,
            "iters_per_sec_incl_compile": round(its, 2),
            "train_fooling_curve": [round(f, 3) for f in hist["fooling_rate"][:: max(n_epochs // 10, 1)]],
            "final_train_fooling": round(hist["fooling_rate"][-1], 3),
            "heldout_ddrague_fooling": round(fool, 3),
            "heldout_budgeted_fooling": round(fool_budget, 3),
            "budgeted_linf": round(linf, 4),
        }

    # Cold run at the headline operating point (eps=8/255), then a warm
    # rerun for steady-state it/s (jit cache hot), then a wider budget to
    # show high HARD-budget fooling against the robust synthetic victim.
    r_cold = run(8 / 255, "realism_cold")
    r_warm = run(8 / 255, "realism_warm")
    r_wide = run(32 / 255, "realism_wide")
    print(json.dumps({
        "eps_8_255_cold": r_cold,
        "eps_8_255_warm_steady": r_warm,
        "eps_32_255": r_wide,
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
