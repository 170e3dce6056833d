"""On-chip timings for EVERY reference attack class (VERDICT r1 item #7).

Round 1 benchmarked only ADiL + FGSM/PGD; this measures the ADILR solvers
(the heaviest reference code, adil_regularized.py:31-501), UAP-PGD,
FastUAP/DeepFoolCosinus, DeepFool, and the three ADiL inference modes, all
against the headline bf16 ResNet-50 victim on one v5e chip. Results go to
BENCHMARKS.md.

    python benchmarks/attack_family_bench.py          # runs everything
    python benchmarks/attack_family_bench.py adilr_fb uap_epoch   # subset
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import jax.numpy as jnp

from _cpu_cache import compilation_cache_dir

# Platform-dispatched cache dir: '.jax_cache' on the chip, the host-salted
# CPU dir under JAX_PLATFORMS=cpu (see _cpu_cache.compilation_cache_dir).
jax.config.update(
    "jax_compilation_cache_dir",
    compilation_cache_dir(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

SIZE = 224


def timed(fn, *args, warmup=1, iters=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(only=()):
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core
    from dl_attack_on_imagenet_tpu.attacks import adil_regularized as reg
    from dl_attack_on_imagenet_tpu.attacks.adil_core import AdilConfig
    from dl_attack_on_imagenet_tpu.attacks.adil_regularized import RegularizedConfig
    from dl_attack_on_imagenet_tpu.attacks.deepfool import deepfool_batch
    from dl_attack_on_imagenet_tpu.attacks.fast_uap import deepfool_cosinus_batch
    from dl_attack_on_imagenet_tpu.attacks.uap_pgd import UAPPGD, make_uap_epoch_fn
    from dl_attack_on_imagenet_tpu.models import create_model

    victim = create_model(
        "resnet50", rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16, stem_s2d=True
    )
    apply_fn, variables = victim.apply_fn, victim.variables
    key = jax.random.PRNGKey(1)
    x16 = jax.random.uniform(key, (16, SIZE, SIZE, 3))
    x64 = jax.random.uniform(key, (64, SIZE, SIZE, 3))
    labels16 = core.predict_labels(apply_fn, variables, x16)
    labels64 = core.predict_labels(apply_fn, variables, x64)

    results = {}

    def record(name, seconds, unit, note):
        results[name] = {"value": round(seconds, 4), "unit": unit, "note": note}
        print(json.dumps({"bench": name, **results[name]}), flush=True)

    want = lambda n: not only or n in only

    # --- ADILR deterministic: full-batch FB splitting w/ Bonettini search
    rcfg = RegularizedConfig(n_atoms=10, batch_size=16, steps=100)
    targets16 = reg._targets(apply_fn, variables, x16, labels16, rcfg.targeted)
    if want("adilr_fb"):
        fb = jax.jit(
            lambda img, tgt, k: reg.adil_fb(apply_fn, variables, img, tgt, rcfg, k, niter=3)[0]
        )
        dt = timed(fb, x16, targets16, key, iters=2)
        record("adilr_fb_iter", dt / 3, "s/FB-iter (b16, K=10)",
               "adil_regularized.py:31-197; each iter = 2 line searches")

    # --- ADILR stochastic: sadil_updated epochs (host-driven loop with
    # jitted per-batch solvers — cannot be wrapped in one jit: it reads
    # losses back for its stopping rule, adil_regularized.py:496-497).
    # tol=0 disables the convergence break so the epoch counts are exact.
    if want("adilr_sadil"):
        import dataclasses as _dc2

        rcfg_b = RegularizedConfig(n_atoms=10, batch_size=16, steps=100)

        def sd(nepochs, cfg=rcfg_b):
            t0 = time.perf_counter()
            d, v, losses = reg.sadil_updated(
                apply_fn, variables, x16, targets16, cfg, key,
                nepochs=nepochs, tol=0.0,
            )
            jax.block_until_ready(d)
            return time.perf_counter() - t0

        t_compile = sd(2)  # bears the actual compiles
        t_short, t_long = sd(2), sd(10)
        dt = (t_long - t_short) / 8
        record("adilr_sadil_updated_epoch", dt, "s/epoch steady (n16, b16)",
               f"adil_regularized.py:315-501; first-call compile {t_compile:.1f}s, "
               f"repeat-call overhead {t_short:.1f}s")
        # Hyper sweep reuses the SAME compile: lambdas/steps are traced args
        # (round 2; tests/test_adilr_compile_reuse.py). Each swept combo
        # should cost ~the repeat-call time, not the first-call compile.
        t_sweep = [
            sd(2, _dc2.replace(rcfg_b, lambda_l1=l1_, lambda_l2=l2_, step_size=s_))
            for (l1_, l2_, s_) in ((0.3, 0.05, 0.02), (0.02, 0.2, 0.005))
        ]
        record("adilr_sadil_updated_sweep_combo", max(t_sweep),
               "s/extra hyper combo (2 epochs)",
               f"compile shared across sweep (first call {t_compile:.1f}s)")

    # --- ADILR supervised inference: learn_coding_vectors
    if want("adilr_codes"):
        d10 = jax.random.normal(jax.random.PRNGKey(2), (10, SIZE, SIZE, 3)) * 0.01
        lcv = jax.jit(
            lambda d, img, tgt: reg.learn_coding_vectors(
                apply_fn, variables, d, img, tgt, rcfg, niter=30
            )
        )
        dt = timed(lcv, d10, x16, targets16)
        record("adilr_learn_coding_vectors", dt, "s/batch (b16, 30 iters)",
               "adil_regularized.py:508-628: prox-grad + 10-halving search")

    # --- UAP-PGD epoch (serial path, resident data)
    if want("uap_epoch"):
        uap = UAPPGD(victim, steps=1, batch_size=64, eps=0.1, norm="l2")
        epoch_fn = make_uap_epoch_fn(apply_fn, uap, None)
        n = 256
        xN = jax.random.uniform(key, (n, SIZE, SIZE, 3))
        labN = core.predict_labels(apply_fn, variables, xN)
        e0 = jnp.zeros((1, SIZE, SIZE, 3))
        opt0 = uap.make_optimizer().init(e0)
        batches = core.make_batches(jax.random.PRNGKey(3), n, 64)
        dt = timed(lambda: epoch_fn(e0, opt0, xN, labN, batches)[0])
        record("uappgd_epoch_n256_b64", dt, "s/epoch (4 batches)",
               f"uappgd.py:70-107; {n/dt:.0f} img/s")
        # Pre-sliced serial epoch — measured SLOWER for UAP (the production
        # serial path keeps the gather epoch; a shared-perturbation attack
        # gains nothing from materializing batches). Kept here as the
        # recorded A/B. Preslice gather included in the timing.
        from dl_attack_on_imagenet_tpu.attacks.uap_pgd import (
            make_uap_epoch_fn_presliced,
        )

        fn_p = make_uap_epoch_fn_presliced(apply_fn, uap)
        dt = timed(
            lambda: fn_p(e0, opt0, *core.preslice_epoch(xN, labN, batches))[0]
        )
        record("uappgd_epoch_n256_b64_presliced", dt, "s/epoch (4 batches)",
               f"gather-free scan; {n/dt:.0f} img/s")

    # --- Per-image gradient baselines (the driver's commented torchattacks
    # comparisons, demo_dL_attack.py:96-113)
    if want("pgd_family"):
        from dl_attack_on_imagenet_tpu.attacks import BIM, FGSM, PGD
        from dl_attack_on_imagenet_tpu.models import VictimModel

        victim_model = VictimModel(
            name="resnet50", module=victim.module, variables=variables,
            input_size=SIZE, num_classes=1000, apply_fn=apply_fn,
        )
        for tag, atk in (
            ("fgsm", FGSM(victim_model, eps=8 / 255)),
            ("pgd10", PGD(victim_model, eps=8 / 255, alpha=2 / 255, steps=10)),
            ("bim10", BIM(victim_model, eps=8 / 255, alpha=2 / 255, steps=10)),
        ):
            dt = timed(lambda a=atk: a(x64, labels64))
            record(f"{tag}_b64", dt, "s/batch (b64)",
                   f"pgd.py; {64/dt:.0f} img/s")

    # --- DeepFool (batched lockstep)
    if want("deepfool"):
        df = jax.jit(
            lambda img: deepfool_batch(apply_fn, variables, img, num_classes=10, max_iter=10)[0]
        )
        dt = timed(df, x16)
        record("deepfool_b16_maxiter10", dt, "s/batch",
               f"deepfool.py:9-69; {16/dt:.1f} img/s (10 classes x jacrev)")

    # --- Fast-UAP inner step (DeepFoolCosinus)
    if want("fastuap"):
        e = jax.random.normal(jax.random.PRNGKey(4), (1, SIZE, SIZE, 3)) * 0.01
        dfc = jax.jit(
            lambda img, a: deepfool_cosinus_batch(apply_fn, variables, img, a, max_iter=10)
        )
        dt = timed(dfc, x16, e)
        record("deepfool_cosinus_b16_maxiter10", dt, "s/batch",
               f"fast_uap.py:113-214; {16/dt:.1f} img/s")

    # --- Fast-UAP END-TO-END epoch (class API: gate + lockstep DeepFool +
    # ordered increment folding) — the chunked-vs-serial A/B VERDICT r2 #7
    # asked to measure (fast_uap.py:74-91 is strictly per-image).
    if want("fastuap_e2e"):
        import tempfile

        from dl_attack_on_imagenet_tpu.attacks.fast_uap import FastUAP
        from dl_attack_on_imagenet_tpu.utils import ArtifactCache

        n = 64
        xN = np.asarray(jax.random.uniform(jax.random.PRNGKey(7), (n, SIZE, SIZE, 3)))
        yN = np.asarray(core.predict_labels(apply_fn, variables, jnp.asarray(xN)))
        for chunk in (16, 1):
            atk = FastUAP(victim, steps=1, steps_deepfool=10, chunk=chunk,
                          cache=ArtifactCache(tempfile.mkdtemp()))
            atk.learn_attack((xN[:8], yN[:8]), None)  # bear the compiles
            t0 = time.perf_counter()
            atk.learn_attack((xN, yN), None)
            dt = time.perf_counter() - t0
            record(f"fastuap_e2e_epoch_n{n}_chunk{chunk}", dt,
                   "s/epoch (1 epoch, df<=10)",
                   f"fast_uap.py:58-97 end-to-end; {n/dt:.1f} img/s")

    # --- universal_perturbation (Moosavi) END-TO-END pass, chunked A/B
    if want("universal_e2e"):
        from dl_attack_on_imagenet_tpu.attacks.universal_pert import (
            universal_perturbation,
        )

        n = 64
        xN = np.asarray(jax.random.uniform(jax.random.PRNGKey(8), (n, SIZE, SIZE, 3)))
        yN = np.asarray(core.predict_labels(apply_fn, variables, jnp.asarray(xN)))
        for chunk in (8, 1):
            universal_perturbation(  # bear the compiles on a small slice
                (xN[:8], yN[:8]), (xN[:8], yN[:8]), victim,
                max_iter_uni=1, num_classes=10, max_iter_df=10, chunk=chunk,
            )
            t0 = time.perf_counter()
            universal_perturbation(
                (xN, yN), (xN[:16], yN[:16]), victim,
                max_iter_uni=1, num_classes=10, max_iter_df=10, chunk=chunk,
            )
            dt = time.perf_counter() - t0
            record(f"universal_pert_pass_n{n}_chunk{chunk}", dt,
                   "s/pass (1 uni-iter, df<=10)",
                   f"universal_pert.py:25-115 end-to-end; {n/dt:.1f} img/s")

    # --- ADiL inference modes (trained-dict attack path, adil.py:432-655)
    acfg = AdilConfig(eps=8 / 255, n_atoms=100, loss="ce", steps_inference=30)
    d100 = jax.random.uniform(jax.random.PRNGKey(5), (100, SIZE, SIZE, 3), minval=-1, maxval=1)
    import dataclasses as _dc

    acfg_bf16 = _dc.replace(acfg, perturb_dtype="bfloat16")
    if want("ddrague"):
        dd = jax.jit(lambda d, img: core.supervised_ddrague(apply_fn, variables, d, img, acfg))
        dt = timed(dd, d100, x64)
        record("adil_ddrague_b64", dt, "s/batch (<=30 iters)",
               f"adil.py:508-567; {64/dt:.0f} img/s")
        ddb = jax.jit(lambda d, img: core.supervised_ddrague(apply_fn, variables, d, img, acfg_bf16))
        dt = timed(ddb, d100, x64)
        record("adil_ddrague_b64_bf16", dt, "s/batch (<=30 iters)",
               f"mixed-precision inner fwd; {64/dt:.0f} img/s")
        # Blocked twin + bf16: the class routes supervised inference this
        # way for stem_s2d ResNets (exact under the column permutation,
        # tests/test_adil_blocked_class.py).
        from dl_attack_on_imagenet_tpu.models import create_model as _cm
        from dl_attack_on_imagenet_tpu.models.layers import space_to_depth as _s2d

        twin = _cm("resnet50", dtype=jnp.bfloat16, variables=variables,
                   blocked_input=True)
        d100_b, x64_b = _s2d(d100), _s2d(x64)
        ddk = jax.jit(lambda d, img: core.supervised_ddrague(
            twin.apply_fn, twin.variables, d, img, acfg_bf16))
        dt = timed(ddk, d100_b, x64_b)
        record("adil_ddrague_b64_bf16_blocked", dt, "s/batch (<=30 iters)",
               f"blocked twin + bf16; {64/dt:.0f} img/s")
    if want("adamw_codes"):
        ac = jax.jit(lambda d, img: core.supervised_adamw_codes(apply_fn, variables, d, img, acfg))
        dt = timed(ac, d100, x64)
        record("adil_adamw_codes_b64", dt, "s/batch (<=100 iters)",
               f"adil.py:569-623; {64/dt:.0f} img/s")
        acb = jax.jit(lambda d, img: core.supervised_adamw_codes(apply_fn, variables, d, img, acfg_bf16))
        dt = timed(acb, d100, x64)
        record("adil_adamw_codes_b64_bf16", dt, "s/batch (<=100 iters)",
               f"mixed-precision inner fwd; {64/dt:.0f} img/s")
    if want("unsup"):
        us = jax.jit(
            lambda d, img, k: core.unsupervised_sample(apply_fn, variables, d, img, k, acfg)
        )
        dt = timed(us, d100, x64, key)
        record("adil_unsupervised_b64_trials10", dt, "s/batch",
               f"adil.py:460-506; {64/dt:.0f} img/s")

    # --- ADILR Laplace-sampled unsupervised inference, all 4 conditioning
    # modes (adil_regularized.py:817-978) — class-level path incl. the
    # Laplace fit from a freshly-trained artifact.
    if want("adilr_unsup"):
        import tempfile

        from dl_attack_on_imagenet_tpu.attacks.adil_regularized import ADILR
        from dl_attack_on_imagenet_tpu.utils import ArtifactCache

        atk = ADILR(
            victim, steps=3, n_atoms=10, batch_size=16, trials=20,
            attack="unsupervised", attack_conditioned="labels_atoms",
            data_train=(np.asarray(x16), np.asarray(labels16)),
            cache=ArtifactCache(tempfile.mkdtemp()),
        )
        key_b = jax.random.PRNGKey(9)
        for mode, fn in (
            ("labels_atoms", lambda: atk.forward_unsupervised_conditioned_target_atoms(x16, labels16, key_b, "labels")),
            ("predictions_atoms", lambda: atk.forward_unsupervised_conditioned_target_atoms(x16, labels16, key_b, "predictions")),
            ("atoms", lambda: atk.forward_unsupervised_conditioned_atoms(x16, key_b)),
            ("none", lambda: atk.forward_unsupervised(x16, key_b)),
        ):
            dt = timed(fn, iters=3)
            record(f"adilr_unsup_{mode}_b16_trials20", dt, "s/batch",
                   f"{16/dt:.0f} img/s")

    # --- ADiL train step on the ViT-B/16 victim (BASELINE.json scope adds
    # ViT beyond the reference's six CNNs)
    if want("vit_step"):
        vit = create_model("vit_b16", rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        vcfg = AdilConfig(eps=8 / 255, n_atoms=100, loss="logits", kappa=50.0,
                          batch_size=64, perturb_dtype="bfloat16")
        state = core.init_state(jax.random.PRNGKey(6), (SIZE, SIZE, 3), 64, vcfg)
        step = jax.jit(core.make_train_step(vit.apply_fn, vcfg, "both"),
                       donate_argnums=(0,))
        idx = jnp.arange(64)
        mask = jnp.ones((64,))
        lab = core.predict_labels(vit.apply_fn, vit.variables, x64)
        xb = x64.astype(jnp.bfloat16)

        def one():
            nonlocal state
            state, loss, _ = step(state, vit.variables, xb, lab, idx, mask)
            return loss

        dt = timed(one, iters=10)
        record("adil_train_step_vit_b16_b64", dt, "s/iter",
               f"{1/dt:.1f} it/s — ViT victim (BASELINE.json scope)")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(tuple(sys.argv[1:]))
