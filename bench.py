"""Headline benchmark: ADiL attack iterations/sec/chip (ResNet-50, batch 64).

One attack iteration = one projected-AdamW step of dictionary learning
against a frozen bf16 ResNet-50: forward of x + Dv through the victim,
backward to (D, v), AdamW update, budget projections — the reference's hot
loop (adil.py:168-191) at the BASELINE.md operating point (eps=8/255, linf,
K=100, CW loss, batch 100->64 per BASELINE.json's metric definition).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md). The baseline
used here is 6.5 it/s — a literature-typical single-V100 fwd+bwd throughput
for ResNet-50 at batch 64 in eager PyTorch, i.e. a *generous* stand-in for
the reference's per-iteration cost (its real loop adds unjitted Python
overhead, per-call CPU->GPU eye materialization, and synchronous metric
reads).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
from _cpu_cache import compilation_cache_dir

# Persistent compilation cache: first-compiles through the remote-compile
# tunnel cost minutes; cached runs start in seconds (measured 71s -> 1.9s).
# Platform-dispatched dir: '.jax_cache' on the chip, the host-salted CPU
# dir when run with JAX_PLATFORMS=cpu (CPU AOT entries are keyed to the
# compiling host's CPU features and this VM migrates hosts).
jax.config.update("jax_compilation_cache_dir", compilation_cache_dir(_REPO))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

BASELINE_ITERS_PER_SEC = 6.5


def main():
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core
    from dl_attack_on_imagenet_tpu.attacks.adil_core import AdilConfig
    from dl_attack_on_imagenet_tpu.models import create_model

    batch = 64
    cfg = AdilConfig(
        eps=8 / 255, norm="linf", n_atoms=100, loss="logits", kappa=50.0,
        step_size=0.01, batch_size=batch,
        # Mixed-precision perturbation (master D/v + projections stay fp32).
        perturb_dtype="bfloat16",
    )
    # stem_s2d: space-to-depth stem — mathematically identical ResNet-50
    # (logits and input-gradients equal to 2e-4, tests/test_s2d_stem.py) but
    # the attack's stem input-gradient maps ~2x better onto the MXU
    # (21.6 -> 19.9 ms/step measured; see BENCHMARKS.md).
    # fold_bn: frozen eval-mode BatchNorms absorbed into conv kernels+biases
    # (exact, tests/test_fold_bn.py) — removes an elementwise pass per conv
    # (53.2 -> 55.4 it/s measured A/B).
    # blocked_input: the training pipeline runs in the s2d stem's compute
    # layout — images fed as space_to_depth(x), dictionary columns in the
    # same blocked order. Exactly the standard trajectory under a fixed
    # column permutation (tests/test_blocked_pipeline.py: AdamW is
    # elementwise; linf/l2 dictionary projections are permutation-
    # invariant), but the model's input-gradient leaves the backward
    # already in the D-matmul layout — no transpose/copy chain.
    from dl_attack_on_imagenet_tpu.models.layers import space_to_depth

    victim = create_model(
        "resnet50", rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
        blocked_input=True, fold_bn=True,
    )

    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    images = space_to_depth(jax.random.uniform(k1, (batch, 224, 224, 3)))
    state = core.init_state(k2, (112, 112, 12), batch, cfg)
    labels = core.predict_labels(victim.apply_fn, victim.variables, images)
    images = images.astype(jnp.bfloat16)  # pre-cast once (resident data)
    # Donated state: D/v/AdamW moments update in place (saves ~1.4 ms/iter
    # of HBM traffic, measured).
    step = jax.jit(core.make_train_step(victim.apply_fn, cfg, "both"),
                   donate_argnums=(0,))

    idx = jnp.arange(batch)
    mask = jnp.ones((batch,))

    # Warmup / compile the single step (kept compiled: it shares cache with
    # the scan body) then the chained scan. The scan threads state through
    # every iteration (data dependency — the valid measurement protocol, see
    # BENCHMARKS.md) and dispatches once per SCAN_LEN steps, removing the
    # ~1.1 ms/step host-dispatch gap of the per-step loop; the production
    # epoch path gets the same via core.make_epoch_fn_presliced /
    # make_train_scan (the reference's steps_in inner loop, adil.py:265-316).
    state, loss, fooling = step(state, victim.variables, images, labels, idx, mask)
    jax.block_until_ready(state.d)

    SCAN_LEN = 30
    # make_train_scan is already jitted with donate_argnums=(0,) — wrapping
    # it in another jit would drop the state donation at the executed
    # boundary and double-buffer D/v/AdamW moments.
    scan = core.make_train_scan(victim.apply_fn, cfg, "both", n_steps=SCAN_LEN)
    state, losses, foolings = scan(state, victim.variables, images, labels, idx, mask)
    jax.block_until_ready(state.d)

    # Per-dispatch timing: the mean gives the wall-clock contract number;
    # the MIN filters the 65-68 it/s host-side variance BENCHMARKS.md
    # documents (physical-host jitter between dispatches) and lands on the
    # stable device program time (14.66 ms/step per the round-4 trace) —
    # emitted as device_ms_per_iter so round-over-round comparisons don't
    # inherit host noise (VERDICT round-4 weak #3 / directive #6).
    n_dispatch = 6
    per_dispatch = []
    for _ in range(n_dispatch):
        t0 = time.perf_counter()
        state, losses, foolings = scan(
            state, victim.variables, images, labels, idx, mask
        )
        jax.block_until_ready(state.d)
        per_dispatch.append(time.perf_counter() - t0)
    dt = sum(per_dispatch) / (n_dispatch * SCAN_LEN)
    device_ms = min(per_dispatch) / SCAN_LEN * 1e3

    iters_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "adil_attack_iters_per_sec_per_chip_resnet50_b64",
                "value": round(iters_per_sec, 2),
                "unit": "iters/s",
                "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 2),
                "device_ms_per_iter": round(device_ms, 3),
            }
        )
    )


# The axon tunnel to the chip drops transiently (measured: mid-epoch wedges
# in the config-4 rehearsal, "TPU backend setup/compile error (Unavailable)"
# bursts lasting minutes — BENCHMARKS.md). A backend-init failure poisons the
# whole process, so retries must re-exec a fresh interpreter. Bounded: the
# driver still sees a nonzero exit if the tunnel stays down.
_RETRY_ENV = "BENCH_RETRY_ATTEMPT"
_MAX_ATTEMPTS = 4
_RETRY_SLEEP_S = float(os.environ.get("BENCH_RETRY_SLEEP_S", "90"))


def _is_transient(err: BaseException) -> bool:
    # Case-insensitive: the tunnel reports both 'UNAVAILABLE:' (status code)
    # and '(Unavailable)' (prose) forms of the same outage.
    text = str(err).lower()
    return (
        "unable to initialize backend" in text
        or "unavailable" in text
        or "deadline_exceeded" in text
    )


def _retry_or_raise(err: BaseException) -> None:
    """Re-exec a fresh interpreter for transient faults within budget.

    Retry messages go to stderr; stdout stays reserved for the one JSON
    line the driver parses. Non-transient or budget-exhausted errors
    re-raise so the driver records the failure.
    """
    attempt = int(os.environ.get(_RETRY_ENV, "1"))
    if not _is_transient(err) or attempt >= _MAX_ATTEMPTS:
        raise err
    print(
        f"bench: transient TPU/tunnel failure (attempt {attempt}/"
        f"{_MAX_ATTEMPTS}), re-exec in {_RETRY_SLEEP_S:.0f}s: {err}",
        file=sys.stderr,
    )
    time.sleep(_RETRY_SLEEP_S)
    os.environ[_RETRY_ENV] = str(attempt + 1)
    os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])


if __name__ == "__main__":
    try:
        main()
    except Exception as err:  # noqa: BLE001 — classify, then retry or re-raise
        _retry_or_raise(err)
