"""Op-level device trace of the headline bench step (BENCHMARKS.md targets).

Runs the exact bench.py train step under jax.profiler.trace and prints the
per-op time ranking aggregated from the device xplane — the tool behind the
round-1/2 "named headroom" numbers. Run on the TPU (default platform).

    python benchmarks/profile_step.py [--steps 10] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import functools
import glob
import os
import sys
import tempfile

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


def build_step(batch=64, model="resnet50", size=224):
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core
    from dl_attack_on_imagenet_tpu.attacks.adil_core import AdilConfig
    from dl_attack_on_imagenet_tpu.models import create_model

    from dl_attack_on_imagenet_tpu.models.layers import space_to_depth

    cfg = AdilConfig(
        eps=8 / 255, norm="linf", n_atoms=100, loss="logits", kappa=50.0,
        step_size=0.01, batch_size=batch, perturb_dtype="bfloat16",
    )
    if model == "resnet50" and size == 224:
        # Mirrors bench.py: blocked-input pipeline (tests/test_blocked_pipeline.py).
        victim = create_model(
            "resnet50", rng=jax.random.PRNGKey(0), dtype=jnp.bfloat16,
            blocked_input=True, fold_bn=True,
        )
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        images = space_to_depth(jax.random.uniform(k1, (batch, 224, 224, 3)))
        state = core.init_state(k2, (112, 112, 12), batch, cfg)
    else:
        # Any zoo victim, unblocked (the zoo_step_bench configuration).
        victim = create_model(model, rng=jax.random.PRNGKey(0),
                              dtype=jnp.bfloat16, input_size=size)
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        images = jax.random.uniform(k1, (batch, size, size, 3))
        state = core.init_state(k2, (size, size, 3), batch, cfg)
    labels = core.predict_labels(victim.apply_fn, victim.variables, images)
    images = images.astype(jnp.bfloat16)
    step = jax.jit(core.make_train_step(victim.apply_fn, cfg, "both"),
                   donate_argnums=(0,))
    return step, state, victim.variables, images, labels, jnp.arange(batch), jnp.ones((batch,))


# --- minimal protobuf wire-format reader (no xplane_pb2 in this image) ----
# Schema (tsl/profiler/protobuf/xplane.proto):
# XSpace.planes=1; XPlane{name=2, lines=3, event_metadata=4(map)};
# XLine{name=2, events=4}; XEvent{metadata_id=1, duration_ps=3};
# XEventMetadata{id=1, name=2}; map entry{key=1, value=2}.


def _fields(buf):
    """Yield (field_no, wire_type, value) from a serialized message."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        else:  # pragma: no cover - groups unused
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def _varint(buf, i):
    shift = out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def parse_xspace(logdir: str):
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    with open(files[0], "rb") as f:
        return f.read()


def device_op_times(xspace_bytes):
    """Aggregate event durations per op name on device (TPU) planes."""
    totals = collections.Counter()
    counts = collections.Counter()
    for fno, _, plane in _fields(xspace_bytes):
        if fno != 1:  # XSpace.planes
            continue
        name = b""
        lines, emeta = [], {}
        for pf, _, pv in _fields(plane):
            if pf == 2:
                name = pv
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata>
                k = v = None
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:
                        for ef, _, ev_ in _fields(mv):
                            if ef == 2:
                                v = ev_.decode(errors="replace")
                emeta[k] = v
        pname = name.decode(errors="replace").lower()
        if ("tpu" not in pname and "device" not in pname) or "host" in pname:
            continue
        for line in lines:
            lname = b""
            events = []
            for lf, _, lv in _fields(line):
                if lf in (2, 11):
                    lname = lv
                elif lf == 4:
                    events.append(lv)
            # Only the synchronous compute stream — "Async XLA Ops" (DMAs
            # overlapping compute) and "Steps"/"XLA Modules" (step spans)
            # would double-count.
            if lname.decode(errors="replace") != "XLA Ops":
                continue
            for lv in events:
                mid = dur = 0
                for ef, _, ev_ in _fields(lv):
                    if ef == 1:
                        mid = ev_
                    elif ef == 3:
                        dur = ev_
                op = emeta.get(mid, str(mid))
                totals[op] += dur
                counts[op] += 1
    return totals, counts


def build_ddrague(batch=64, model="resnet50", size=224, iters=30):
    """The DDrague serving solver at the class routing's fast config:
    blocked twin + bf16 inner forward (the 525 ms/b64 round-2 row).
    tol=0 pins the while_loop to exactly ``iters`` iterations so the
    per-op totals divide cleanly (VERDICT r3 #5)."""
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core
    from dl_attack_on_imagenet_tpu.attacks.adil_core import AdilConfig
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.models.layers import space_to_depth

    cfg = AdilConfig(eps=8 / 255, n_atoms=100, loss="ce", tol=0.0,
                     steps_inference=iters, perturb_dtype="bfloat16")
    if model == "resnet50" and size == 224:
        victim = create_model(model, rng=jax.random.PRNGKey(0),
                              dtype=jnp.bfloat16, blocked_input=True,
                              fold_bn=True)
        x = space_to_depth(
            jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size, 3)))
        d = space_to_depth(
            jax.random.uniform(jax.random.PRNGKey(5), (100, size, size, 3),
                               minval=-1, maxval=1))
    else:
        victim = create_model(model, rng=jax.random.PRNGKey(0),
                              dtype=jnp.bfloat16, input_size=size)
        x = jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size, 3))
        d = jax.random.uniform(jax.random.PRNGKey(5), (100, size, size, 3),
                               minval=-1, maxval=1)
    # variables as a jit ARGUMENT, not a closure constant: baked-in params
    # exceed the axon remote-compile request size for the big victims
    # (HTTP 413 — see zoo_infer_bench.py).
    fn = jax.jit(lambda vars_, d_, img: core.supervised_ddrague(
        victim.apply_fn, vars_, d_, img, cfg))
    return functools.partial(fn, victim.variables), d, x


def build_fab(batch=64, model="resnet50", size=224, steps=100):
    """The suite-table FAB program at its operating point (baseline_suite_
    bench.py fab row: eps=8/255, steps=100, 9 untargeted candidates,
    random b64 images, labels = victim predictions). Used to measure the
    per-op split behind the r50/r18 = 2.13x scaling (advisor r4 #3:
    'measure the split before claiming it')."""
    from dl_attack_on_imagenet_tpu.attacks import FAB
    from dl_attack_on_imagenet_tpu.attacks import adil_core as core
    from dl_attack_on_imagenet_tpu.models import create_model

    from fooling_realism import victim_kwargs

    victim = create_model(model, rng=jax.random.PRNGKey(0),
                          dtype=jnp.bfloat16, input_size=size,
                          **victim_kwargs(model))
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size, 3))
    labels = core.predict_labels(victim.apply_fn, victim.variables, x)
    atk = FAB(victim, eps=8 / 255, steps=steps, n_classes=10)
    return atk, x, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--target", default="train",
                    choices=("train", "ddrague", "fab"),
                    help="train = the bench.py dictionary step; ddrague = "
                         "the serving solver (30 pinned iters per call); "
                         "fab = the suite FAB program (one full forward, "
                         "per-FAB-iteration attribution)")
    args = ap.parse_args()

    if args.target == "fab":
        fab_steps = 100
        atk, x, labels = build_fab(args.batch, args.model, args.size,
                                   steps=fab_steps)
        adv = atk(x, labels)
        jax.block_until_ready(adv)  # compile outside the trace
        logdir = args.logdir or tempfile.mkdtemp(prefix="adil_trace_")
        with jax.profiler.trace(logdir):
            adv = atk(x, labels)
            jax.block_until_ready(adv)
        args.steps = fab_steps  # per-FAB-iteration attribution
    elif args.target == "ddrague":
        fn, d, x = build_ddrague(args.batch, args.model, args.size)
        adv = fn(d, x)
        jax.block_until_ready(adv)
        logdir = args.logdir or tempfile.mkdtemp(prefix="adil_trace_")
        calls = max(1, args.steps // 10)
        with jax.profiler.trace(logdir):
            for _ in range(calls):
                adv = fn(d, x)
            jax.block_until_ready(adv)
        args.steps = calls * 30  # per-solver-iteration attribution
    else:
        step, state, variables, images, labels, idx, mask = build_step(
            args.batch, args.model, args.size)
        state, loss, _ = step(state, variables, images, labels, idx, mask)
        jax.block_until_ready(state.d)

        logdir = args.logdir or tempfile.mkdtemp(prefix="adil_trace_")
        with jax.profiler.trace(logdir):
            for _ in range(args.steps):
                state, loss, _ = step(state, variables, images, labels, idx, mask)
            jax.block_until_ready(state.d)

    xspace = parse_xspace(logdir)
    totals, counts = device_op_times(xspace)
    grand = sum(totals.values())
    print(f"# trace: {logdir}  ({args.steps} steps, total device {grand/1e12*1000:.2f} ms)")
    print(f"{'ms/step':>9}  {'%':>5}  {'n':>4}  op")
    for op, ps in totals.most_common(args.top):
        ms = ps / 1e12 * 1000 / args.steps
        print(f"{ms:9.3f}  {100*ps/grand:5.1f}  {counts[op]:4d}  {op[:110]}")


if __name__ == "__main__":
    main()
