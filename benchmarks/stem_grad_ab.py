"""Isolated A/B of the round-3 headroom candidates (VERDICT round-2 #1b).

Times, on the real chip, standalone versions of the three named per-op
targets of the 14.7 ms headline step:

1. stem input-gradient, three formulations:
   a) current 2x2-blocked: (112,112,12) (x) (4,4,12,64) — the 1.11 ms op
      (12-ch gradient output underfills the 128 MXU lanes);
   b) 4x4-blocked: (56,56,48) (x) (3,3,48,256) with 2x2-blocked output —
      48-ch gradient output, but ~2.9x zero-padded FLOPs;
   c) per-output-parity split: four (2,2,48,64) convs on the 4x4-blocked
      input (77% kernel fill), gradients summed.
2. relu-bwd: g * (y > 0) at the stage-1 shape (64,56,56,256) bf16 — the
   isolated cost of one link of the ~3 ms compare_select chain.
3. maxpool fwd reduce_window and bwd select_and_scatter at the stem shape.

Measurement protocol: each op runs inside a length-REPS ``lax.scan`` whose
carry takes a scalar data dependency on the op's result (per-dispatch
timing is swamped by the ~1-2 ms host-dispatch gap — BENCHMARKS.md round
2); ms/op = one dispatch of the scan / REPS. Each item also prints the
HBM-roofline bound at 819 GB/s so the "at its measured bound" judgment
(BENCHMARKS.md round 3) is grounded.
"""

from __future__ import annotations

import os
import sys
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

B = 64
REPS = 50


def scan_time(op, x, *consts):
    """ms per op: op(x, *consts) scanned REPS times with a scalar carry
    dependency (x_{i+1} = x + tiny * mean(op(x_i))) so XLA cannot hoist."""

    def body(carry, _):
        out = op(carry, *consts)
        dep = jnp.mean(out[0] if isinstance(out, tuple) else out)
        return carry + (1e-12 * dep).astype(carry.dtype), ()

    fn = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=REPS)[0])
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(x)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    out = fn(x)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    return min(t1 - t0, t2 - t1) / REPS * 1000


def conv(x, k, pad):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def input_grad(x, g, k, pad):
    _, vjp = jax.vjp(lambda x_: conv(x_, k, pad), x)
    return vjp(g)[0]


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dt = jnp.bfloat16

    # (a) current 2x2-blocked stem
    x_a = jax.random.normal(ks[0], (B, 112, 112, 12), dt)
    k_a = jax.random.normal(ks[1], (4, 4, 12, 64), dt)
    g_a = jax.random.normal(ks[2], (B, 112, 112, 64), dt)
    ms_a = scan_time(
        lambda x, g, k: input_grad(x, g, k, ((2, 1), (2, 1))), x_a, g_a, k_a
    )

    # (b) 4x4-blocked stem, 2x2-blocked output
    x_b = jax.random.normal(ks[3], (B, 56, 56, 48), dt)
    k_b = jax.random.normal(ks[4], (3, 3, 48, 256), dt)
    g_b = jax.random.normal(ks[5], (B, 56, 56, 256), dt)
    ms_b = scan_time(
        lambda x, g, k: input_grad(x, g, k, ((1, 1), (1, 1))), x_b, g_b, k_b
    )

    # (c) per-parity split: 4 convs (2,2,48,64), gradients summed
    k_c = jax.random.normal(ks[6], (4, 2, 2, 48, 64), dt)
    g_c = jax.random.normal(ks[7], (4, B, 56, 56, 64), dt)

    def multi(x, g4, k4):
        tot = None
        for p in range(4):
            gi = input_grad(x, g4[p], k4[p], ((1, 0), (1, 0)))
            tot = gi if tot is None else tot + gi
        return tot

    ms_c = scan_time(multi, x_b, g_c, k_c)

    # (d) packed stride-2 transposed conv: g_out (112,112,64) -> g_in in a
    # 4x4-blocked (56,56,48) layout in ONE conv — output channels 48 instead
    # of 12, no change to the forward or the pool. (+ (e): the 0.09 ms-class
    # transpose back to the 2x2 layout, i.e. a drop-in backward replacement.)
    k_d = jax.random.normal(ks[4], (5, 5, 64, 48), dt)

    def packed(g, k):
        return jax.lax.conv_general_dilated(
            g, k, (2, 2), ((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    ms_d = scan_time(packed, g_a, k_d)

    def packed_t(g, k):
        y = packed(g, k)  # (B, 56, 56, 48) = (56,56,2,2,12) block-parity
        y = y.reshape(B, 56, 56, 2, 2, 12)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 112, 112, 12)
        return y

    ms_e = scan_time(packed_t, g_a, k_d)

    # (2) relu-bwd at stage-1 shape
    y = jax.nn.relu(jax.random.normal(ks[0], (B, 56, 56, 256), dt))
    g = jax.random.normal(ks[1], (B, 56, 56, 256), dt)
    ms_r = scan_time(
        lambda g_, y_: jnp.where(y_ > 0, g_, jnp.zeros_like(g_)), g, y
    )
    bound_r = 3 * y.size * 2 / 819e9 * 1e3

    # (3) maxpool fwd/bwd at the stem shape
    import flax.linen as nn

    xp = jax.random.normal(ks[2], (B, 112, 112, 64), dt)

    def pool(x):
        return nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

    ms_pf = scan_time(pool, xp)
    bound_pf = (xp.size + xp.size // 4) * 2 / 819e9 * 1e3

    gp = jax.random.normal(ks[3], (B, 56, 56, 64), dt)

    def pool_bwd(x, g_):
        _, vjp = jax.vjp(pool, x)
        return vjp(g_)[0]

    ms_pb = scan_time(pool_bwd, xp, gp)
    bound_pb = (2 * xp.size + 2 * (xp.size // 4)) * 2 / 819e9 * 1e3

    flops_exact = 2 * B * 112 * 112 * 49 * 3 * 64  # the true 7x7/s2 stem grad
    print("stem input-grad (exact math = %.1f GFLOP):" % (flops_exact / 1e9))
    print(f"  (a) 2x2-blocked (4,4,12,64):    {ms_a:7.3f} ms  "
          f"({flops_exact/ms_a/1e9:.1f} TF/s effective)")
    print(f"  (b) 4x4-blocked (3,3,48,256):   {ms_b:7.3f} ms")
    print(f"  (c) 4x per-parity (2,2,48,64):  {ms_c:7.3f} ms")
    print(f"  (d) packed s2 (5,5,64,48):      {ms_d:7.3f} ms")
    print(f"  (e) (d) + unblock transpose:    {ms_e:7.3f} ms")
    print(f"relu-bwd (64,56,56,256) bf16:     {ms_r:7.3f} ms  "
          f"(HBM bound {bound_r:.3f} ms at 819 GB/s)")
    print(f"maxpool fwd reduce_window:        {ms_pf:7.3f} ms  "
          f"(HBM bound {bound_pf:.3f} ms)")
    print(f"maxpool bwd (select_and_scatter): {ms_pb:7.3f} ms  "
          f"(HBM bound {bound_pb:.3f} ms)")


if __name__ == "__main__":
    main()
