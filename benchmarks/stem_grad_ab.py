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

Each item reports ms/call and the HBM-roofline bound at 819 GB/s so the
"at its measured bound" judgment (BENCHMARKS.md round 3) is grounded.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

B = 64
REPS = 50


def timeit(fn, *args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


def conv(x, k, pad):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def input_grad_fn(k, pad, xshape):
    def f(x, g):
        _, vjp = jax.vjp(lambda x_: conv(x_, k, pad), x)
        return vjp(g)[0]

    return jax.jit(f)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dt = jnp.bfloat16

    # (a) current 2x2-blocked stem
    x_a = jax.random.normal(ks[0], (B, 112, 112, 12), dt)
    k_a = jax.random.normal(ks[1], (4, 4, 12, 64), dt)
    g_a = jax.random.normal(ks[2], (B, 112, 112, 64), dt)
    f_a = input_grad_fn(k_a, ((2, 1), (2, 1)), x_a.shape)
    ms_a = timeit(f_a, x_a, g_a)

    # (b) 4x4-blocked stem, 2x2-blocked output
    x_b = jax.random.normal(ks[3], (B, 56, 56, 48), dt)
    k_b = jax.random.normal(ks[4], (3, 3, 48, 256), dt)
    g_b = jax.random.normal(ks[5], (B, 56, 56, 256), dt)
    f_b = input_grad_fn(k_b, ((1, 1), (1, 1)), x_b.shape)
    ms_b = timeit(f_b, x_b, g_b)

    # (c) per-parity split: 4 convs (2,2,48,64), gradients summed
    k_c = jax.random.normal(ks[6], (4, 2, 2, 48, 64), dt)

    def multi(x, g4):
        tot = None
        for p in range(4):
            _, vjp = jax.vjp(
                lambda x_: conv(x_, k_c[p], ((1, 0), (1, 0))), x
            )
            gi = vjp(g4[p])[0]
            tot = gi if tot is None else tot + gi
        return tot

    g_c = jax.random.normal(ks[7], (4, B, 56, 56, 64), dt)
    f_c = jax.jit(multi)
    ms_c = timeit(f_c, x_b, g_c)

    # (2) relu-bwd at stage-1 shape
    y = jax.nn.relu(jax.random.normal(ks[0], (B, 56, 56, 256), dt))
    g = jax.random.normal(ks[1], (B, 56, 56, 256), dt)
    f_r = jax.jit(lambda y_, g_: jnp.where(y_ > 0, g_, jnp.zeros_like(g_)))
    ms_r = timeit(f_r, y, g)
    bytes_r = 3 * y.size * 2
    bound_r = bytes_r / 819e9 * 1e3

    # (3) maxpool fwd/bwd at the stem shape
    import flax.linen as nn

    xp = jax.random.normal(ks[2], (B, 112, 112, 64), dt)

    def pool(x):
        return nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

    f_pf = jax.jit(pool)
    ms_pf = timeit(f_pf, xp)

    gp = jax.random.normal(ks[3], (B, 56, 56, 64), dt)

    def pool_bwd(x, g_):
        _, vjp = jax.vjp(pool, x)
        return vjp(g_)[0]

    f_pb = jax.jit(pool_bwd)
    ms_pb = timeit(f_pb, xp, gp)

    flops_exact = 2 * B * 112 * 112 * 49 * 3 * 64  # the true 7x7/s2 stem grad
    print("stem input-grad (exact math = %.1f GFLOP):" % (flops_exact / 1e9))
    print(f"  (a) 2x2-blocked (4,4,12,64):    {ms_a:7.3f} ms  "
          f"({flops_exact/ms_a/1e9:.1f} TF/s effective)")
    print(f"  (b) 4x4-blocked (3,3,48,256):   {ms_b:7.3f} ms")
    print(f"  (c) 4x per-parity (2,2,48,64):  {ms_c:7.3f} ms")
    print(f"relu-bwd (64,56,56,256) bf16:     {ms_r:7.3f} ms  "
          f"(HBM bound {bound_r:.3f} ms at 819 GB/s)")
    print(f"maxpool fwd reduce_window:        {ms_pf:7.3f} ms")
    print(f"maxpool bwd (select_and_scatter): {ms_pb:7.3f} ms")


if __name__ == "__main__":
    main()
