"""Ground the vs_baseline anchor (VERDICT round 1, item #9).

The reference publishes no numbers (SURVEY.md §6), so round 1 used a
literature-typical 6.5 it/s single-V100 stand-in. This script produces a
MEASURED anchor on the current host's CPU: it times

1. the reference's actual per-iteration algorithm in eager PyTorch —
   including its per-step re-labeling forward of the unchanged images
   (adil.py:172) and the per-call ``torch.eye(n_classes)`` one-hot
   materialization inside the CW loss (adil.py:104-112) — implemented
   independently (same math, reference-shaped inefficiencies kept by
   intent; no code copied), and
2. this framework's jitted train step (attacks.adil_core.make_train_step)
   forced onto the same CPU,

on the same victim (ResNet-18, the reference's default, main.py:41-42),
batch, and atom count. Run:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/reference_cpu_baseline.py

Prints one JSON line with both it/s numbers and the measured ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8
N_ATOMS = 100
SIZE = 224
EPS = 8 / 255
KAPPA = 50.0
WARMUP = 1
STEPS = 3


def time_torch_reference_loop():
    import torch
    import torch.nn as tnn

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_torch_forward_parity import TorchResNet18

    torch.manual_seed(0)
    model = TorchResNet18().eval()
    for p in model.parameters():
        p.requires_grad_(False)

    x = torch.rand(BATCH, 3, SIZE, SIZE)
    d = (torch.rand(3, SIZE, SIZE, N_ATOMS) * 2 - 1).requires_grad_(True)
    v = torch.rand(BATCH, N_ATOMS).requires_grad_(True)
    opt = torch.optim.AdamW([d, v], lr=0.01)

    def l1_ball_project(rows, eps):
        # Duchi et al. sort-based simplex projection (the reference's
        # projection_v for the l∞ budget, adil.py:625-633 via utils.py:21-41).
        sign = rows.sign()
        mag = rows.abs()
        mu, _ = torch.sort(mag, dim=1, descending=True)
        cssv = mu.cumsum(dim=1) - eps
        arange = torch.arange(1, rows.shape[1] + 1, dtype=rows.dtype)
        cond = mu - cssv / arange > 0
        rho = cond.float().cumsum(dim=1).argmax(dim=1)
        theta = torch.clamp(
            cssv.gather(1, rho[:, None]) / (rho[:, None] + 1).to(rows.dtype),
            min=0,
        )
        proj = sign * torch.clamp(mag - theta, min=0)
        inside = mag.sum(dim=1, keepdim=True) <= eps
        return torch.where(inside, rows, proj)

    def cw_loss(logits, labels):
        # Reference f_loss semantics (adil.py:103-112): one-hot via a full
        # eye materialized PER CALL (the inefficiency being measured).
        one_hot = torch.eye(logits.shape[-1])[labels]
        real = (one_hot * logits).sum(-1)
        other = ((1 - one_hot) * logits - one_hot * 1e4).max(-1).values
        return torch.clamp(real - other, min=-KAPPA).sum()

    def step():
        # Re-labeling forward on the unchanged clean batch, every step
        # (adil.py:172).
        with torch.no_grad():
            labels = model(x).argmax(-1)
        dv = torch.tensordot(v, d, dims=([1], [3]))
        out = model(x + dv)
        loss = -cw_loss(out, labels)
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            # post-step projections (adil.py:187-188): codes onto the eps
            # l1-ball, dictionary clamped to [-1, 1].
            v.copy_(l1_ball_project(v, EPS))
            d.clamp_(-1.0, 1.0)
        return float(loss)

    for _ in range(WARMUP):
        step()
    t0 = time.perf_counter()
    for _ in range(STEPS):
        step()
    dt = (time.perf_counter() - t0) / STEPS
    return 1.0 / dt, dt


def time_jax_rebuild_loop():
    import jax

    assert jax.default_backend() == "cpu", (
        "run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu — this anchor is a "
        "same-host CPU/CPU comparison"
    )
    import jax.numpy as jnp

    from dl_attack_on_imagenet_tpu.attacks import adil_core as core
    from dl_attack_on_imagenet_tpu.attacks.adil_core import AdilConfig
    from dl_attack_on_imagenet_tpu.models import create_model

    victim = create_model("resnet18", rng=jax.random.PRNGKey(0), normalize=False)
    cfg = AdilConfig(eps=EPS, n_atoms=N_ATOMS, loss="logits", kappa=KAPPA,
                     batch_size=BATCH)
    key = jax.random.PRNGKey(1)
    kx, kd, kv = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (BATCH, SIZE, SIZE, 3))
    state = core.init_state(kd, (SIZE, SIZE, 3), BATCH, cfg)
    labels = core.predict_labels(victim.apply_fn, victim.variables, x)
    idx = jnp.arange(BATCH)
    mask = jnp.ones((BATCH,), jnp.float32)

    step = jax.jit(core.make_train_step(victim.apply_fn, cfg), donate_argnums=(0,))
    state, _, _ = step(state, victim.variables, x, labels, idx, mask)  # compile
    jax.block_until_ready(state.d)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, _, _ = step(state, victim.variables, x, labels, idx, mask)
    jax.block_until_ready(state.d)
    dt = (time.perf_counter() - t0) / STEPS
    return 1.0 / dt, dt


def main():
    torch_its, torch_dt = time_torch_reference_loop()
    jax_its, jax_dt = time_jax_rebuild_loop()
    print(json.dumps({
        "host": "cpu (1 core)",
        "config": {"victim": "resnet18", "batch": BATCH, "n_atoms": N_ATOMS},
        "reference_eager_torch_it_s": round(torch_its, 4),
        "rebuild_jax_it_s": round(jax_its, 4),
        "measured_ratio": round(jax_its / torch_its, 3),
    }))


if __name__ == "__main__":
    main()
