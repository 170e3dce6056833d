"""dl_attack_on_imagenet_tpu — TPU-native adversarial dictionary learning.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``flavie-yuan-liu/DL_attack_on_ImageNet`` (ADiL — Adversarial Dictionary
Learning, plus the UAP-PGD / Fast-UAP / DeepFool / universal-perturbation
baselines and their evaluation harness), re-designed TPU-first:

- all attack math is pure, jit-compiled JAX (NHWC layout, bfloat16-friendly);
- the dictionary contraction ``D·v`` is a single MXU matmul (optionally a
  fused Pallas kernel that also applies the eps-clamp / pixel-clip);
- data parallelism is a ``jax.sharding.Mesh`` with per-image coding vectors
  sharded alongside their image shard (the reference's DDP path,
  adil.py:334-430, without NCCL);
- victim classifiers are Flax modules with a torch-checkpoint converter.

Layout conventions (differ from the torch reference on purpose):
- images:      (N, H, W, C) in [0, 1]
- dictionary:  (K, H, W, C)  [reference stores (C, H, W, K), adil.py:148]
- codes v:     (N, K)
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
