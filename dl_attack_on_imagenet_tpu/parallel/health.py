"""Device-mesh health checking.

The reference has no failure detection at all (SURVEY.md §5) — a hung NCCL
rank deadlocks the job. This provides the minimal TPU-native equivalent: a
collective round-trip that proves every device in the mesh computes and
communicates, run before committing to a long training job.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def check_mesh(mesh: Mesh, axis: str = "data") -> dict:
    """Run a psum + identity round-trip over every device in the mesh.

    Returns {'ok': bool, 'n_devices': int, 'psum': float, 'expected': float}.
    Raises nothing — callers decide how to react to ok=False.
    """
    n = mesh.devices.size
    x = jnp.arange(1, n + 1, dtype=jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P(axis)))

    def body(v):
        total = jax.lax.psum(jnp.sum(v), axis)
        return v * 0 + total

    fn = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                      check_vma=False)
    )
    try:
        out = np.asarray(fn(xs))
        expected = float(n * (n + 1) / 2)
        ok = bool(np.all(out == expected))
        return {"ok": ok, "n_devices": n, "psum": float(out[0]), "expected": expected}
    except Exception as e:  # pragma: no cover - device failure path
        return {"ok": False, "n_devices": n, "error": str(e)}
