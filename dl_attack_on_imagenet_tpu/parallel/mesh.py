"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def local_devices():
    return jax.devices()


def data_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices.

    The data axis is the only mesh axis the workload needs for parity (the
    largest learnable state, D, is ~15M floats and replicates; see SURVEY.md
    §2.2) — images and per-image codes shard along it.
    """
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))
