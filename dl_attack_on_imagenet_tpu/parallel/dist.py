"""Multi-host coordination: the TPU-native replacement for env_setting.py.

The reference discovers topology from SLURM env vars at import time and
rendezvouses NCCL over raw TCP (env_setting.py:10-28) — importing the attack
package outside SLURM crashes (SURVEY.md §2.4). Here discovery is lazy and
optional: single-host runs never touch it, and multi-host runs call
``auto_initialize()`` which defers to JAX's coordination service.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class DistributedEnv:
    coordinator: Optional[str]
    num_processes: int
    process_id: int

    @property
    def is_distributed(self) -> bool:
        return self.num_processes > 1


def distributed_env() -> DistributedEnv:
    """Read the launcher environment (SLURM or explicit JAX vars), lazily.

    SLURM var names follow the reference (env_setting.py:10-16); the
    rendezvous port rule (12345 + min gpu id) is replaced by a fixed default
    overridable via JAX_COORDINATOR_PORT.
    """
    num = int(
        os.environ.get("JAX_NUM_PROCESSES", os.environ.get("SLURM_NTASKS", "1"))
    )
    pid = int(
        os.environ.get("JAX_PROCESS_ID", os.environ.get("SLURM_PROCID", "0"))
    )
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and "SLURM_JOB_NODELIST" in os.environ:
        head = expand_first_host(os.environ["SLURM_JOB_NODELIST"])
        port = os.environ.get("JAX_COORDINATOR_PORT", "12345")
        coordinator = f"{head}:{port}"
    return DistributedEnv(coordinator, num, pid)


def expand_first_host(nodelist: str) -> str:
    """First hostname of a SLURM nodelist, with bracket-range expansion.

    Handles 'node[001-004,007],other[1-2]' -> 'node001' (the reference pulls
    this from the external ``hostlist`` package, env_setting.py:10-11).
    """
    import re

    nodelist = nodelist.strip()
    m = re.match(r"([^,\[]*)\[([^\]]*)\]", nodelist)
    if not m:
        return nodelist.split(",")[0]
    prefix, ranges = m.group(1), m.group(2)
    first = ranges.split(",")[0]
    lo = first.split("-")[0]
    return f"{prefix}{lo}"


_initialized = False


def auto_initialize(env: Optional[DistributedEnv] = None) -> DistributedEnv:
    """Initialize jax.distributed once, if the environment asks for it.

    Replaces dist_init/cleanup (env_setting.py:25-32); JAX handles teardown
    at process exit, so there is no cleanup() to call.
    """
    global _initialized
    env = env or distributed_env()
    if env.is_distributed and not _initialized:
        import jax

        jax.distributed.initialize(
            coordinator_address=env.coordinator,
            num_processes=env.num_processes,
            process_id=env.process_id,
        )
        _initialized = True
    return env
