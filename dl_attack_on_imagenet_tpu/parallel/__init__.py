"""Distributed runtime (L1 of the reference layer map, SURVEY.md §1).

Replaces the reference's SLURM/NCCL stack (env_setting.py + the DDP code
paths in adil.py:334-430, uappgd.py:109-163, model_accuracy.py:19-47) with
the TPU-native equivalents: ``jax.distributed.initialize`` for multi-host
coordination, a ``jax.sharding.Mesh`` with a ``'data'`` axis, and
``shard_map`` + ``lax.psum`` for gradient/metric reduction over ICI.
"""

from .mesh import data_mesh, local_devices  # noqa: F401
from .dist import auto_initialize, distributed_env  # noqa: F401
from .adil_dp import learn_dictionary_distributed, make_dp_epoch_fn  # noqa: F401
from .health import check_mesh  # noqa: F401

__all__ = [
    "data_mesh",
    "local_devices",
    "auto_initialize",
    "distributed_env",
    "learn_dictionary_distributed",
    "make_dp_epoch_fn",
    "check_mesh",
]
