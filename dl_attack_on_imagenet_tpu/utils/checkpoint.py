"""Artifact persistence: trained dictionaries / UAPs / result dicts.

The reference both checkpoints and memoizes through deterministic
``torch.save`` paths derived from hyper-parameters (adil.py:89-101 —
``trained_dicts/ImageNet_{model}.bin``; uappgd.py:48-58;
adil_regularized.py:683-692): ``__init__`` trains only if the file is
missing, ``forward`` lazily reloads it. This module reproduces that contract
with msgpack-serialized JAX pytrees (no pickle, host-portable).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, (jax.Array, np.ndarray)) else x, tree
    )


def save_artifact(path: str, payload: Dict[str, Any]) -> None:
    """Serialize a dict-of-arrays/-scalars to ``path`` (msgpack)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.msgpack_serialize(_to_host(payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_artifact(path: str) -> Optional[Dict[str, Any]]:
    """Load a payload saved by :func:`save_artifact`; None if missing."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


class ArtifactCache:
    """Deterministic artifact paths keyed by attack hyper-parameters.

    ``ArtifactCache(root)("ImageNet", model="resnet", n_atoms=100)`` yields a
    stable filename; the reference's magic relative paths (adil.py:89-91)
    become explicit, configurable keys.

    ``backend='msgpack'`` (default) writes single flat files;
    ``backend='orbax'`` uses orbax StandardCheckpointer directories — the
    TPU-ecosystem checkpoint format (sharding-aware, async-capable), useful
    when artifacts grow beyond comfortable single-file sizes.
    """

    def __init__(self, root: str = "trained_dicts", backend: str = "msgpack"):
        if backend not in ("msgpack", "orbax"):
            raise ValueError(f"unknown backend {backend}")
        self.root = root
        self.backend = backend

    def path(self, prefix: str, **hyper: Any) -> str:
        parts = [prefix] + [f"{k}_{hyper[k]}" for k in sorted(hyper)]
        suffix = ".msgpack" if self.backend == "msgpack" else ".orbax"
        return os.path.join(self.root, "_".join(str(p) for p in parts) + suffix)

    def _checkpointer(self):
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer()

    def load(self, prefix: str, **hyper: Any):
        p = self.path(prefix, **hyper)
        if self.backend == "orbax":
            if not os.path.exists(p):
                return None
            return self._checkpointer().restore(os.path.abspath(p))
        return load_artifact(p)

    def save(self, payload: Dict[str, Any], prefix: str, **hyper: Any) -> str:
        p = self.path(prefix, **hyper)
        if self.backend == "orbax":
            os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
            ckptr = self._checkpointer()
            ckptr.save(os.path.abspath(p), _to_host(payload), force=True)
            ckptr.wait_until_finished()
        else:
            save_artifact(p, payload)
        return p

    def exists(self, prefix: str, **hyper: Any) -> bool:
        return os.path.exists(self.path(prefix, **hyper))

    def remove(self, prefix: str, **hyper: Any) -> None:
        """Delete an artifact (file or orbax checkpoint directory)."""
        import shutil

        p = self.path(prefix, **hyper)
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)

    # ------------------------------------------------------------------
    # Sharding-aware (multi-controller) checkpoints.
    #
    # The flat msgpack path gathers every leaf to one host, which a
    # multi-host (DCN) mesh cannot do — a row-sharded array is not fully
    # addressable from one controller. These methods keep leaves as
    # sharded ``jax.Array``s: orbax writes each host's shards in a
    # collective save and restores them to the shardings named by the
    # abstract template. EVERY process of the mesh must call them (they
    # contain collective barriers); the path must be on a filesystem all
    # hosts share. Reference analog: the rank-0 ``torch.save`` of the DDP
    # dictionary (adil.py:427-428) — which silently drops the other
    # ranks' optimizer state; here the full sharded state round-trips.
    # ------------------------------------------------------------------

    def _sharded_path(self, prefix: str, **hyper: Any) -> str:
        parts = [prefix] + [f"{k}_{hyper[k]}" for k in sorted(hyper)]
        return os.path.join(
            self.root, "_".join(str(p) for p in parts) + ".orbax_sharded"
        )

    def save_sharded(self, tree: Any, prefix: str, **hyper: Any) -> str:
        """Collective orbax save of a pytree of (possibly sharded) arrays."""
        import orbax.checkpoint as ocp

        p = os.path.abspath(self._sharded_path(prefix, **hyper))
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(p, tree, force=True)
        ckptr.wait_until_finished()
        return p

    def load_sharded(self, abstract_tree: Any, prefix: str, **hyper: Any):
        """Collective restore to the shapes/dtypes/shardings of
        ``abstract_tree`` (a pytree of ``jax.ShapeDtypeStruct`` carrying
        ``sharding``, or of live arrays — converted internally)."""
        import orbax.checkpoint as ocp

        p = os.path.abspath(self._sharded_path(prefix, **hyper))
        if not os.path.exists(p):
            return None
        abstract = jax.tree_util.tree_map(
            lambda x: x
            if isinstance(x, jax.ShapeDtypeStruct)
            else jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
            abstract_tree,
        )
        return ocp.StandardCheckpointer().restore(p, abstract)

    def exists_sharded(self, prefix: str, **hyper: Any) -> bool:
        return os.path.exists(self._sharded_path(prefix, **hyper))

    def remove_sharded(self, prefix: str, **hyper: Any) -> None:
        """Delete a sharded checkpoint. Multi-controller safe: all
        processes synchronize, process 0 removes, all synchronize again."""
        import shutil

        multi = jax.process_count() > 1
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("artifact_remove_sharded_pre")
        if jax.process_index() == 0:
            p = self._sharded_path(prefix, **hyper)
            if os.path.isdir(p):
                shutil.rmtree(p)
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("artifact_remove_sharded_post")
