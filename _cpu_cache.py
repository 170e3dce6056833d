"""Host-salted persistent compilation-cache directory for XLA:CPU runs.

XLA:CPU persistent-cache entries are AOT machine code compiled for the
*compiling* host's CPU features, and this VM migrates between physical
hosts — loading an entry produced on a different host logs
``cpu_aot_loader`` feature-mismatch errors and forces recompiles. Keying
the cache directory by the host's CPU signature makes a migration land in
a fresh (cold but clean) cache automatically; directories from previous
hosts are pruned since no process from that host can still be running
here. (The 2026-08-18 mid-suite segfaults initially blamed on stale
entries were actually vm.max_map_count exhaustion — see tests/conftest.py
— but the per-host salting stands on the feature-mismatch hygiene alone.)

TPU caches (``.jax_cache``) are unaffected: TPU executables are keyed by
libtpu build, not host CPU features.
"""

from __future__ import annotations

import hashlib
import os
import shutil

_PREFIX = ".jax_cache_cpu"


def _host_signature() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
    except OSError:
        return "unknown"
    keys = ("vendor_id", "cpu family", "model", "model name", "stepping", "flags")
    sig = "\n".join(l for l in lines if l.split(":")[0].strip() in keys)
    return hashlib.sha1(sig.encode()).hexdigest()[:10]


def cpu_cache_dir(repo_root: str, prune: bool = True) -> str:
    """Return the CPU-cache dir for THIS host, pruning other hosts' dirs."""
    name = f"{_PREFIX}_{_host_signature()}"
    if prune:
        try:
            for entry in os.listdir(repo_root):
                if entry.startswith(_PREFIX) and entry != name:
                    shutil.rmtree(os.path.join(repo_root, entry),
                                  ignore_errors=True)
        except OSError:
            pass
    return os.path.join(repo_root, name)


def compilation_cache_dir(repo_root: str) -> str:
    """Cache dir for the EFFECTIVE platform: '.jax_cache' (TPU) or salted CPU.

    Decides by ``jax.config jax_platforms`` falling back to the env var,
    not the env alone: under the test suite, conftest forces the config to
    "cpu" while a bare launch's env may still say "axon" — keying on the
    env alone repointed XLA:CPU entries into the TPU dir (unsalted, mixed
    with TPU AOT artifacts). Callers must configure the platform before
    calling (all repo entry points set JAX_PLATFORMS/config up front).
    """
    import jax  # deferred: callers may set platform config before first use

    platforms = (
        getattr(jax.config, "jax_platforms", None)
        or os.environ.get("JAX_PLATFORMS", "")
        or ""
    )
    if "cpu" in platforms:
        return cpu_cache_dir(repo_root)
    return os.path.join(repo_root, ".jax_cache")
