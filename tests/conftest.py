"""Test harness config: run everything on a virtual 8-device CPU mesh.

The multi-chip DP path (parallel/) is exercised without TPU hardware via
XLA's host-platform device-count override — the JAX-native analog of a fake
distributed backend (see SURVEY.md §4).

This must run before any test imports trigger backend initialization. The
axon sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon,
so overriding the env var here is too late — we go through jax.config, which
takes effect because no backend has been *initialized* yet.
"""

import os
import sys

# The suite jit-compiles thousands of XLA:CPU executables in one process;
# each loaded executable holds several anonymous mappings, and the peak
# (measured 2026-08-18: 73,416 maps for 363 tests) exceeds the kernel's
# default vm.max_map_count of 65,530. Past the limit mmap fails and
# XLA:CPU dereferences the failure unchecked — a deterministic mid-suite
# SEGFAULT in compilation_cache.get_executable_and_time at whichever test
# crosses the threshold (postmortem: 4 identical crashes the night the
# suite grew from 356 to 363 tests; the same suite passes with the limit
# raised, peaking 12% above the old ceiling). Raise the limit up front
# (this environment runs as root); the pressure-relief fixture below is
# the fallback when the sysctl isn't writable.
_MAP_LIMIT_TARGET = 1_048_576


def _read_map_limit() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except (OSError, ValueError):
        return 65_530


try:
    if _read_map_limit() < _MAP_LIMIT_TARGET:
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write(str(_MAP_LIMIT_TARGET))
except OSError:
    pass

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# Children of the suite (dryrun re-execs, multiprocess DP tests) must never
# claim the single axon TPU chip — a subprocess claim blocks until its
# timeout (observed: test_dryrun_subprocess_env_is_forced hanging 1200 s).
# Clearing here is too late for THIS process (sitecustomize already ran)
# but is inherited by every subprocess, which is what matters.
os.environ["PALLAS_AXON_POOL_IPS"] = ""

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from _cpu_cache import cpu_cache_dir  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the suite's model-zoo compiles dominate its
# runtime on this 1-CPU host; caching them across runs cuts the full suite
# from ~35 min cold to ~20 min. CPU-ONLY dir, salted per physical host
# (see _cpu_cache.py): XLA:CPU entries are AOT machine code keyed to the
# compiling host's CPU features, and this VM migrates hosts.
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir(_REPO))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest  # noqa: E402


def _map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True, scope="module")
def _map_pressure_relief():
    """Drop compiled executables when mapping pressure nears the kernel cap.

    Only fires when the max_map_count raise above failed (non-root
    environments): clearing jax's caches munmaps loaded executables, and
    subsequent compiles re-load cheaply from the persistent disk cache.
    """
    yield
    if _map_count() > 0.7 * _read_map_limit():
        jax.clear_caches()


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
