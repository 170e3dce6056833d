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

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the suite's model-zoo compiles dominate its
# runtime on this 1-CPU host; caching them across runs cuts minutes.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
