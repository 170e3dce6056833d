"""Guard the driver deliverables in __graft_entry__.py.

Round-1 regression: dryrun_multichip ran on whatever platform the caller's
environment gave it (the axon TPU under the driver) and died on a stale AOT
cache (MULTICHIP_r01.json). It must now (a) run inline when the process is
already an n-device CPU mesh (this suite's conftest), and (b) re-exec itself
with a forced CPU env otherwise.
"""

import os
import subprocess
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_cpu_mesh_ready_reflects_conftest(devices):
    assert graft._cpu_mesh_ready(8)
    assert not graft._cpu_mesh_ready(len(jax.devices()) + 1)


def test_dryrun_multichip_inline(devices):
    # conftest configured cpu-8, so this takes the inline path and exercises
    # every collective: DP dict learning, UAP-PGD DP==serial, sharded
    # accuracy==serial, sharded DDrague==single-device.
    graft.dryrun_multichip(8)


def test_dryrun_subprocess_env_is_forced():
    # The subprocess path must work from a hostile environment: platform
    # pinned to something that does not exist and a poisoned XLA_FLAGS.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(4); print('SUBOK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "SUBOK" in proc.stdout
    assert "dryrun_multichip(4): ok" in proc.stdout
