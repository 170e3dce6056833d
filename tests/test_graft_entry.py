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


def test_bench_retry_classification():
    # bench.py re-execs itself (fresh interpreter — a failed backend init
    # poisons the process) only for transient tunnel faults, and only up to
    # its bounded attempt budget; everything else must surface to the driver.
    # Subprocess import: bench.py sets the process-wide TPU compilation-cache
    # config at import time, which this suite's CPU process must not inherit.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["BENCH_RETRY_SLEEP_S"] = "0"
    code = (
        "import os, sys, bench\n"
        "tr = RuntimeError(\n"
        "    \"Unable to initialize backend 'axon': UNAVAILABLE: \"\n"
        "    'TPU backend setup/compile error (Unavailable).')\n"
        "assert bench._is_transient(tr)\n"
        "assert bench._is_transient(RuntimeError('DEADLINE_EXCEEDED: rpc'))\n"
        "# Mixed-case prose form (no status-code prefix) must also match.\n"
        "assert bench._is_transient(RuntimeError(\n"
        "    'TPU backend setup/compile error (Unavailable).'))\n"
        "assert not bench._is_transient(ValueError('bad shape (64, 100)'))\n"
        "assert not bench._is_transient(MemoryError('oom'))\n"
        "assert bench._MAX_ATTEMPTS >= 2\n"
        "# Budget exhausted: transient faults re-raise instead of re-exec.\n"
        "os.environ[bench._RETRY_ENV] = str(bench._MAX_ATTEMPTS)\n"
        "try:\n"
        "    bench._retry_or_raise(tr)\n"
        "except RuntimeError as e:\n"
        "    assert e is tr\n"
        "else:\n"
        "    raise AssertionError('expected re-raise at budget')\n"
        "# Non-transient: re-raises even with budget left.\n"
        "os.environ[bench._RETRY_ENV] = '1'\n"
        "bad = ValueError('bug')\n"
        "try:\n"
        "    bench._retry_or_raise(bad)\n"
        "except ValueError as e:\n"
        "    assert e is bad\n"
        "else:\n"
        "    raise AssertionError('expected re-raise for non-transient')\n"
        "# Within budget + transient: bumps the counter and re-execs bench.py.\n"
        "calls = []\n"
        "bench.os.execv = lambda exe, argv: calls.append((exe, argv))\n"
        "bench._retry_or_raise(tr)\n"
        "assert calls and calls[0][0] == sys.executable\n"
        "assert calls[0][1][1].endswith('bench.py')\n"
        "assert os.environ[bench._RETRY_ENV] == '2'\n"
        "print('BENCHRETRYOK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "BENCHRETRYOK" in proc.stdout
