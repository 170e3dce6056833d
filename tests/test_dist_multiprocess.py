"""Two-process jax.distributed smoke test (VERDICT round 1, item #10).

The reference's multi-host runtime is env_setting.py:25-28 (NCCL process
group over a TCP rendezvous). Its replacement, ``parallel.dist.auto_initialize``,
had only unit-level parsing tests in round 1 — this launches a REAL
2-process ``jax.distributed`` rendezvous on CPU and asserts a psum across
process boundaries, the JAX-native analog of the reference's
``dist.reduce(SUM)`` (adil.py:418-419).
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO_DIR"])
from dl_attack_on_imagenet_tpu.parallel import auto_initialize, distributed_env

env = distributed_env()
assert env.is_distributed and env.num_processes == 2, env
auto_initialize(env)

import jax
import jax.numpy as jnp

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.devices()

# psum across the process boundary: process p contributes p+1; both must
# see 1+2=3 (the dist.reduce(SUM) analog, but symmetric — no rank-0 gate).
x = jnp.ones((1, 1)) * (env.process_id + 1)
out = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
total = float(out[0, 0])
assert total == 3.0, total
print(f"proc {env.process_id}: psum={total} OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_psum():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            REPO_DIR=repo,
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        )
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                cwd=repo,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
    assert any("proc 0: psum=3.0 OK" in o for _, o, _ in outs)
    assert any("proc 1: psum=3.0 OK" in o for _, o, _ in outs)


def test_slurm_style_env_discovery():
    # The same rendezvous driven by SLURM-shaped vars (env_setting.py:10-16
    # replacement path): nodelist + ntasks + procid, no JAX_* overrides.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            REPO_DIR=repo,
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            SLURM_NTASKS="2",
            SLURM_PROCID=str(pid),
            SLURM_JOB_NODELIST="127.0.0.1",
            JAX_COORDINATOR_PORT=str(port),
        )
        for k in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID", "JAX_COORDINATOR_ADDRESS",
                  "JAX_COMPILATION_CACHE_DIR"):
            env.pop(k, None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                cwd=repo,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        assert "OK" in out
