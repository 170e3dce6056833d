"""Two-process DP dictionary training over a DCN-spanning mesh.

Extends the psum smoke (test_dist_multiprocess.py) to the REAL workload:
``learn_dictionary_distributed`` runs in two coordinated processes, each
contributing 4 virtual CPU devices to one global 8-device ``data`` mesh —
the jax.distributed analog of the reference's multi-node DDP dictionary
learning (adil.py:334-430 over env_setting.py's rendezvous). Asserts both
controllers converge to the SAME replicated dictionary and loss, and that
the result matches a single-process 8-device run of the identical config.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO_DIR"])
from dl_attack_on_imagenet_tpu.parallel import auto_initialize, distributed_env

env = distributed_env()
auto_initialize(env)

import jax
import jax.numpy as jnp
import numpy as np

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.devices()

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.parallel import data_mesh, learn_dictionary_distributed

victim = create_model("tiny", rng=jax.random.PRNGKey(0))
images = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3)))
labels = np.zeros((16,), np.int32)
cfg = AdilConfig(eps=8 / 255, n_atoms=4, loss="ce", steps=2, batch_size=8)

mesh = data_mesh(8)
d, v, history = learn_dictionary_distributed(
    victim, ArrayDataset(images, labels), cfg, mesh,
)
assert d.shape == (4, 32, 32, 3), d.shape
assert v.shape == (16, 4), v.shape
losses = ",".join(f"{x:.6f}" for x in history["loss"])
print(f"proc {env.process_id}: losses={losses} "
      f"dsum={float(jnp.sum(jnp.abs(d))):.6f} OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_training_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            REPO_DIR=repo,
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        )
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env, cwd=repo,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-4000:]}"

    # Both controllers see the identical replicated result.
    lines = [
        next(l for l in out.splitlines() if l.endswith("OK"))
        for _, out, _ in outs
    ]
    payload0 = lines[0].split(": ", 1)[1]
    payload1 = lines[1].split(": ", 1)[1]
    assert payload0 == payload1, (payload0, payload1)

    # And it matches the single-process 8-device run of the same config.
    from dl_attack_on_imagenet_tpu.attacks import AdilConfig
    from dl_attack_on_imagenet_tpu.data import ArrayDataset
    from dl_attack_on_imagenet_tpu.models import create_model
    from dl_attack_on_imagenet_tpu.parallel import (
        data_mesh,
        learn_dictionary_distributed,
    )
    import jax
    import jax.numpy as jnp

    victim = create_model("tiny", rng=jax.random.PRNGKey(0))
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3)))
    cfg = AdilConfig(eps=8 / 255, n_atoms=4, loss="ce", steps=2, batch_size=8)
    d, v, history = learn_dictionary_distributed(
        victim, ArrayDataset(images, np.zeros((16,), np.int32)), cfg,
        data_mesh(8),
    )
    # Cross-process-count comparison: reduction order differs between the
    # 2-proc and 1-proc meshes, so compare numerically (observed delta 1e-6).
    def parse(payload):
        fields = dict(p.split("=") for p in payload.replace(" OK", "").split(" "))
        return ([float(x) for x in fields["losses"].split(",")],
                float(fields["dsum"]))

    losses_2p, dsum_2p = parse(payload0)
    np.testing.assert_allclose(losses_2p, history["loss"], rtol=1e-4)
    np.testing.assert_allclose(dsum_2p, float(jnp.sum(jnp.abs(d))), rtol=1e-5)
