"""Sharding-aware DP checkpointing (VERDICT round-2 missing #5).

The msgpack DP checkpoint gathers sharded state to one host — impossible on
a multi-controller DCN mesh. ``ckpt_sharded`` routes through the orbax
collective save/restore (ArtifactCache.save_sharded), which keeps leaves as
sharded ``jax.Array``s. Proven two ways:

1. single-process 8-device mesh, ``ckpt_sharded=True``: kill-and-resume
   reproduces the uninterrupted trajectory (mirror of
   test_checkpoint_resume.py::test_mesh_resume_matches_uninterrupted);
2. REAL two-process ``jax.distributed`` mesh: a crashed run leaves a valid
   collective checkpoint, the rerun resumes from it, and the final
   dictionary matches an uninterrupted 2-process run.

Reference analog: rank-0 ``torch.save`` of the DDP dictionary
(adil.py:427-428) — which drops optimizer state; here everything
round-trips.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.parallel import adil_dp, data_mesh
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


class Boom(Exception):
    pass


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def dataset():
    key = jax.random.PRNGKey(3)
    images = np.asarray(jax.random.uniform(key, (16, 32, 32, 3)))
    return ArrayDataset(images, np.zeros((16,), np.int64))


def test_sharded_ckpt_resume_matches_uninterrupted(
    victim, dataset, tmp_path, monkeypatch
):
    mesh = data_mesh(8)
    cfg = AdilConfig(eps=8 / 255, n_atoms=4, loss="ce", steps=4, batch_size=16)

    def run(cache):
        return adil_dp.learn_dictionary_distributed(
            victim, dataset, cfg, mesh, seed=0, cache=cache,
            checkpoint_every=1, ckpt_sharded=True,
            ckpt_key={"model": "shrt", "kind": "dp_train_state"},
        )

    d_ref, v_ref, hist_ref = run(ArtifactCache(str(tmp_path / "a")))
    assert len(hist_ref["loss"]) == 4

    # Simulated kill: crash right after the 2nd collective checkpoint.
    real_save = adil_dp._ckpt_save_sharded
    calls = {"n": 0}

    def crashing_save(*args, **kwargs):
        real_save(*args, **kwargs)
        calls["n"] += 1
        if calls["n"] == 2:
            raise Boom()

    cache_b = ArtifactCache(str(tmp_path / "b"))
    monkeypatch.setattr(adil_dp, "_ckpt_save_sharded", crashing_save)
    with pytest.raises(Boom):
        run(cache_b)
    monkeypatch.setattr(adil_dp, "_ckpt_save_sharded", real_save)
    assert cache_b.exists_sharded("ImageNet", model="shrt", kind="dp_train_state")

    d_res, v_res, hist_res = run(cache_b)
    assert len(hist_res["loss"]) == 4
    assert not cache_b.exists_sharded(
        "ImageNet", model="shrt", kind="dp_train_state"
    )
    np.testing.assert_allclose(np.asarray(d_res), np.asarray(d_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_res), np.asarray(v_ref), atol=1e-6)
    np.testing.assert_allclose(hist_res["loss"], hist_ref["loss"], rtol=1e-5)


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
from dl_attack_on_imagenet_tpu.parallel import adil_dp, data_mesh
from dl_attack_on_imagenet_tpu.utils import ArtifactCache

mode = os.environ["CKPT_MODE"]  # straight | crash | resume
cache = ArtifactCache(os.environ["CKPT_DIR"])

if mode == "crash":
    real_save = adil_dp._ckpt_save_sharded
    calls = {"n": 0}

    def crashing_save(*args, **kwargs):
        real_save(*args, **kwargs)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated kill")

    adil_dp._ckpt_save_sharded = crashing_save

victim = create_model("tiny", rng=jax.random.PRNGKey(0))
images = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3)))
cfg = AdilConfig(eps=8 / 255, n_atoms=4, loss="ce", steps=4, batch_size=8)

mesh = data_mesh(8)
d, v, history = adil_dp.learn_dictionary_distributed(
    victim, ArrayDataset(images, np.zeros((16,), np.int32)), cfg, mesh,
    seed=0, cache=cache, checkpoint_every=1,
    ckpt_key={"model": "dp2", "kind": "dp_train_state"},
)
losses = ",".join(f"{x:.6f}" for x in history["loss"])
print(f"proc {env.process_id}: losses={losses} "
      f"dsum={float(jnp.sum(jnp.abs(d))):.6f} OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_pair(repo, ckpt_dir, mode):
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
            CKPT_MODE=mode,
            CKPT_DIR=str(ckpt_dir),
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
    return outs


def test_two_process_kill_and_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # Uninterrupted 2-process run -> reference dictionary.
    outs = _spawn_pair(repo, tmp_path / "ref", "straight")
    for rc, out, err in outs:
        assert rc == 0, f"straight worker failed:\n{err[-4000:]}"
    ref_line = next(
        l for l in outs[0][1].splitlines() if l.endswith("OK")
    ).split(": ", 1)[1]

    # Crashed run: both processes die after the 2nd collective checkpoint,
    # which must remain on disk (sharded, from both hosts).
    outs = _spawn_pair(repo, tmp_path / "work", "crash")
    assert all(rc != 0 for rc, _, _ in outs), [o[0] for o in outs]
    cache = ArtifactCache(str(tmp_path / "work"))
    assert cache.exists_sharded("ImageNet", model="dp2", kind="dp_train_state")

    # Resumed run completes all 4 epochs and matches the reference.
    outs = _spawn_pair(repo, tmp_path / "work", "resume")
    for rc, out, err in outs:
        assert rc == 0, f"resume worker failed:\n{err[-4000:]}"
    res_lines = [
        next(l for l in out.splitlines() if l.endswith("OK")).split(": ", 1)[1]
        for _, out, _ in outs
    ]
    assert res_lines[0] == res_lines[1]

    def parse(payload):
        fields = dict(p.split("=") for p in payload.replace(" OK", "").split(" "))
        return ([float(x) for x in fields["losses"].split(",")],
                float(fields["dsum"]))

    losses_ref, dsum_ref = parse(ref_line)
    losses_res, dsum_res = parse(res_lines[0])
    assert len(losses_res) == 4
    # Same process topology -> same reduction order; checkpoint round-trip
    # is exact up to float32 curve storage.
    np.testing.assert_allclose(losses_res, losses_ref, rtol=1e-5)
    np.testing.assert_allclose(dsum_res, dsum_ref, rtol=1e-6)
    assert not cache.exists_sharded("ImageNet", model="dp2", kind="dp_train_state")
