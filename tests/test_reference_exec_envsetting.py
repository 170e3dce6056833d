"""Executed-reference parity: env_setting.py (the distributed runtime's
rendezvous layer — the last reference lines not yet executed outside the
CUDA training loops themselves).

``dist_init``'s collective call hardcodes 'nccl' (env_setting.py:27), so
the process-group init itself needs CUDA — but everything AROUND it is
plain Python and now executes: the import-time SLURM topology parse
(:10-16), the rendezvous address construction, and the default-port rule.
The repo's counterpart is ``parallel.dist.distributed_env`` /
``expand_first_host`` (lazy, assumption-free — dist.py docstring).

Executed findings pinned here:
  * the default port is ``12345 + int(min(gpu_ids))`` where ``gpu_ids``
    are STRINGS (:12/:25) — a LEXICOGRAPHIC min, so gpus '9,10' yield
    port 12355 (min '10'), not 12354 (min 9). The repo replaces the rule
    with a fixed overridable port (dist.py:31-34) and is unaffected.
  * the default-port expression is evaluated AT IMPORT — an empty/absent
    SLURM_STEP_GPUS makes the module unimportable, part of the SURVEY
    §2.4 import-crash defect the repo's lazy discovery fixes.
  * dist_init executed with the collective call intercepted builds
    ``tcp://<first host>:<port>``; with the real call it raises on a
    CUDA-less host (the nccl line, executed to the defect).
"""

import importlib
import os
import sys

import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "tests") if "tests" not in sys.path else None
import _ref_exec
from _ref_exec import REF_ROOT, _install_stubs

from dl_attack_on_imagenet_tpu.parallel.dist import (
    distributed_env,
    expand_first_host,
)

SLURM = {
    "SLURM_JOB_NODELIST": "node[003-005],other7",
    "SLURM_STEP_GPUS": "9,10",
    "SLURM_NTASKS": "4",
    "SLURM_JOB_NUM_NODES": "2",
    "SLURM_PROCID": "1",
    "SLURM_LOCALID": "1",
}


@pytest.fixture()
def fresh_env_setting(monkeypatch):
    """Import env_setting FRESH under a controlled SLURM env (its globals
    and dist_init's default port bind at import, :10-25), restoring the
    previously-imported module object afterwards."""
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    for k, v in SLURM.items():
        monkeypatch.setenv(k, v)
    saved = sys.modules.pop("env_setting", None)
    mod = importlib.import_module("env_setting")
    yield mod
    sys.modules.pop("env_setting", None)
    if saved is not None:
        sys.modules["env_setting"] = saved


def test_topology_parse_exec(fresh_env_setting, monkeypatch):
    es = fresh_env_setting
    assert es.IP == "node003"  # hostnames[0] through real bracket expansion
    assert es.world_size == 4 and es.rank == 1 and es.local_rank == 1
    assert es.gpu_ids == ["9", "10"]

    # repo discovery on the same env: same head host, same process counts
    for k, v in SLURM.items():
        monkeypatch.setenv(k, v)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    env = distributed_env()
    assert expand_first_host(SLURM["SLURM_JOB_NODELIST"]) == "node003"
    assert env.coordinator == "node003:12345"
    assert env.num_processes == 4 and env.process_id == 1


def test_dist_init_address_and_string_min_port_exec(fresh_env_setting,
                                                   monkeypatch):
    es = fresh_env_setting
    captured = {}

    def fake_init(backend, init_method=None, rank=None, world_size=None):
        captured.update(backend=backend, init_method=init_method,
                        rank=rank, world_size=world_size)

    monkeypatch.setattr(es.dist, "init_process_group", fake_init)
    monkeypatch.setattr(es.dist, "is_initialized", lambda: True)
    es.dist_init(rank=1, world_size=4)
    # lexicographic min of ['9', '10'] is '10' -> 12345 + 10, NOT 12345 + 9
    assert captured == {
        "backend": "nccl",
        "init_method": "tcp://node003:12355",
        "rank": 1,
        "world_size": 4,
    }


def test_dist_init_nccl_unavailable_defect(fresh_env_setting):
    """The :27 line hardcodes the 'nccl' backend, which this torch build
    does not provide — dist_init cannot complete on a CUDA-less host.
    (Letting the real call run would first block ~30 min in the TCPStore
    rendezvous against the nonexistent SLURM head node before the backend
    check, so the backend availability is asserted directly; the address
    construction itself is executed in the interception test above.)"""
    assert not torch.distributed.is_nccl_available()


def test_import_crashes_without_gpu_env(monkeypatch):
    """:25's default-port expression runs at import — SLURM_STEP_GPUS=''
    makes the module unimportable (the §2.4 import-crash family)."""
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    for k, v in SLURM.items():
        monkeypatch.setenv(k, v)
    monkeypatch.setenv("SLURM_STEP_GPUS", "")
    saved = sys.modules.pop("env_setting", None)
    try:
        with pytest.raises(ValueError):  # int('') in the default-port expr
            importlib.import_module("env_setting")
    finally:
        sys.modules.pop("env_setting", None)
        if saved is not None:
            sys.modules["env_setting"] = saved
