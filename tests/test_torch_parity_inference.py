"""Cross-framework parity for the DDrague z-space inference solver.

Same dictionary, images, and victim weights: our jitted
``supervised_ddrague`` (adil_core.py) must produce the same adversaries as
an independent torch implementation of the same math (AdamW on an
image-shaped z, codes via the dictionary pseudo-inverse, z clamped to
[-eps, eps], final pixel clip — reference semantics of adil.py:508-567,
written here from the math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from dl_attack_on_imagenet_tpu.attacks import AdilConfig
from dl_attack_on_imagenet_tpu.attacks import adil_core as core
from dl_attack_on_imagenet_tpu.models import create_model
from tests.test_torch_parity import TorchTiny

EPS = 8 / 255
K = 4
N = 6
STEPS = 8


@pytest.fixture(scope="module")
def setup():
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    p = jax.tree_util.tree_map(np.asarray, victim.variables["params"])
    tm = TorchTiny()
    with torch.no_grad():
        tm.conv1.weight.copy_(torch.from_numpy(p["Conv_0"]["kernel"].transpose(3, 2, 0, 1).copy()))
        tm.conv1.bias.copy_(torch.from_numpy(p["Conv_0"]["bias"].copy()))
        tm.conv2.weight.copy_(torch.from_numpy(p["Conv_1"]["kernel"].transpose(3, 2, 0, 1).copy()))
        tm.conv2.bias.copy_(torch.from_numpy(p["Conv_1"]["bias"].copy()))
        tm.fc.weight.copy_(torch.from_numpy(p["Dense_0"]["kernel"].T.copy()))
        tm.fc.bias.copy_(torch.from_numpy(p["Dense_0"]["bias"].copy()))
    tm.eval()
    rng = np.random.default_rng(1)
    x = rng.random((N, 32, 32, 3), dtype=np.float32)
    d = (rng.random((K, 32, 32, 3), dtype=np.float32) * 2 - 1)
    return victim, tm, x, d


def test_ddrague_trajectory_parity(setup):
    victim, tm, x, d = setup
    cfg = AdilConfig(eps=EPS, norm="linf", n_atoms=K, loss="ce",
                     steps_inference=STEPS, tol=0.0)  # tol=0: run all steps

    ours = np.asarray(
        core.supervised_ddrague(
            victim.apply_fn, victim.variables, jnp.asarray(d), jnp.asarray(x), cfg
        )
    )

    # torch twin (dictionary layout (K, C, H, W))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    dt = torch.from_numpy(d.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        labels = tm(xt).argmax(-1)
        d_flat = dt.reshape(K, -1)
        gram = d_flat @ d_flat.T
        d_pinv = torch.linalg.solve(gram, d_flat)  # (K, M)

    z = torch.zeros_like(xt, requires_grad=True)
    optim = torch.optim.AdamW([z], lr=1e-2)
    for _ in range(STEPS):
        optim.zero_grad()
        v = z.reshape(N, -1) @ d_pinv.T
        dv = (v @ d_flat).reshape(N, 3, 32, 32)
        logits = tm(xt + dv)
        loss = -F.cross_entropy(logits, labels, reduction="mean")
        loss.backward()
        optim.step()
        with torch.no_grad():
            z.clamp_(-EPS, EPS)
    with torch.no_grad():
        v = z.reshape(N, -1) @ d_pinv.T
        dv = (v @ d_flat).reshape(N, 3, 32, 32)
        theirs = torch.clamp(xt + dv, 0, 1).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, theirs, atol=5e-5)
    # and the perturbation is actually nonzero (the solver moved)
    assert np.abs(ours - np.clip(x, 0, 1)).max() > 1e-4
