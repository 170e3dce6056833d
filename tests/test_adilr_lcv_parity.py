"""Trajectory parity of learn_coding_vectors vs an independent torch oracle.

Pins the supervised-ADILR inference solver (adil_regularized.py:508-628)
against a line-by-line torch implementation of the reference algorithm,
including the round-3 fidelity semantics: search seeded at scale 1
(index_i=0, :585), damped candidate accepted only when it beats the full
step with step_size shrunk by delta^index_i (:600-610), and exhaustion
(index_i > 10) keeping the delta^10-damped candidate and its loss
(:613-616) with no step shrink.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from test_torch_parity import TorchTiny

from dl_attack_on_imagenet_tpu.attacks.adil_regularized import (
    RegularizedConfig,
    learn_coding_vectors,
)
from dl_attack_on_imagenet_tpu.models import create_model

K = 4
N = 8
LAM1 = 1e-3
LAM2 = 0.1


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
    rng = np.random.default_rng(5)
    x = rng.random((N, 32, 32, 3), dtype=np.float32)
    d0 = (rng.random((K, 32, 32, 3), dtype=np.float32) * 2 - 1) * 0.1
    return victim, tm, x, d0


def torch_lcv(tm, x, d0, niter, step_size, tol=1e-6):
    """Reference learn_coding_vectors, untargeted, full batch
    (adil_regularized.py:508-628), reproduced verbatim in torch."""
    delta, gamma, beta = 0.9, 1.0, 0.5
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        labels = tm(xt).argmax(-1)
    d_t = torch.from_numpy(d0.transpose(0, 3, 1, 2).copy())
    v = torch.zeros(x.shape[0], d0.shape[0])

    def smooth(vv):
        dv = torch.einsum("nk,kchw->nchw", vv, d_t)
        logits = tm(xt + dv)
        return (
            -F.cross_entropy(logits, labels, reduction="sum")
            + 0.5 * LAM2 * (dv**2).sum()
        )

    loss_all = [float("nan")]
    step = float(step_size)
    for _ in range(int(niter)):
        vg = v.detach().clone().requires_grad_(True)
        ls = smooth(vg)
        loss_old = float(ls.detach() + LAM1 * vg.detach().abs().sum())
        ls.backward()
        g = vg.grad
        with torch.no_grad():
            v_old = v.clone()
            v = F.softshrink(v - step * g, step * LAM1)
            d_v = v - v_old
            h = float(
                (d_v * g).sum()
                + 0.5 * (gamma / step) * (d_v**2).sum()
                + LAM1 * v.abs().sum()
                - LAM1 * v_old.abs().sum()
            )
            flag, i, loss_cur = False, 0, None
            while not flag:
                new_v = v_old + (delta**i) * d_v
                loss_full = float(smooth(new_v) + LAM1 * new_v.abs().sum())
                if i == 0:
                    loss_cur = loss_full
                crit = loss_old + beta * (delta**i) * h
                if loss_full <= crit:
                    if loss_cur > loss_full:
                        v = new_v
                        step = step * (delta**i)
                        loss_all.append(loss_full)
                    else:
                        loss_all.append(loss_cur)
                    flag = True
                else:
                    i += 1
                    if i > 10:
                        v = new_v
                        loss_all.append(loss_full)
                        flag = True
        if loss_all[-2] - loss_all[-1] < tol:
            break
    return v.numpy()


@pytest.mark.parametrize("step_size", [1.0, 100.0])
def test_lcv_trajectory_matches_torch(setup, step_size):
    """step 1.0 follows the immediate-accept path; 100.0 (the reference
    default) exercises the damped-accept branch with step shrinkage."""
    victim, tm, x, d0 = setup
    cfg = RegularizedConfig(
        n_atoms=K, lambda_l1=LAM1, lambda_l2=LAM2, targeted=False,
    )
    labels = victim.predict(jnp.asarray(x))
    v = learn_coding_vectors(
        victim.apply_fn, victim.variables, jnp.asarray(d0), jnp.asarray(x),
        labels, cfg, niter=5, step_size=step_size,
    )
    v_ref = torch_lcv(tm, x, d0, niter=5, step_size=step_size)
    assert np.any(v_ref != 0)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=2e-3)
