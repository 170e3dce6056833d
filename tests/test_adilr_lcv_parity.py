"""Trajectory parity of the ADILR prox solvers vs independent torch oracles.

Pins the supervised-ADILR inference solver (adil_regularized.py:508-628)
and the deterministic FB-splitting trainer (:31-197) against line-by-line
torch implementations of the reference algorithms, including the round-3
fidelity semantics: searches seeded at scale 1 (index_i=0); lcv's damped
candidate accepted only when it beats the full step with delta^index_i
step shrinkage (:600-610) and exhaustion keeping the delta^10 candidate
(:613-616); adil_fb's Lipschitz-estimated step (:127-130), its h term
using the STALE pre-step l1 against the last accepted candidate's
(:107/:155/:185), and acceptance assigning the damped candidate while
exhaustion keeps the full prox step (:143-146, :186-192).
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
    adil_fb,
    learn_coding_vectors,
)
from dl_attack_on_imagenet_tpu.models import create_model

K = 4
N = 8
LAM1 = 1e-3
LAM2 = 0.1


def _copy_to_torch(victim):
    """Mirror a tiny flax victim's weights into a TorchTiny (f32)."""
    p = jax.tree_util.tree_map(np.asarray, victim.variables["params"])
    tm = TorchTiny()
    with torch.no_grad():
        tm.conv1.weight.copy_(torch.from_numpy(np.float32(p["Conv_0"]["kernel"]).transpose(3, 2, 0, 1).copy()))
        tm.conv1.bias.copy_(torch.from_numpy(np.float32(p["Conv_0"]["bias"]).copy()))
        tm.conv2.weight.copy_(torch.from_numpy(np.float32(p["Conv_1"]["kernel"]).transpose(3, 2, 0, 1).copy()))
        tm.conv2.bias.copy_(torch.from_numpy(np.float32(p["Conv_1"]["bias"]).copy()))
        tm.fc.weight.copy_(torch.from_numpy(np.float32(p["Dense_0"]["kernel"]).T.copy()))
        tm.fc.bias.copy_(torch.from_numpy(np.float32(p["Dense_0"]["bias"]).copy()))
    tm.eval()
    return tm


@pytest.fixture(scope="module")
def setup():
    victim = create_model("tiny", rng=jax.random.PRNGKey(7))
    tm = _copy_to_torch(victim)
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


def _torch_constraint_dict(d):
    """constraint_dict 'l2ball' (utils.py:44-57), d in reference layout
    (C, H, W, K)."""
    out = d.clone()
    for k in range(d.shape[-1]):
        nrm = torch.linalg.norm(d[:, :, :, k])
        out[:, :, :, k] = d[:, :, :, k] / torch.clamp(nrm, min=1.0)
    return out


def torch_adil_fb(tm, x, d0, niter, step_size, lam1=LAM1, lam2=LAM2):
    """Reference adil, untargeted, full batch (adil_regularized.py:31-197),
    reproduced verbatim in torch.  Returns (d, v, loss_all) with d in the
    reference's (C, H, W, K) layout.

    Runs in float64: the line-search accept decisions have margins ~1e-5 on
    a loss of magnitude ~16, i.e. at f32's noise floor, so two correct f32
    implementations can fork to different damping indices; f64 makes the
    branch sequence deterministic across frameworks.
    """
    import copy

    tm = copy.deepcopy(tm).double()
    delta, gamma, beta = 0.5, 1.0, 0.5
    lipschitz = torch.tensor(0.9 / step_size, dtype=torch.float64)
    coeff = -1.0
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).double()
    with torch.no_grad():
        labels = tm(xt).argmax(-1)

    d = _torch_constraint_dict(
        torch.from_numpy(d0.transpose(3, 1, 2, 0).copy()).double()
    )
    v = torch.zeros(x.shape[0], d0.shape[0], dtype=torch.float64)

    def smooth(vv, dd):
        dv = torch.tensordot(vv, dd, dims=([1], [3]))
        logits = tm(xt + dv)
        return (
            coeff * F.cross_entropy(logits, labels, reduction="sum")
            + 0.5 * lam2 * (dv**2).sum()
        )

    d_old = torch.zeros_like(d)
    v_old = torch.zeros_like(v)
    grad_v_old = torch.zeros_like(v)
    grad_d_old = torch.zeros_like(d)
    loss_all = np.full(int(niter), np.nan)
    loss_non_smooth_old = 0.0
    flag_stop = False
    for iteration in range(int(niter)):
        if flag_stop:
            continue
        vg = v.detach().clone().requires_grad_(True)
        dg = d.detach().clone().requires_grad_(True)
        loss_non_smooth = lam1 * vg.detach().abs().sum()
        loss_smooth = smooth(vg, dg)
        loss_full = loss_smooth + loss_non_smooth
        loss_smooth.backward()
        grad_v, grad_d = vg.grad.data, dg.grad.data
        with torch.no_grad():
            if iteration > 1:
                lipschitz = torch.sqrt(
                    torch.linalg.norm(grad_v - grad_v_old) ** 2
                    + torch.linalg.norm(grad_d - grad_d_old) ** 2
                ) / torch.sqrt(
                    torch.linalg.norm(v - v_old) ** 2
                    + torch.linalg.norm(d - d_old) ** 2
                )
            d_old.copy_(d)
            v_old.copy_(v)
            grad_v_old.copy_(grad_v)
            grad_d_old.copy_(grad_d)
            loss_old = float(loss_full)
            step = 0.9 / lipschitz
            v = F.softshrink(v - step * grad_v, float(step * lam1))
            d = _torch_constraint_dict(d - step * grad_d)
            d_v, d_d = v - v_old, d - d_old
            h = float(
                (d_d * grad_d).sum()
                + (d_v * grad_v).sum()
                + 0.5
                * (gamma / step)
                * (torch.linalg.norm(d_d) ** 2 + torch.linalg.norm(v_old - v) ** 2)
                + loss_non_smooth
                - loss_non_smooth_old
            )
            flag, index_i = False, 0
            while not flag:
                new_v = v_old + (delta**index_i) * d_v
                new_d = d_old + (delta**index_i) * d_d
                loss_non_smooth = lam1 * new_v.abs().sum()
                loss_full = float(smooth(new_v, new_d) + loss_non_smooth)
                crit = loss_old + beta * (delta**index_i) * h
                if loss_full <= crit:
                    v, d = new_v, new_d
                    flag = True
                    loss_non_smooth_old = float(loss_non_smooth)
                else:
                    index_i += 1
                    if index_i > 50:
                        flag_stop = True
                        flag = True
            loss_all[iteration] = loss_full
    return d.numpy(), v.numpy(), loss_all


@pytest.mark.parametrize("step_size", [0.1, 30.0])
def test_adil_fb_trajectory_matches_torch(setup, step_size):
    """step 0.1 (the reference default) follows the immediate-accept path
    until the Lipschitz estimate takes over at iteration 2; 30.0 forces
    damped line-search iterations.  Both sides run in f64 (the accept
    margins sit at f32's noise floor — see torch_adil_fb)."""
    victim, tm, x, d0 = setup
    cfg = RegularizedConfig(
        n_atoms=K, lambda_l1=LAM1, lambda_l2=LAM2, targeted=False,
        step_size=step_size,
    )
    with jax.enable_x64(True):
        # Same weights as the f32 victim (f32 values are exact in f64, and
        # torch's .double() upcasts them identically), but a module whose
        # internal dtype is f64 so the forward really runs in f64.
        vars64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), victim.variables
        )
        victim64 = create_model("tiny", dtype=jnp.float64, variables=vars64)
        x64 = jnp.asarray(x, jnp.float64)
        labels = jnp.argmax(victim64.apply_fn(vars64, x64), -1)
        d, v, track = adil_fb(
            victim64.apply_fn, vars64, x64, labels, cfg,
            key=jax.random.PRNGKey(0), niter=6,
            d_init=jnp.asarray(d0, jnp.float64),
        )
        d, v, track = np.asarray(d), np.asarray(v), np.asarray(track)
    d_ref, v_ref, track_ref = torch_adil_fb(tm, x, d0, niter=6,
                                            step_size=step_size)
    assert np.any(v_ref != 0)
    # Residual drift is ~5e-8 (f64 reduction-order noise through the
    # Lipschitz ratio); a line-search branch fork would show up as ~1e-2.
    np.testing.assert_allclose(v, v_ref, atol=1e-6)
    np.testing.assert_allclose(d.transpose(3, 1, 2, 0), d_ref, atol=1e-6)
    valid = ~np.isnan(track_ref)
    np.testing.assert_allclose(
        track[valid], track_ref[valid], rtol=1e-9, atol=1e-6
    )


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
