"""Trajectory parity of adilr_adamw vs an independent torch implementation.

The reference ADILR's *executed* ``learn_dictionary``
(adil_regularized.py:722-815) is un-runnable as written (call-site/signature
mismatch :691 vs :722, missing attrs) — the repo implements its documented
intent as ``adilr_adamw`` (VERDICT round 2, "Next round" #4). This file
pins that fixed algorithm against an independent PyTorch implementation:
joint AdamW(D, v) (torch defaults incl. weight_decay=0.01), loss
``coeff*CE_sum + 0.5*λ₂‖Dv‖²`` (or CW f_loss + same), per-atom l2-ball
projection of D only after each step.
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
    adilr_adamw,
)
from dl_attack_on_imagenet_tpu.models import create_model

K = 4
N = 8
LR = 0.01
LAM2 = 0.5


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
    rng = np.random.default_rng(3)
    x = rng.random((N, 32, 32, 3), dtype=np.float32)
    d0 = rng.random((K, 32, 32, 3), dtype=np.float32) * 2 - 1
    v0 = rng.random((N, K), dtype=np.float32) * 0.1
    return victim, tm, x, d0, v0


def _torch_run(tm, x, d0, v0, epochs, loss_mode, kappa=5.0, coeff=-1.0):
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        labels = tm(xt).argmax(-1)
    d_t = torch.from_numpy(d0.transpose(0, 3, 1, 2).copy()).requires_grad_(True)
    v_t = torch.from_numpy(v0.copy()).requires_grad_(True)
    optim = torch.optim.AdamW([d_t, v_t], lr=LR)  # weight_decay default 0.01
    losses = []
    for _ in range(epochs):
        optim.zero_grad()
        dv = torch.einsum("nk,kchw->nchw", v_t, d_t)
        logits = tm(xt + dv)
        if loss_mode == "ce":
            smooth = coeff * F.cross_entropy(logits, labels, reduction="sum")
        else:
            # Reference f_loss (adil_regularized.py:711-720): the runner-up
            # is max((1-one_hot)*logits) — zero-floored by the true-class slot.
            one_hot = F.one_hot(labels, logits.shape[-1]).to(logits.dtype)
            true_logit = (one_hot * logits).sum(-1)
            other = ((1 - one_hot) * logits).max(-1).values
            smooth = torch.clamp(true_logit - other, min=-kappa).sum()
        loss = smooth + 0.5 * LAM2 * (dv**2).sum()
        loss.backward()
        optim.step()
        with torch.no_grad():
            # update_d only (adil_regularized.py:797): per-atom l2 ball.
            nrm = d_t.reshape(K, -1).norm(dim=1).clamp(min=1.0)
            d_t.div_(nrm.view(K, 1, 1, 1))
        losses.append(float(loss.detach()) / N)
    return d_t.detach().numpy(), v_t.detach().numpy(), losses


@pytest.mark.parametrize("loss_mode", ["ce", "logits"])
def test_adilr_adamw_trajectory_matches_torch(setup, loss_mode):
    victim, tm, x, d0, v0 = setup
    cfg = RegularizedConfig(
        n_atoms=K, steps=5, step_size=LR, batch_size=N, targeted=False,
        lambda_l2=LAM2, loss=loss_mode, kappa=5.0, dict_set="l2ball",
    )
    d, v, losses, fooling, _ = adilr_adamw(
        victim.apply_fn, victim.variables, jnp.asarray(x), cfg,
        jax.random.PRNGKey(0), nepochs=5, shuffle=False,
        d_init=jnp.asarray(d0), v_init=jnp.asarray(v0), tol=0.0,
    )
    d_ref, v_ref, losses_ref = _torch_run(tm, x, d0, v0, 5, loss_mode)
    np.testing.assert_allclose(losses, losses_ref, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(d), d_ref.transpose(0, 2, 3, 1), atol=5e-4
    )


def test_adilr_adamw_minibatch_trajectory_matches_torch(setup):
    # batch-size-2 path: the scan's gather/scatter over v rows and the
    # per-batch AdamW+projection interleaving must match a torch loop that
    # walks the same fixed batch order.
    victim, tm, x, d0, v0 = setup
    bsz = 4
    cfg = RegularizedConfig(
        n_atoms=K, steps=3, step_size=LR, batch_size=bsz, targeted=False,
        lambda_l2=LAM2, loss="ce", dict_set="l2ball",
    )
    d, v, losses, _, _ = adilr_adamw(
        victim.apply_fn, victim.variables, jnp.asarray(x), cfg,
        jax.random.PRNGKey(0), nepochs=3, shuffle=False,
        d_init=jnp.asarray(d0), v_init=jnp.asarray(v0), tol=0.0,
    )

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        labels = tm(xt).argmax(-1)
    d_t = torch.from_numpy(d0.transpose(0, 3, 1, 2).copy()).requires_grad_(True)
    v_t = torch.from_numpy(v0.copy()).requires_grad_(True)
    optim = torch.optim.AdamW([d_t, v_t], lr=LR)
    t_losses = []
    for _ in range(3):
        total = 0.0
        for s in range(0, N, bsz):
            optim.zero_grad()
            dv = torch.einsum("nk,kchw->nchw", v_t[s : s + bsz], d_t)
            logits = tm(xt[s : s + bsz] + dv)
            loss = -F.cross_entropy(logits, labels[s : s + bsz], reduction="sum")
            loss = loss + 0.5 * LAM2 * (dv**2).sum()
            loss.backward()
            optim.step()
            with torch.no_grad():
                nrm = d_t.reshape(K, -1).norm(dim=1).clamp(min=1.0)
                d_t.div_(nrm.view(K, 1, 1, 1))
            total += float(loss.detach())
        t_losses.append(total / N)
    np.testing.assert_allclose(losses, t_losses, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), v_t.detach().numpy(), atol=5e-4)


def test_adilr_class_adamw_version(setup, tmp_path):
    # End-to-end through the ADILR class: version='adamw' trains, persists,
    # and serves unsupervised inference from the fitted Laplace.
    victim, _, x, _, _ = setup
    from dl_attack_on_imagenet_tpu.attacks import ADILR
    from dl_attack_on_imagenet_tpu.utils import ArtifactCache

    labels = np.asarray(victim.predict(jnp.asarray(x)))
    atk = ADILR(
        victim, steps=2, n_atoms=K, batch_size=4, targeted=False,
        version="adamw", attack="unsupervised", attack_conditioned="atoms",
        data_train=(x, labels), data_val=(x[:4], labels[:4]),
        cache=ArtifactCache(tmp_path), trials=3,
    )
    assert atk.is_trained
    assert len(atk.val_fools) == 2
    adv = atk(jnp.asarray(x[:4]), jnp.asarray(labels[:4]))
    assert adv.shape == (4, 32, 32, 3)
    assert np.all(np.asarray(adv) >= 0) and np.all(np.asarray(adv) <= 1)
