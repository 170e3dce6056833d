"""UAP-PGD: universal adversarial perturbation via clipped-CE PGD.

[Shafahi et al., 2020]-style: one shared perturbation ``e`` trained with
Adam/SGD on the clipped negative cross-entropy, projected onto the eps ball
after every step.

Reference: /root/reference/attacks/attacks_classes/uappgd.py. Unlike ADiL,
UAP-PGD optimizes against the TRUE labels (uappgd.py:92-98), not re-labeled
predictions. The reference's DDP variant (uappgd.py:109-163) maps to a
``shard_map`` epoch with the batch axis sharded and ``e``'s gradient
psum-reduced; its module bugs (non-returning forward, clamp-without-tensor,
mp.spawn arg mismatch — SURVEY.md §2.4) have no counterpart here.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data import as_array_dataset
from ..models import VictimModel
from ..ops import clamp_image, l2_ball_project, linf_clamp
from ..utils import ArtifactCache
from .base import Attack
from .adil_core import make_batches


def project_uap(e: jax.Array, eps: float, norm: str) -> jax.Array:
    """Project the universal perturbation onto its budget ball.

    Reference: uappgd.py:60-68.
    """
    if norm == "l2":
        return l2_ball_project(e, eps, axis=None)
    return linf_clamp(e, eps)


@partial(jax.jit, static_argnames=("norm",))
def fold_increments(attack, deltas, accept, eps, norm: str):
    """Sequentially fold accepted per-image increments into a universal
    perturbation, projecting after every fold.

    Matches the FastUAP/universal_pert accumulation order (fast_uap.py:91,
    universal_pert.py:82: ``v = proj(v + dr)`` per accepted image) so a
    chunk-batched gate+DeepFool pass can keep the reference's
    fold-then-project-between-images semantics. ``eps`` may be inf (FastUAP
    default) — both projections are no-ops then.
    """
    def body(a, da):
        d, m = da
        return project_uap(a + m * d, eps, norm), None

    a, _ = jax.lax.scan(body, attack, (deltas, accept.astype(attack.dtype)))
    return a


def uap_loss(apply_fn, variables, e, x, y, mask, beta: float):
    """Clipped negative-CE, mean over real rows (uappgd.py:97-98), plus the
    batch fooling count vs the true labels."""
    logits = apply_fn(variables, x + e).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
    ce = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.maximum(-ce, -beta)
    fooling = jnp.sum((jnp.argmax(logits, -1) != y) * mask)
    return loss, fooling


def _make_optimizer(optimizer: str, step_size: float):
    if optimizer == "sgd":
        return optax.sgd(step_size)
    return optax.adam(step_size)


@functools.lru_cache(maxsize=None)
def _uap_epoch_cache(apply_fn, optimizer: str, step_size: float, norm: str,
                     mesh, axis: str):
    """Jitted UAP-PGD epoch shared across UAPPGD instances.

    Victim variables and the beta/eps hypers are traced arguments, so
    repeated instances (a hyper sweep, or the reference driver constructing
    one attack per victim/eps combo, demo_dL_attack.py:71-90) reuse ONE
    trace+compile per (victim, optimizer, step, norm) — the per-instance
    re-trace was ~15 s wall against an 86 ms epoch (BENCHMARKS.md round 3).
    Same pattern as adil.py::_solver_cache / adil_core.py::_swept_epoch_cache.
    """
    opt = _make_optimizer(optimizer, step_size)

    def epoch_body(e, opt_state, variables, images, labels, batches, beta, eps):
        def body(carry, batch_idx):
            e, opt_state = carry
            mask = (batch_idx >= 0).astype(jnp.float32)
            idx = jnp.maximum(batch_idx, 0)
            x, y = images[idx], labels[idx]

            (loss, fooling), g = jax.value_and_grad(
                lambda e_: uap_loss(apply_fn, variables, e_, x, y, mask, beta),
                has_aux=True,
            )(e)
            if mesh is not None:
                # DDP all-reduce AVERAGES gradients (the reference wraps the
                # perturbation in DistributedDataParallel, uappgd.py:128-149),
                # and the loss is a per-device batch mean — pmean keeps the
                # effective step size identical to the serial path.
                g = jax.lax.pmean(g, axis)
                loss = jax.lax.pmean(loss, axis)
                fooling = jax.lax.psum(fooling, axis)
            updates, opt_state = opt.update(g, opt_state, e)
            e = project_uap(optax.apply_updates(e, updates), eps, norm)
            return (e, opt_state), (loss, fooling)

        (e, opt_state), (losses, fools) = jax.lax.scan(
            body, (e, opt_state), batches
        )
        return e, opt_state, jnp.sum(losses), jnp.sum(fools)

    if mesh is None:
        return jax.jit(epoch_body)

    def run(e, opt_state, variables, images, labels, batches, beta, eps):
        # batches: (n_dev, nb, B_local) -> local (1, nb, B)
        def shard_body(e, opt_state, variables, images, labels, batches,
                       beta, eps):
            return epoch_body(e, opt_state, variables, images, labels,
                              batches[0], beta, eps)

        fn = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        return fn(e, opt_state, variables, images, labels, batches, beta, eps)

    return jax.jit(run)


def make_uap_epoch_fn(apply_fn, cfg: "UAPPGD", mesh=None, axis: str = "data"):
    """One epoch over resident (images, labels) as a jitted scan.

    With ``mesh`` set, the scan runs under shard_map with rows sharded and
    e's gradient psum-reduced (the DDP all-reduce, uappgd.py:128/:151-154).
    The underlying compile is shared across instances via
    :func:`_uap_epoch_cache`.
    """
    run = _uap_epoch_cache(apply_fn, cfg.optimizer, float(cfg.step_size),
                           cfg.norm, mesh, axis)
    variables, beta, eps = cfg._vars, cfg.beta, cfg.eps

    def epoch_fn(e, opt_state, images, labels, batches):
        return run(e, opt_state, variables, images, labels, batches, beta, eps)

    return epoch_fn


@functools.lru_cache(maxsize=None)
def _uap_presliced_cache(apply_fn, optimizer: str, step_size: float, norm: str):
    opt = _make_optimizer(optimizer, step_size)

    @jax.jit
    def run(e, opt_state, variables, xs, ys, idx_b, beta, eps):
        def body(carry, batch):
            e, opt_state = carry
            x, y, batch_idx = batch
            mask = (batch_idx >= 0).astype(jnp.float32)
            (loss, fooling), g = jax.value_and_grad(
                lambda e_: uap_loss(apply_fn, variables, e_, x, y, mask, beta),
                has_aux=True,
            )(e)
            updates, opt_state = opt.update(g, opt_state, e)
            e = project_uap(optax.apply_updates(e, updates), eps, norm)
            return (e, opt_state), (loss, fooling)

        (e, opt_state), (losses, fools) = jax.lax.scan(
            body, (e, opt_state), (xs, ys, idx_b)
        )
        return e, opt_state, jnp.sum(losses), jnp.sum(fools)

    return run


def make_uap_epoch_fn_presliced(apply_fn, cfg: "UAPPGD"):
    """Serial epoch over pre-sliced batches — no in-scan gather.

    Takes (xs, ys, idx_b) from :func:`adil_core.preslice_epoch`: the scan
    slices actual batch tensors off the leading axis instead of gathering
    rows from the resident dataset every step (the same win as ADiL's
    pre-sliced epochs, tests/test_train_scan.py). Math identical to
    :func:`make_uap_epoch_fn` on the same batches; compile shared across
    instances like the gather epoch.
    """
    run = _uap_presliced_cache(apply_fn, cfg.optimizer, float(cfg.step_size),
                               cfg.norm)
    variables, beta, eps = cfg._vars, cfg.beta, cfg.eps

    def epoch_fn(e, opt_state, xs, ys, idx_b):
        return run(e, opt_state, variables, xs, ys, idx_b, beta, eps)

    return epoch_fn


@functools.lru_cache(maxsize=32)
def _batch_fool_fn(apply_fn):
    """Per-victim jitted fooling counter (cached so per-epoch callers don't
    recompile the model forward every invocation)."""

    @jax.jit
    def batch_fool(vars_, x, e):
        clean = jnp.argmax(apply_fn(vars_, x).astype(jnp.float32), -1)
        pert = jnp.argmax(apply_fn(vars_, x + e).astype(jnp.float32), -1)
        return jnp.sum(clean != pert)

    return batch_fool


def additive_fooling_rate(apply_fn, variables, e, images, batch_size=128):
    """Fraction of images whose prediction changes under ``x + e``.

    Reference: attacks/utils.py:189-200 (compute_fooling_rate).
    """
    n = images.shape[0]
    batch_fool = _batch_fool_fn(apply_fn)
    total = 0
    for s in range(0, n, batch_size):
        total += int(batch_fool(variables, images[s : s + batch_size], e))
    return total / n


class UAPPGD(Attack):
    """Universal perturbation by clipped-CE PGD (reference: uappgd.py:29-176)."""

    def __init__(
        self,
        victim: VictimModel,
        data_train=None,
        data_val=None,
        steps: int = 10,
        batch_size: int = 100,
        beta: float = 9.0,
        step_size: float = 0.01,
        norm: str = "l2",
        eps: float = 0.1,
        optimizer: str = "adam",
        mesh=None,
        model_name: Optional[str] = None,
        cache: Optional[ArtifactCache] = None,
        seed: int = 0,
        verbose: bool = False,
    ):
        super().__init__(victim, "UAPPGD", targeted=False)
        self.beta = beta
        self.steps = int(steps)
        self.step_size = step_size
        self.batch_size = batch_size
        self.norm = norm.lower()
        self.eps = eps
        self.optimizer = optimizer.lower()
        self.mesh = mesh
        self.model_name = model_name or victim.name
        self.cache = cache or ArtifactCache("trained_dicts")
        self.seed = seed
        self.verbose = verbose
        self.attack_vec: Optional[jax.Array] = None
        self.history: dict = {}
        self._vars = victim.variables

        if not self.cache.exists("UAPPGD", model=self.model_name) and data_train is not None:
            self.learn_attack(data_train, data_val)

    @property
    def is_trained(self) -> bool:
        """Whether forward() would skip its lazy learn (uappgd.py:169-174)."""
        return self.attack_vec is not None or self.cache.exists(
            "UAPPGD", model=self.model_name
        )

    def make_optimizer(self):
        # Single source of truth with the cached jitted epoch (uap_pgd.py:
        # _uap_epoch_cache builds its optimizer from the same dispatch) so
        # the opt_state init always matches the epoch's update structure.
        return _make_optimizer(self.optimizer, self.step_size)

    def learn_attack(self, data_train, data_val=None):
        ds = as_array_dataset(data_train)
        images = jnp.asarray(ds.images, jnp.float32)
        labels = jnp.asarray(ds.labels, jnp.int32)
        n = len(ds)
        e = jnp.zeros((1,) + ds.image_shape)
        opt_state = self.make_optimizer().init(e)
        key = jax.random.PRNGKey(self.seed)

        if self.mesh is not None:
            from ..parallel.adil_dp import make_local_batches, shard_rows

            n_dev = self.mesh.devices.size
            images = shard_rows(self.mesh, images)
            labels = shard_rows(self.mesh, labels)
            e = jax.device_put(e, NamedSharding(self.mesh, P(None, None, None, None)))

        # Serial path keeps the in-scan-gather epoch: measured FASTER than
        # pre-sliced for UAP (83.9 vs 95.3 ms/epoch, n256 b64 ResNet-50 on
        # v5e) — a shared-perturbation attack re-reads the images but has no
        # per-image state, so the preslice materialization is pure overhead
        # (unlike ADiL, where per-image codes make preslice win; see
        # BENCHMARKS.md round 2).
        epoch_fn = make_uap_epoch_fn(self.victim.apply_fn, self, self.mesh)

        fooling_rate, loss_track = [], []
        val_images = None
        if data_val is not None:
            val_images = jnp.asarray(as_array_dataset(data_val).images, jnp.float32)

        # Deferred loss readback: nothing host-side consumes the epoch loss
        # (no convergence rule on this path — the reference runs all epochs,
        # uappgd.py:89), so the per-epoch float() only stalls the dispatch
        # queue. Keep device scalars and force them after the loop, with a
        # bounded window so queue depth stays finite. Measured on chip at
        # N=256/b64/ResNet-50: ~1% (583 -> 578 ms/epoch) — each epoch is one
        # big device call, so the recovered overlap is only host dispatch;
        # the win grows as epochs shrink. Per-epoch val fooling / verbose
        # prints still synchronize when requested.
        window = 64
        for it in range(self.steps):
            key, sub = jax.random.split(key)
            if self.mesh is not None:
                batches = jax.device_put(
                    jnp.asarray(make_local_batches(sub, n, self.mesh.devices.size, self.batch_size)),
                    NamedSharding(self.mesh, P("data", None, None)),
                )
            else:
                batches = make_batches(sub, n, self.batch_size)
            e, opt_state, loss, fooling = epoch_fn(
                e, opt_state, images, labels, batches
            )
            loss_track.append(loss)
            if len(loss_track) > window:
                jax.block_until_ready(loss_track[-window])
            if val_images is not None:
                fooling_rate.append(
                    additive_fooling_rate(self.victim.apply_fn, self._vars, e, val_images)
                )
            if self.verbose:
                print(f"[uappgd] epoch {it} train_fool {float(fooling)/n:.3f} "
                      f"val_fool {fooling_rate[-1] if fooling_rate else None}")
        loss_track = [float(l) for l in loss_track]

        self.attack_vec = jnp.asarray(e)
        self.history = {"loss": loss_track, "fooling_rate": fooling_rate}
        self.cache.save(
            {"e": np.asarray(e), "fooling_rate": np.asarray(fooling_rate, np.float32)},
            "UAPPGD", model=self.model_name,
        )

    def _load(self) -> jax.Array:
        if self.attack_vec is None:
            payload = self.cache.load("UAPPGD", model=self.model_name)
            if payload is None:
                raise FileNotFoundError("UAP-PGD attack has not been learned")
            self.attack_vec = jnp.asarray(payload["e"])
        return self.attack_vec

    def forward(self, images: jax.Array, labels: jax.Array) -> jax.Array:
        if not self.cache.exists("UAPPGD", model=self.model_name) and self.attack_vec is None:
            # Lazy learn on the given batch (uappgd.py:169-172 intent).
            self.learn_attack((np.asarray(images), np.asarray(labels)), None)
        e = self._load()
        return clamp_image(images + e)
