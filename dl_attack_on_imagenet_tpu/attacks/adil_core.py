"""ADiL functional core: jit-compiled dictionary learning + inference.

Everything here is a pure function of (state, data, rng) suitable for
``jax.jit`` / ``lax.scan`` / ``shard_map``. The class wrapper in
``attacks/adil.py`` provides the reference-shaped API on top.

Reference semantics implemented (file:line into /root/reference):
- joint AdamW dictionary learning       adil.py:114-210 (learn_dictionary_a)
- alternating v-step / d-step           adil.py:212-332 (learn_dictionary_b)
- projected-AdamW update order (optimizer step, THEN projection)
                                        adil.py:185-188
- training-time re-labeling with the model's own prediction
                                        adil.py:172
- z-space inference ("DDrague")         adil.py:508-567
- v-space AdamW inference               adil.py:569-623
- unsupervised sphere-sampling inference adil.py:460-506 (intent, see note)
- code/dictionary initialization        adil.py:144-150, :240-241, :368-373
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops import (
    attack_loss,
    clamp_image,
    dict_apply,
    dict_pinv,
    codes_from_pinv,
    linf_clamp,
    project_codes,
    project_dictionary,
)

ApplyFn = Callable[[Any, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class AdilConfig:
    """Static attack hyper-parameters (closed over by jitted functions).

    Defaults follow the reference operating point (BASELINE.md):
    demo_dL_attack.py:88-94 and adil.py:63-66.
    """

    eps: float = 8 / 255
    norm: str = "linf"  # 'linf' | 'l2'
    n_atoms: int = 100
    loss: str = "ce"  # 'ce' | 'logits'
    kappa: float = 50.0
    targeted: bool = False
    step_size: float = 0.01
    steps: int = 500
    steps_inner: int = 1
    batch_size: int = 100
    trials: int = 10
    steps_inference: int = 30
    steps_code: int = 100  # inner v-solver iterations (adil.py:592: fixed 100)
    code_lr: float = 1e-2  # inference-time AdamW lr (adil.py:531, :589)
    tol: float = 1e-6
    # Training-time compute precision for the perturbation x + Dv.
    # 'float32' (default) reproduces the reference trajectory; 'bfloat16'
    # computes the D·v contraction and image add in bf16 (master D/v and all
    # projections stay fp32 — standard mixed precision), measured ~7% faster
    # per step on v5e (BENCHMARKS.md). The supervised inference solvers
    # honor the same setting for their INNER forwards; the final adversary
    # and every budget clamp always compute in fp32.
    perturb_dtype: str = "float32"

    def __post_init__(self):
        # Downstream only tests equality with 'bfloat16' — a typo would
        # silently fall back to fp32 and invalidate a perf comparison.
        if self.perturb_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"perturb_dtype must be 'float32' or 'bfloat16', "
                f"got {self.perturb_dtype!r}"
            )

    @property
    def coeff(self) -> float:
        # Targeted maximizes target-class likelihood; untargeted flips CE.
        return 1.0 if self.targeted else -1.0


class AdilState(struct.PyTreeNode):
    """Learnable attack state: dictionary + per-image codes + optimizer.

    ``d`` is stored FLAT (K, H*W*C) — the matmul-native layout. Keeping the
    training-resident dictionary 2-D lets XLA assign one consistent layout
    to the donated parameter, its AdamW moments, and the D·v / D-gradient
    matmuls; with a 4-D (K, H, W, C) state the compiler materialized ~0.8 ms
    of pure layout copies per step reconciling the matmul layout with the
    4-D parameter layout (v5e device trace, BENCHMARKS.md round 2). Use
    :func:`d_image` for the presentation shape at API boundaries.
    """

    d: jax.Array  # (K, H*W*C) — flat training layout; see d_image()
    v: jax.Array  # (N, K)
    opt_state: Any
    epoch: jax.Array  # scalar int32


def d_image(d: jax.Array, image_shape) -> jax.Array:
    """Dictionary in presentation shape (K,)+image_shape from any layout."""
    return d.reshape((d.shape[0],) + tuple(image_shape))


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_dictionary(key: jax.Array, image_shape, cfg: AdilConfig) -> jax.Array:
    """D init: linf -> U(-1,1); l2 -> unit-ball-projected Gaussian.

    Reference: adil.py:144-150.
    """
    shape = (cfg.n_atoms,) + tuple(image_shape)
    if cfg.norm == "l2":
        return project_dictionary(jax.random.normal(key, shape), "l2")
    return jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)


def init_codes(key: jax.Array, n_img: int, cfg: AdilConfig, mode: str = "gd") -> jax.Array:
    """v init per training mode.

    gd: projected U(0,1) (adil.py:150); alter: projected zeros (adil.py:241);
    distributed: projected Gaussian (adil.py:373).
    """
    if mode == "alter":
        raw = jnp.zeros((n_img, cfg.n_atoms))
    elif mode == "distributed":
        raw = jax.random.normal(key, (n_img, cfg.n_atoms))
    else:
        raw = jax.random.uniform(key, (n_img, cfg.n_atoms))
    return project_codes(raw, cfg.eps, cfg.norm)


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """AdamW with torch defaults (betas 0.9/0.999, eps 1e-8, wd 1e-2) —
    matching ``torch.optim.AdamW`` as used at adil.py:154."""
    return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2)


def init_state(
    key: jax.Array,
    image_shape,
    n_img: int,
    cfg: AdilConfig,
    mode: str = "gd",
    d_init: Optional[jax.Array] = None,
) -> AdilState:
    kd, kv = jax.random.split(key)
    d = init_dictionary(kd, image_shape, cfg) if d_init is None else d_init
    d = jnp.asarray(d).reshape(d.shape[0], -1)  # flat training layout
    v = init_codes(kv, n_img, cfg, mode)
    if mode == "alter":
        opt_state = {
            "d": make_optimizer(2 * cfg.step_size).init(d),
            "v": make_optimizer(cfg.step_size).init(v),
        }
    else:
        opt_state = make_optimizer(cfg.step_size).init({"d": d, "v": v})
    return AdilState(d=d, v=v, opt_state=opt_state, epoch=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# Training steps
# ---------------------------------------------------------------------------


def _batch_loss(
    apply_fn: ApplyFn,
    variables: Any,
    d: jax.Array,
    v_rows: jax.Array,
    x: jax.Array,
    labels: jax.Array,
    mask: jax.Array,
    cfg: AdilConfig,
    kappa=None,
):
    """Summed attack loss over one (masked) batch + fooling count.

    Training applies NO pixel clamp on x+dv (reference Attack_dict_model
    forward, adil.py:24-26). ``kappa`` optionally overrides ``cfg.kappa``
    with a TRACED scalar (the sweep compile-reuse path).
    """
    # d may be flat (K, H*W*C) — the training layout everywhere since the
    # DP path also went flat — or presentation (K, H, W, C); dv is reshaped
    # to the image batch either way.
    if cfg.perturb_dtype == "bfloat16":
        dv = dict_apply(v_rows, d, compute_dtype=jnp.bfloat16).reshape(x.shape)
        x_c = x if x.dtype == jnp.bfloat16 else x.astype(jnp.bfloat16)
        logits = apply_fn(variables, x_c + dv).astype(jnp.float32)
    else:
        dv = dict_apply(v_rows, d).reshape(x.shape)
        # promote (not truncate): f64 inputs keep f64 logits so the
        # executed-reference f64 parity tests see full-precision gradients
        logits = apply_fn(variables, x + dv).astype(
            jnp.promote_types(jnp.float32, x.dtype))
    if cfg.loss == "ce":
        logp = jax.nn.log_softmax(logits, axis=-1)
        per = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        per = cfg.coeff * per
    else:
        from ..ops import cw_margin_loss

        per = cw_margin_loss(
            logits, labels,
            kappa=cfg.kappa if kappa is None else kappa,
            targeted=cfg.targeted,
        )
    loss = jnp.sum(per * mask)
    fooling = jnp.sum((jnp.argmax(logits, -1) != labels) * mask)
    return loss, fooling


@functools.lru_cache(maxsize=None)
def _predict_fn(apply_fn: ApplyFn):
    """Jitted argmax forward, cached per apply_fn — repeated calls (every
    sweep combo labels the same dataset) reuse one compile instead of
    re-jitting a fresh closure per call."""
    return jax.jit(
        lambda v, x: jnp.argmax(apply_fn(v, x).astype(jnp.float32), -1)
    )


def predict_labels(apply_fn: ApplyFn, variables: Any, images: jax.Array,
                   batch_size: int = 256) -> jax.Array:
    """Clean-model predictions for a whole dataset, one pass.

    The reference re-labels every batch with ``model(x).argmax`` inside the
    training loop (adil.py:172) — a full extra forward per step whose result
    never changes for a frozen model on fixed images. Computing it once here
    is output-identical and removes a third of the per-step FLOPs.
    """
    fwd = _predict_fn(apply_fn)
    n = images.shape[0]
    out = []
    for start in range(0, n, batch_size):
        out.append(fwd(variables, images[start : start + batch_size]))
    return jnp.concatenate(out)


def make_train_step(
    apply_fn: ApplyFn,
    cfg: AdilConfig,
    update: str = "both",  # 'both' | 'v' | 'd'
    hyper_args: bool = False,
):
    """Build one projected-AdamW training step over a batch of images.

    Batch = (x, labels, idx, mask): images, their precomputed clean-model
    labels (see :func:`predict_labels`), global row indices into v, and a
    0/1 mask for padded slots. Projection runs AFTER the optimizer step
    (adil.py:185-188).

    ``hyper_args=True`` makes the step take trailing TRACED ``(eps, kappa)``
    scalars instead of baking ``cfg.eps``/``cfg.kappa`` into the trace — a
    hyper grid sweep over those (demo_dL_attack.py:88-94) then reuses one
    compile (see :func:`make_epoch_fn_presliced_swept`).
    """
    joint_opt = make_optimizer(cfg.step_size)
    opt_v = make_optimizer(cfg.step_size)
    opt_d = make_optimizer(2 * cfg.step_size)

    def step(state: AdilState, variables: Any, x, labels, idx, mask,
             eps=None, kappa=None):
        eps = cfg.eps if eps is None else eps

        def loss_fn(params):
            v_rows = params["v"][idx]
            return _batch_loss(
                apply_fn, variables, params["d"], v_rows, x, labels, mask,
                cfg, kappa=kappa,
            )

        params = {"d": state.d, "v": state.v}
        (loss, fooling), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        if update == "both":
            updates, opt_state = joint_opt.update(grads, state.opt_state, params)
            params = optax.apply_updates(params, updates)
            d_new, v_new = params["d"], params["v"]
        elif update == "v":
            upd, new_v_state = opt_v.update(grads["v"], state.opt_state["v"], state.v)
            v_new = optax.apply_updates(state.v, upd)
            d_new = state.d
            opt_state = {"d": state.opt_state["d"], "v": new_v_state}
        else:  # 'd'
            upd, new_d_state = opt_d.update(grads["d"], state.opt_state["d"], state.d)
            d_new = optax.apply_updates(state.d, upd)
            v_new = state.v
            opt_state = {"d": new_d_state, "v": state.opt_state["v"]}

        # Projections: v onto the budget ball (all rows, adil.py:29-31), d
        # onto the norm constraint (adil.py:33-35).
        if update in ("both", "v"):
            v_new = project_codes(v_new, eps, cfg.norm)
        if update in ("both", "d"):
            d_new = project_dictionary(d_new, cfg.norm)

        new_state = state.replace(d=d_new, v=v_new, opt_state=opt_state)
        return new_state, loss, fooling

    if not hyper_args:
        return lambda state, variables, x, labels, idx, mask: step(
            state, variables, x, labels, idx, mask
        )
    return step


def make_epoch_fn(
    apply_fn: ApplyFn,
    cfg: AdilConfig,
    update: str = "both",
):
    """One full epoch as a single jitted scan over pre-batched indices.

    ``batches`` is (n_batches, B) int32 of image indices, -1 for padding.
    All images and clean labels stay resident in HBM; each scan step gathers
    its batch rows — no host transfers inside the epoch.
    """
    step_fn = make_train_step(apply_fn, cfg, update)

    # state is donated: its buffers (D, v, AdamW moments — ~0.5 GB at the
    # reference operating point) are updated in place across epochs.
    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state: AdilState, variables: Any, images: jax.Array,
              labels: jax.Array, batches: jax.Array):
        def body(carry, batch_idx):
            st = carry
            mask = (batch_idx >= 0).astype(jnp.float32)
            idx = jnp.maximum(batch_idx, 0)
            x = images[idx]
            st, loss, fooling = step_fn(st, variables, x, labels[idx], idx, mask)
            return st, (loss, fooling)

        state, (losses, foolings) = jax.lax.scan(body, state, batches)
        state = state.replace(epoch=state.epoch + 1)
        return state, jnp.sum(losses), jnp.sum(foolings)

    return epoch


def make_batches(key: jax.Array, n_img: int, batch_size: int) -> jax.Array:
    """Shuffled index batches (n_batches, B), padded with -1."""
    perm = jax.random.permutation(key, n_img)
    n_batches = -(-n_img // batch_size)
    pad = n_batches * batch_size - n_img
    perm = jnp.concatenate([perm, -jnp.ones((pad,), perm.dtype)])
    return perm.reshape(n_batches, batch_size)


def make_train_scan(
    apply_fn: ApplyFn,
    cfg: AdilConfig,
    update: str = "both",
    n_steps: int = 10,
):
    """n_steps chained training steps on a FIXED batch, one device dispatch.

    Semantically identical to calling :func:`make_train_step` n_steps times
    on the same (x, labels, idx, mask) — the reference's ``steps_in`` inner
    repetitions over one phase do exactly this (adil.py:265-289, :292-316).
    Fusing the repetitions into a single ``lax.scan`` removes the per-step
    host-dispatch gap (~1.1 ms/step through the axon tunnel, BENCHMARKS.md)
    with no in-scan gathers, so device time is all that remains.
    """
    step_fn = make_train_step(apply_fn, cfg, update)

    @partial(jax.jit, donate_argnums=(0,))
    def run(state: AdilState, variables: Any, x, labels, idx, mask):
        def body(st, _):
            st, loss, fooling = step_fn(st, variables, x, labels, idx, mask)
            return st, (loss, fooling)

        state, (losses, foolings) = jax.lax.scan(
            body, state, None, length=n_steps
        )
        return state, losses, foolings

    return run


def preslice_epoch(images: jax.Array, labels: jax.Array, batches: jax.Array):
    """Materialize per-batch tensors for :func:`make_epoch_fn_presliced`.

    One gather over the whole dataset per epoch (amortized across its
    batches) instead of a 38 MB in-scan gather per step — the in-scan
    gather was measured to cost more than the dispatch gap it hides
    (BENCHMARKS.md: 20.1 ms scanned-with-gather vs 18.6 dispatched).
    Padded slots (index -1) gather row 0 and are masked out by idx_b < 0.
    """
    idx = jnp.maximum(batches, 0)
    return images[idx], labels[idx], batches


@functools.lru_cache(maxsize=None)
def _swept_epoch_cache(apply_fn: ApplyFn, cfg_static: AdilConfig, update: str):
    """Jitted pre-sliced epoch with (eps, kappa) as traced trailing args.

    Keyed on the config with eps/kappa normalized out, so every hyper combo
    of the reference sweep (demo_dL_attack.py:88-94) that only varies
    eps/kappa shares ONE compiled epoch per (victim, shapes). n_atoms /
    batch-size sweeps change shapes and retrace as jit normally would.
    """
    step_fn = make_train_step(apply_fn, cfg_static, update, hyper_args=True)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state: AdilState, variables: Any, xs: jax.Array,
              labels_b: jax.Array, idx_b: jax.Array, eps, kappa):
        def body(st, batch):
            x, labels, batch_idx = batch
            mask = (batch_idx >= 0).astype(jnp.float32)
            idx = jnp.maximum(batch_idx, 0)
            st, loss, fooling = step_fn(
                st, variables, x, labels, idx, mask, eps, kappa
            )
            return st, (loss, fooling)

        state, (losses, foolings) = jax.lax.scan(
            body, state, (xs, labels_b, idx_b)
        )
        state = state.replace(epoch=state.epoch + 1)
        return state, jnp.sum(losses), jnp.sum(foolings)

    return epoch


def make_epoch_fn_presliced_swept(
    apply_fn: ApplyFn,
    cfg: AdilConfig,
    update: str = "both",
):
    """Pre-sliced epoch with sweep compile-reuse over (eps, kappa).

    Same signature/trajectory as :func:`make_epoch_fn_presliced`; the
    eps/kappa scalars are bound as traced arguments so ADIL instances that
    differ only in those hypers share the compiled epoch (the class
    training path uses this; tests/test_adil_sweep_reuse.py).
    """
    cfg_static = dataclasses.replace(cfg, eps=-1.0, kappa=-1.0)
    epoch = _swept_epoch_cache(apply_fn, cfg_static, update)
    eps = jnp.float32(cfg.eps)
    kappa = jnp.float32(cfg.kappa)

    def run(state, variables, xs, labels_b, idx_b):
        return epoch(state, variables, xs, labels_b, idx_b, eps, kappa)

    return run


def make_epoch_fn_presliced(
    apply_fn: ApplyFn,
    cfg: AdilConfig,
    update: str = "both",
):
    """One epoch as a single scan over pre-sliced batches (no in-scan gather).

    Takes (xs, labels_b, idx_b) from :func:`preslice_epoch`: xs is
    (n_batches, B, H, W, C) actual image batches — ``lax.scan`` slices the
    leading axis for free, so each step reads its batch contiguously.
    Trajectory-identical to :func:`make_epoch_fn` on the same ``batches``
    (same step math, same order; v-row scatter still uses global indices).
    """
    step_fn = make_train_step(apply_fn, cfg, update)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state: AdilState, variables: Any, xs: jax.Array,
              labels_b: jax.Array, idx_b: jax.Array):
        def body(st, batch):
            x, labels, batch_idx = batch
            mask = (batch_idx >= 0).astype(jnp.float32)
            idx = jnp.maximum(batch_idx, 0)
            st, loss, fooling = step_fn(st, variables, x, labels, idx, mask)
            return st, (loss, fooling)

        state, (losses, foolings) = jax.lax.scan(
            body, state, (xs, labels_b, idx_b)
        )
        state = state.replace(epoch=state.epoch + 1)
        return state, jnp.sum(losses), jnp.sum(foolings)

    return epoch


# ---------------------------------------------------------------------------
# Inference: supervised z-space ("DDrague")
# ---------------------------------------------------------------------------


def supervised_ddrague(
    apply_fn: ApplyFn,
    variables: Any,
    d: jax.Array,
    images: jax.Array,
    cfg: AdilConfig,
    eps=None,
    kappa=None,
) -> jax.Array:
    """Optimize an image-shaped z, reading codes off via the pseudo-inverse.

    AdamW(lr=1e-2) on z for <= steps_inference iterations; z clamped to
    [-eps, eps] after each step; early stop when max|Δz| < tol.

    With ``cfg.perturb_dtype='bfloat16'`` the inner model forward runs on a
    bf16 adversary (master z, the pseudo-inverse reads, the clamps, and the
    returned adversary all stay fp32) — same mixed-precision contract as
    training (BENCHMARKS.md).

    Reference: adil.py:508-567 (forward_supervised_DDrague). NOTE (faithful
    reference property): only z is eps-clamped — the returned perturbation
    dv = D D† z is z's projection onto span(D), which is NOT l∞-contractive,
    so ||dv||_inf can exceed eps (observed up to ~2.5x on random
    dictionaries; the reference likewise never re-clamps dv, adil.py:560-567).
    Use :func:`supervised_adamw_codes` when a hard budget is required.
    """
    # eps/kappa may arrive as TRACED scalars (sweep compile-reuse — the
    # class solvers bind them as args so eps/kappa hyper combos share one
    # compiled solver).
    eps = cfg.eps if eps is None else eps
    kappa = cfg.kappa if kappa is None else kappa
    labels = jnp.argmax(apply_fn(variables, images).astype(jnp.float32), -1)
    d_pinv = dict_pinv(d)
    opt = make_optimizer(cfg.code_lr)
    mixed = cfg.perturb_dtype == "bfloat16"
    images_c = images.astype(jnp.bfloat16) if mixed else images

    def loss_fn(z):
        # In-loop read-off: the z eps-clamp (not v) carries this solver's
        # only budget semantics, so the mixed path runs BOTH contractions in
        # bf16 (master z stays fp32); the final read-off below stays HIGHEST.
        v = codes_from_pinv(
            z, d_pinv, compute_dtype=jnp.bfloat16 if mixed else None)
        dv = dict_apply(
            v, d, compute_dtype=jnp.bfloat16 if mixed else None
        ).reshape(images.shape)
        logits = apply_fn(variables, images_c + dv).astype(
            jnp.promote_types(jnp.float32, images.dtype))
        # Reference uses mean-CE here (adil.py:519) but sum for 'logits'.
        red = "mean" if cfg.loss == "ce" else "sum"
        return attack_loss(
            logits, labels, loss=cfg.loss, targeted=cfg.targeted, kappa=kappa,
            reduction=red,
        )

    z0 = jnp.zeros_like(images)

    def cond(carry):
        z, _, it, delta = carry
        return jnp.logical_and(it < cfg.steps_inference, delta >= cfg.tol)

    def body(carry):
        z, opt_state, it, _ = carry
        g = jax.grad(loss_fn)(z)
        updates, opt_state = opt.update(g, opt_state, z)
        z_new = linf_clamp(optax.apply_updates(z, updates), eps)
        delta = jnp.max(jnp.abs(z_new - z))
        return (z_new, opt_state, it + 1, delta)

    z, _, _, _ = jax.lax.while_loop(
        cond, body, (z0, opt.init(z0), jnp.zeros((), jnp.int32), jnp.inf)
    )
    v = codes_from_pinv(z, d_pinv)
    adv = images + dict_apply(v, d)
    return clamp_image(adv)


# ---------------------------------------------------------------------------
# Inference: supervised v-space AdamW
# ---------------------------------------------------------------------------


def supervised_adamw_codes(
    apply_fn: ApplyFn,
    variables: Any,
    d: jax.Array,
    images: jax.Array,
    cfg: AdilConfig,
    return_fooling: bool = False,
    eps=None,
    kappa=None,
):
    """Optimize fresh codes v for a batch against a frozen dictionary.

    AdamW(lr=1e-2) + post-step l1/l2-ball projection, <= steps_code iters,
    early stop on max|Δv| < tol. ``return_fooling=True`` reproduces the
    'train'-mode validation path (fooling count, adil.py:617-620).

    Reference: adil.py:569-623 (forward_supervised_AdamW).
    """
    eps = cfg.eps if eps is None else eps      # may be traced (sweep reuse)
    kappa = cfg.kappa if kappa is None else kappa
    labels = jnp.argmax(apply_fn(variables, images).astype(jnp.float32), -1)
    opt = make_optimizer(cfg.code_lr)
    n = images.shape[0]
    v0 = jnp.zeros((n, cfg.n_atoms), images.dtype)
    # Mixed-precision inner forward (master v, projections, and the final
    # budget-clamped adversary stay fp32) — see supervised_ddrague.
    mixed = cfg.perturb_dtype == "bfloat16"
    images_c = images.astype(jnp.bfloat16) if mixed else images

    def loss_fn(v):
        dv = dict_apply(
            v, d, compute_dtype=jnp.bfloat16 if mixed else None
        ).reshape(images.shape)
        logits = apply_fn(variables, images_c + dv).astype(
            jnp.promote_types(jnp.float32, images.dtype))
        red = "mean" if cfg.loss == "ce" else "sum"
        return attack_loss(
            logits, labels, loss=cfg.loss, targeted=cfg.targeted, kappa=kappa,
            reduction=red,
        )

    def cond(carry):
        v, _, it, delta = carry
        return jnp.logical_and(it < cfg.steps_code, delta >= cfg.tol)

    def body(carry):
        v, opt_state, it, _ = carry
        g = jax.grad(loss_fn)(v)
        updates, opt_state = opt.update(g, opt_state, v)
        v_new = project_codes(optax.apply_updates(v, updates), eps, cfg.norm)
        delta = jnp.max(jnp.abs(v_new - v))
        return (v_new, opt_state, it + 1, delta)

    v, _, _, _ = jax.lax.while_loop(
        cond, body, (v0, opt.init(v0), jnp.zeros((), jnp.int32), jnp.inf)
    )
    dv = dict_apply(project_codes(v, eps, cfg.norm), d)
    if return_fooling:
        adv_labels = jnp.argmax(apply_fn(variables, images + dv).astype(jnp.float32), -1)
        return jnp.sum(adv_labels != labels)
    return clamp_image(images + dv)


# ---------------------------------------------------------------------------
# Inference: unsupervised sphere sampling
# ---------------------------------------------------------------------------


def sample_sphere(key: jax.Array, n: int, cfg: AdilConfig, eps=None) -> jax.Array:
    """Sample codes on the budget sphere.

    l2: uniform cube direction scaled to the eps l2-sphere; linf: entries
    ~ U(eps, 2eps) projected onto the eps l1-ball (landing on its surface).

    Reference: adil.py:644-655.
    """
    eps = cfg.eps if eps is None else eps  # may be traced (sweep reuse)
    if cfg.norm == "l2":
        var = jax.random.uniform(key, (n, cfg.n_atoms), minval=-1.0, maxval=1.0)
        nrm = jnp.linalg.norm(var, axis=1, keepdims=True)
        return eps * var / jnp.maximum(nrm, 1e-12)
    raw = jax.random.uniform(
        key, (n, cfg.n_atoms), minval=eps, maxval=2 * eps
    )
    return project_codes(raw, eps, cfg.norm)


def unsupervised_sample(
    apply_fn: ApplyFn,
    variables: Any,
    d: jax.Array,
    images: jax.Array,
    key: jax.Array,
    cfg: AdilConfig,
    eps=None,
    v_trials: Optional[jax.Array] = None,
) -> jax.Array:
    """Best-of-trials random-code attack.

    Per image, across `trials` draws: once any draw fools the model, keep the
    minimum-MSE fooling adversary; until then keep the minimum-MSE
    non-fooling one. dv is clamped to ±eps before the pixel clip.

    Reference: adil.py:460-506 (forward_unsupervised). The reference's
    per-image bookkeeping has an overwrite quirk (a fooled image's best can
    be replaced via the no-fool branch, adil.py:499-504) and returns a
    (tensor, list) tuple its own callers can't consume (SURVEY.md §2.4); the
    documented intent — vectorized masked updates, tensor return — is
    implemented here.

    ``v_trials`` ((trials, N, K)) bypasses the sampler with externally
    supplied codes — the executed-reference parity tests replay the
    reference's torch RNG draws through the SAME selection program
    (tests/test_reference_exec_adil.py).
    """
    eps = cfg.eps if eps is None else eps  # may be traced (sweep reuse)
    pre_labels = jnp.argmax(apply_fn(variables, images).astype(jnp.float32), -1)
    n = images.shape[0]

    init = (
        jnp.zeros((n,), jnp.bool_),  # fooled flag
        jnp.full((n,), jnp.inf),  # best mse among fooling advs
        jnp.full((n,), jnp.inf),  # best mse among non-fooling advs
        images,  # best adversary so far (clone of input, adil.py:472)
    )

    if v_trials is None:
        keys = jax.random.split(key, cfg.trials)
        vs = jax.vmap(lambda k: sample_sphere(k, n, cfg, eps))(keys)
    else:
        vs = jnp.asarray(v_trials)

    def trial(carry, v):
        fooled, mse_fool, mse_nofool, best = carry
        dv = linf_clamp(dict_apply(v, d), eps)
        adv = clamp_image(images + dv)
        adv_labels = jnp.argmax(apply_fn(variables, adv).astype(jnp.float32), -1)
        fooling = adv_labels != pre_labels
        mse = jnp.sum((images - adv) ** 2, axis=(1, 2, 3))

        take_fool = fooling & (mse < mse_fool)
        take_nofool = (~fooled) & (~fooling) & (mse < mse_nofool)
        take = take_fool | take_nofool

        mse_fool = jnp.where(take_fool, mse, mse_fool)
        mse_nofool = jnp.where(take_nofool, mse, mse_nofool)
        best = jnp.where(take[:, None, None, None], adv, best)
        fooled = fooled | fooling
        return (fooled, mse_fool, mse_nofool, best), None

    (fooled, _, _, best), _ = jax.lax.scan(trial, init, vs)
    return best
