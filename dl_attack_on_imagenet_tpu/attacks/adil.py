"""ADIL — Adversarial Dictionary Learning attack (constrained variant).

Reference-shaped class API over the jitted functional core in
``adil_core.py``. Mirrors /root/reference/attacks/attacks_classes/adil.py:
constructor signature (adil.py:63-101), artifact memoization (adil.py:89-101),
training methods 'gd' (joint AdamW, :114-210) and 'alter' (alternating
v/d phases, :212-332), and the three inference modes (:432-506, :508-623).

Known reference defects are implemented by documented intent, not crash
(SURVEY.md §2.4): the lazy learn-on-first-call path actually works here, and
``forward_unsupervised`` returns the adversarial tensor.
"""

from __future__ import annotations

import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import as_array_dataset
from ..models import VictimModel
from ..utils import ArtifactCache, StepTimer, annotate
from .base import Attack
from . import adil_core as core
from .adil_core import AdilConfig


import dataclasses as _dc
import functools as _ft


@_ft.lru_cache(maxsize=None)
def _solver_cache_impl(apply_fn, cfg_static: AdilConfig):
    return {
        "ddrague": jax.jit(
            lambda variables, d, images, eps, kappa: core.supervised_ddrague(
                apply_fn, variables, d, images, cfg_static, eps, kappa)),
        "unsup": jax.jit(
            lambda variables, d, images, key, eps: core.unsupervised_sample(
                apply_fn, variables, d, images, key, cfg_static, eps)),
        "codes": jax.jit(
            lambda variables, d, images, eps, kappa: core.supervised_adamw_codes(
                apply_fn, variables, d, images, cfg_static,
                eps=eps, kappa=kappa)),
        "val": jax.jit(
            lambda variables, d, images, eps, kappa: core.supervised_adamw_codes(
                apply_fn, variables, d, images, cfg_static,
                return_fooling=True, eps=eps, kappa=kappa)),
    }


def _solver_cache(apply_fn, cfg: AdilConfig):
    """Jitted inference solvers shared across ADIL instances; eps/kappa are
    traced trailing args so hyper sweeps over them reuse one compile."""
    return _solver_cache_impl(apply_fn, _dc.replace(cfg, eps=-1.0, kappa=-1.0))


def _device_memory_budget() -> int:
    """Best-effort bytes available on the compute device (for the
    pipeline_epochs='auto' decision)."""
    dev = jax.local_devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        stats = None
    if stats and stats.get("bytes_limit"):
        return int(stats["bytes_limit"])
    if dev.platform == "tpu":
        return 16 << 30  # v5e HBM
    return 64 << 30  # CPU / virtual mesh: effectively unconstrained


class _WindowedSums:
    """Bounded-window async readback of per-step (loss, fooling) scalars.

    An eager ``float(loss)`` after every step forces a host round-trip
    between consecutive steps, fully serializing transfer -> compute ->
    readback. Deferring each step's scalars by ``window`` steps keeps the
    device queue and the H2D lookahead busy while still bounding the
    in-flight batch buffers (~window x batch bytes of HBM). The sums are
    identical floats accumulated in identical order.
    """

    def __init__(self, window: int = 8):
        self.window = window
        self._pend: list = []
        self.loss = 0.0
        self.fool = 0.0

    def push(self, loss, fooling) -> None:
        self._pend.append((loss, fooling))
        if len(self._pend) > self.window:
            l0, f0 = self._pend.pop(0)
            self.loss += float(l0)
            self.fool += float(f0)

    def flush(self) -> tuple:
        for l0, f0 in self._pend:
            self.loss += float(l0)
            self.fool += float(f0)
        self._pend = []
        return self.loss, self.fool


class ADIL(Attack):
    """Adversarial Dictionary Learning (ADiL).

    Learns K perturbation atoms D shared across images plus per-image sparse
    codes v so that ``x_i + D v_i`` fools a frozen classifier under an
    eps-ball budget; unseen images are attacked by optimizing fresh codes
    (supervised) or sampling them (unsupervised).
    """

    def __init__(
        self,
        victim: VictimModel,
        eps: float = 8 / 255,
        steps: int = 500,
        norm: str = "linf",
        targeted: bool = False,
        n_atoms: int = 100,
        batch_size: int = 100,
        data_train=None,
        data_val=None,
        trials: int = 10,
        attack: str = "supervised",
        model_name: Optional[str] = None,
        step_size: float = 0.01,
        steps_in: int = 1,
        loss: str = "ce",
        method: str = "gd",
        warm_start: bool = False,
        kappa: float = 50.0,
        steps_inference: int = 30,
        mesh=None,
        cache: Optional[ArtifactCache] = None,
        seed: int = 0,
        val_every: Optional[int] = 1,
        verbose: bool = False,
        stream: Optional[bool] = None,
        checkpoint_every: Optional[int] = None,
        resume: bool = True,
        metrics_log: Optional[str] = None,
        blocked: Any = "auto",
        perturb_dtype: str = "float32",
        pipeline_epochs: Any = "auto",
    ):
        super().__init__(victim, "ADIL", targeted)
        self.cfg = AdilConfig(
            eps=eps,
            norm=norm.lower(),
            n_atoms=n_atoms,
            loss=loss,
            kappa=kappa,
            targeted=targeted,
            step_size=step_size,
            steps=int(steps),
            steps_inner=steps_in or 1,
            batch_size=batch_size,
            trials=int(trials),
            steps_inference=int(steps_inference),
            # Mixed-precision perturbation (training + supervised-inference
            # inner forwards; master state and budget clamps stay fp32 —
            # AdilConfig.perturb_dtype).
            perturb_dtype=perturb_dtype,
        )
        self.attack_mode = attack
        self.method = method
        self.warm_start = warm_start
        self.model_name = model_name or victim.name
        self.mesh = mesh
        self.cache = cache or ArtifactCache("trained_dicts")
        self.seed = seed
        self.val_every = val_every
        self.verbose = verbose
        self.stream = stream
        self.checkpoint_every = checkpoint_every
        self.resume = resume
        # blocked: train in the s2d stem's compute layout when the victim
        # supports it ('auto'; True forces, False disables). Exactly the
        # standard trajectory under a fixed column permutation
        # (tests/test_blocked_pipeline.py) but ~5% faster on TPU — the
        # input-gradient exits the backward already in the D-matmul layout
        # (BENCHMARKS.md round 2). Artifacts/inference always see the
        # standard (K, H, W, C) presentation dictionary.
        self.blocked = blocked
        # pipeline_epochs: depth-1 software pipelining of the resident-array
        # training loop — epoch t+1 is dispatched BEFORE epoch t's loss is
        # read back, so the per-epoch host work (batch permutation, preslice
        # dispatch, metric readback round-trips) overlaps device compute
        # instead of serializing with it. The trajectory is EXACTLY the
        # serial one: the convergence rule (adil.py:207) still stops on
        # epoch t's state via a rolling device-side snapshot taken before
        # the state is donated into epoch t+1 (tests/test_epoch_pipeline.py).
        # Costs one extra resident copy of (state, presliced epoch) in HBM,
        # so 'auto' (default) enables it only when the estimated footprint
        # clearly fits the device budget (_resolve_pipeline); True/False
        # force it either way.
        self.pipeline_epochs = pipeline_epochs
        from ..utils import MetricLogger

        self.metrics = MetricLogger(metrics_log)
        self.dictionary: Optional[jax.Array] = None
        # Whether the LAST training run used the blocked layout (the
        # streamed/folder/alter paths always train unblocked).
        self.trained_blocked = False
        self.history: dict = {}
        self.timing: dict = {}
        self._rng_calls = 0  # per-call fold so equal-sized batches differ

        # Jitted inference/val solvers, shared through a module-level cache
        # keyed on (apply_fn, cfg minus eps/kappa): eps/kappa are bound as
        # TRACED args, so a hyper grid over them reuses ONE compiled solver
        # per victim+shape, and no per-call retracing of the while_loop
        # bodies happens either (the val eval runs every epoch).
        fns = _solver_cache(victim.apply_fn, self.cfg)
        eps_t = jnp.float32(self.cfg.eps)
        kappa_t = jnp.float32(self.cfg.kappa)
        self._ddrague_fn = lambda variables, d, images: fns["ddrague"](
            variables, d, images, eps_t, kappa_t)
        self._unsup_fn = lambda variables, d, images, key: fns["unsup"](
            variables, d, images, key, eps_t)
        self._codes_fn = lambda variables, d, images: fns["codes"](
            variables, d, images, eps_t, kappa_t)
        self._val_fn = lambda variables, d, images: fns["val"](
            variables, d, images, eps_t, kappa_t)

        # Artifact memoization: train only if the trained-dictionary file is
        # missing (adil.py:94-101).
        if not self.cache.exists("ImageNet", model=self.model_name) and data_train is not None:
            self.learn_dictionary(data_train, data_val)

    # -- training ---------------------------------------------------------

    @property
    def is_trained(self) -> bool:
        """Whether forward() would skip its lazy learn (adil.py:438-445)."""
        return self.dictionary is not None or self.cache.exists(
            "ImageNet", model=self.model_name
        )

    def _loss_key(self):
        return jax.random.PRNGKey(self.seed)

    def learn_dictionary(self, data_train, data_val=None):
        # Folder-backed datasets dispatch FIRST: with a mesh set,
        # _dispatch_folder materializes to arrays (native streaming is
        # single-controller) and the mesh branch below consumes them — the
        # old order handed the raw folder to as_array_dataset and crashed.
        if self._is_path_dataset(data_train):
            data_train, data_val = self._dispatch_folder(data_train, data_val)
            if data_train is None:
                return  # trained natively from raw JPEGs
        if self.mesh is not None:
            from ..parallel import learn_dictionary_distributed

            d_init = self._load_warm_start()
            d, v, history = learn_dictionary_distributed(
                self.victim, as_array_dataset(data_train), self.cfg, self.mesh,
                seed=self.seed, verbose=self.verbose,
                data_val=as_array_dataset(data_val) if data_val is not None else None,
                val_every=self.val_every or 0,
                d_init=d_init,
                checkpoint_every=self.checkpoint_every or 0,
                cache=self.cache,
                ckpt_key=dict(model=self.model_name, kind="dp_train_state"),
                resume=self.resume,
                blocked=self.blocked,
            )
            # Mirror the DP run's layout into the introspection flag (every
            # other training path sets it; see the _learn_gd reset note).
            self.trained_blocked = bool(history.get("blocked", False))
            self._save(d, v, history)
            return
        if self.method == "alter":
            self._learn_alter(data_train, data_val)
        elif self._should_stream(data_train):
            self._learn_gd_streamed(data_train, data_val)
        else:
            self._learn_gd(data_train, data_val)

    # Keep the whole dataset resident in HBM (fastest: zero H2D inside the
    # epoch) unless it exceeds this budget, in which case batches stream
    # from the host with a device-put lookahead. The pre-sliced epoch path
    # materializes a second (shuffled) copy of the dataset per epoch, so
    # the budget is half the old 8 GiB to keep peak usage on a 16 GB chip
    # unchanged.
    RESIDENT_BYTES_LIMIT = 4 << 30

    def _should_stream(self, data_train) -> bool:
        if self.stream is not None:
            return self.stream
        ds = as_array_dataset(data_train)
        return ds.images.nbytes > self.RESIDENT_BYTES_LIMIT

    @staticmethod
    def _is_path_dataset(data) -> bool:
        """Folder-of-JPEGs datasets (ImageNetFolder-like: .samples of
        (path, label)) train from raw files via the native loader."""
        return hasattr(data, "samples") and not hasattr(data, "images")

    def _dispatch_folder(self, folder, data_val):
        """Route a path-backed dataset: native streaming when the C++
        loader is available and the config allows (gd, no mesh), otherwise
        materialize to arrays and fall through.

        Returns (data_train, data_val) to continue with, or (None, None)
        when training completed natively. Reference analog: the
        pinned-memory multiprocess DataLoader feeding the training loop
        (adil.py:130, :362-364).
        """
        from ..runtime.host_loader import get_runtime

        runtime = get_runtime()
        if data_val is not None and self._is_path_dataset(data_val):
            data_val = data_val.materialize(runtime=runtime)
        if runtime is not None and self.method != "alter" and self.mesh is None \
                and self.stream is not False:
            self._learn_gd_from_folder(folder, data_val, runtime)
            return None, None
        # Fallback: decode everything up front (PIL when no native runtime).
        return folder.materialize(runtime=runtime), data_val

    def _load_warm_start(self):
        """Previous dictionary as initialization (adil.py:139-143)."""
        if not self.warm_start:
            return None
        prev = self.cache.load("ImageNet", model=self.model_name)
        return jnp.asarray(prev["d"]) if prev is not None else None

    def _blocked_victim(self, image_shape):
        """Blocked-input twin of the victim (same variables), or None.

        Only models exposing a ``blocked_input`` field (the ResNets) and
        even spatial dims qualify; anything else falls back to the
        standard layout. See tests/test_blocked_pipeline.py for the
        exact-equivalence proof obligations.
        """
        if not self.blocked:
            return None
        h, w = image_shape[0], image_shape[1]
        if h % 2 or w % 2:
            return None
        from ..models import blocked_twin

        return blocked_twin(self.victim)

    def _prepare(self, data_train, mode):
        ds = as_array_dataset(data_train)
        images = jnp.asarray(ds.images, jnp.float32)
        n = len(ds)
        key = self._loss_key()
        state = core.init_state(
            key, ds.image_shape, n, self.cfg, mode=mode,
            d_init=self._load_warm_start(),
        )
        return ds, images, n, key, state

    def _val_fooling(self, d: jax.Array, data_val) -> float:
        """Per-epoch validation: optimize fresh codes on val, count fooling
        (adil.py:199-205 -> forward_supervised_AdamW in 'train' mode)."""
        ds = as_array_dataset(data_val)
        if d.ndim == 2:  # flat training layout -> presentation shape
            d = core.d_image(d, ds.image_shape)
        total = 0.0
        b = self.cfg.batch_size
        for _, x, _ in ds.batches(b):
            k = x.shape[0]
            if k < b:
                # Pad the ragged tail by cycling rows: the jitted val solver
                # keeps ONE compiled shape (a second compile of the heaviest
                # inference solver costs minutes on the TPU tunnel — the
                # same hazard evaluation/harness.py pads against). The
                # tail's fooling is estimated as the padded batch's rate
                # scaled to k rows — exact when k divides b, otherwise rows
                # with an extra copy weigh slightly more; the bias is
                # bounded by the tail fraction of ONE batch over the whole
                # val set, fine for a per-epoch progress metric
                # (adil.py:199-205).
                reps = -(-b // k)
                x = np.concatenate([np.asarray(x)] * reps)[:b]
                total += float(
                    self._val_fn(self.victim.variables, d,
                                 jnp.asarray(x, jnp.float32))
                ) * (k / b)
            else:
                total += float(
                    self._val_fn(self.victim.variables, d,
                                 jnp.asarray(x, jnp.float32))
                )
        return total / len(ds)

    # -- mid-training checkpointing (step-level resume; the reference only
    # -- supports warm-starting from a finished dictionary, adil.py:139-143)

    def _train_ckpt_key(self):
        # Blocked-layout runs checkpoint under their own kind: the stored
        # flat d/moments are column-permuted, so resuming one into a
        # standard-layout run (or vice versa) would silently scramble D.
        kind = "train_state_s2d" if getattr(self, "_train_blocked", False) \
            else "train_state"
        return dict(model=self.model_name, kind=kind)

    def _save_train_state(self, state, key, loss_all, fooling_all):
        from flax import serialization

        payload = {
            "d": np.asarray(state.d),
            "v": np.asarray(state.v),
            "opt_state": serialization.to_state_dict(state.opt_state),
            "epoch": int(state.epoch),
            "rng": np.asarray(key),
            "loss": np.asarray(loss_all, np.float64),
            "fooling": np.asarray(fooling_all, np.float64),
        }
        self.cache.save(payload, "ImageNet", **self._train_ckpt_key())

    def _restore_train_state(self, template_state):
        from flax import serialization

        payload = self.cache.load("ImageNet", **self._train_ckpt_key())
        if payload is None:
            return None
        opt_state = serialization.from_state_dict(
            template_state.opt_state, payload["opt_state"]
        )
        state = template_state.replace(
            d=jnp.asarray(payload["d"]).reshape(template_state.d.shape),
            v=jnp.asarray(payload["v"]),
            opt_state=opt_state,
            epoch=jnp.asarray(payload["epoch"], jnp.int32),
        )
        return (
            state,
            jnp.asarray(payload["rng"]),
            list(payload["loss"]),
            list(payload["fooling"]),
        )

    def _clear_train_state(self):
        self.cache.remove("ImageNet", **self._train_ckpt_key())

    def _resolve_pipeline(self, images, state) -> bool:
        """Resolve pipeline_epochs='auto' against the device memory budget.

        Depth-1 pipelining keeps a second presliced epoch plus a device-side
        state snapshot resident, roughly doubling the training footprint.
        'auto' enables it only when dataset + two preslices + state + its
        snapshot (+ in-flight copy) fit comfortably (<60% of HBM) — a
        resident run near the memory edge keeps the serial loop instead of
        trading an OOM for a ~20% throughput win.
        """
        if self.pipeline_epochs != "auto":
            return bool(self.pipeline_epochs)
        img_bytes = images.size * images.dtype.itemsize
        state_bytes = sum(
            l.size * l.dtype.itemsize
            for l in jax.tree_util.tree_leaves(state)
        )
        need = 3 * img_bytes + 3 * state_bytes
        return need < 0.6 * _device_memory_budget()

    def _learn_gd(self, data_train, data_val):
        """Joint projected-AdamW over (D, v). Reference: adil.py:114-210."""
        ds, images, n, key, state = self._prepare(data_train, "gd")
        # Blocked-layout fast path: train in the s2d stem's compute layout
        # (images space-to-depth'd, D columns permuted to match) when the
        # victim supports it — exact trajectory equivalence proven in
        # tests/test_blocked_pipeline.py; artifacts are unblocked below.
        twin = self._blocked_victim(ds.image_shape)
        self._train_blocked = twin is not None
        # Persistent record of the dispatch (the working flag above is
        # cleared once artifacts are presented) — introspection for users
        # and tests.
        self.trained_blocked = self._train_blocked
        if twin is not None:
            from ..models.layers import space_to_depth

            images = space_to_depth(images)
            d_b = space_to_depth(core.d_image(state.d, ds.image_shape))
            state = state.replace(d=d_b.reshape(state.d.shape))
            apply_fn, variables = twin.apply_fn, twin.variables
        else:
            apply_fn, variables = self.victim.apply_fn, self.victim.variables
        labels = core.predict_labels(apply_fn, variables, images)
        if self.cfg.perturb_dtype == "bfloat16":
            # Keep the resident dataset in the compute dtype: halves the
            # per-epoch preslice traffic and removes a per-step 38 MB cast
            # (the step casts x to bf16 anyway; labels above were computed
            # from the fp32 originals). Class-API e2e measured 29.7 ->
            # ~20 ms/step from this alone (BENCHMARKS.md round 2).
            images = images.astype(jnp.bfloat16)
        # Pre-sliced epochs: one whole-dataset gather per epoch, then a
        # gather-free scan — faster than both the in-scan-gather epoch and
        # per-step dispatch (BENCHMARKS.md round 2). Trajectory-identical to
        # make_epoch_fn on the same batches (tests/test_train_scan.py).
        # The 'swept' variant traces eps/kappa so a hyper grid over them
        # (demo_dL_attack.py:88-94) shares one compile.
        epoch_fn = core.make_epoch_fn_presliced_swept(apply_fn, self.cfg, "both")
        loss_all, fooling_all, val_fool = [], [], None
        timer = StepTimer(warmup=1)

        start_epoch = 0
        if self.resume and self.checkpoint_every:
            restored = self._restore_train_state(state)
            if restored is not None:
                state, key, loss_all, fooling_all = restored
                start_epoch = int(state.epoch)
                if self.verbose:
                    print(f"[adil gd] resumed at epoch {start_epoch}")

        def process(t, loss, fooling, key_t, state_after):
            """Host bookkeeping for epoch t (forces the device scalars).

            Returns True when the reference's convergence rule fires
            (adil.py:207) — the caller then adopts ``state_after`` (the
            state right after epoch t) as the final state, exactly as the
            serial loop would.
            """
            nonlocal val_fool
            loss_all.append(float(loss) / n)
            fooling_all.append(float(fooling) / n)
            if data_val is not None and self.val_every and (t + 1) % self.val_every == 0:
                val_fool = self._val_fooling(
                    self._present_d(state_after.d, ds.image_shape), data_val
                )
            self.metrics.log(t, loss=loss_all[-1], fooling=fooling_all[-1],
                             val_fooling=val_fool if val_fool is not None else float("nan"))
            if self.verbose:
                print(f"[adil gd] epoch {t} loss {loss_all[-1]:.4f} fooling {fooling_all[-1]:.3f} val {val_fool}")
            if self.checkpoint_every and (t + 1) % self.checkpoint_every == 0:
                self._save_train_state(state_after, key_t, loss_all, fooling_all)
            # Convergence: |Δloss| < tol (adil.py:207).
            return t > 1 and abs(loss_all[-1] - loss_all[-2]) < self.cfg.tol

        if self._resolve_pipeline(images, state):
            # Depth-1 pipeline: dispatch epoch t, THEN force epoch t-1's
            # scalars — the per-epoch host work (batch permutation +
            # preslice dispatch + readback round-trips, ~40 ms on the
            # tunnel) overlaps device compute instead of stalling it.
            # Exactness: epoch t-1's post-state is snapshotted (device-side
            # copy) before its buffers are donated into epoch t, so a
            # convergence stop at t-1 returns precisely the serial state.
            pending = None  # (t, loss, fooling, key_after_split_t)
            snap = None
            t_mark = time.perf_counter()
            stopped = False
            for it in range(start_epoch, self.cfg.steps):
                key, sub = jax.random.split(key)
                batches = core.make_batches(sub, n, self.cfg.batch_size)
                xs, labels_b, idx_b = core.preslice_epoch(images, labels, batches)
                if pending is not None:
                    snap = jax.tree_util.tree_map(jnp.copy, state)
                with annotate("adil/epoch"):
                    state, loss, fooling = epoch_fn(
                        state, variables, xs, labels_b, idx_b
                    )
                if pending is not None:
                    stop = process(*pending, state_after=snap)
                    now = time.perf_counter()
                    timer.record(now - t_mark)
                    t_mark = now
                    if stop:
                        state, stopped = snap, True
                        break
                pending = (it, loss, fooling, key)
            if pending is not None and not stopped:
                process(*pending, state_after=state)
                timer.record(time.perf_counter() - t_mark)
        else:
            for it in range(start_epoch, self.cfg.steps):
                key, sub = jax.random.split(key)
                batches = core.make_batches(sub, n, self.cfg.batch_size)
                xs, labels_b, idx_b = core.preslice_epoch(images, labels, batches)
                with timer.step(), annotate("adil/epoch"):
                    state, loss, fooling = epoch_fn(
                        state, variables, xs, labels_b, idx_b
                    )
                    jax.block_until_ready(loss)
                if process(it, loss, fooling, key, state_after=state):
                    break

        self.timing = timer.summary()
        self._save(self._present_d(state.d, ds.image_shape), state.v, {
            "loss": loss_all, "fooling_rate": fooling_all, "val_fooling": val_fool,
        })
        if self.checkpoint_every:
            self._clear_train_state()
        self._train_blocked = False

    def _present_d(self, d_flat: jax.Array, image_shape) -> jax.Array:
        """Flat training dictionary -> presentation (K, H, W, C), undoing
        the blocked column permutation when this run trains blocked."""
        if getattr(self, "_train_blocked", False):
            from ..models.layers import depth_to_space

            h, w, c = image_shape
            return depth_to_space(
                core.d_image(d_flat, (h // 2, w // 2, 4 * c))
            )
        return core.d_image(d_flat, image_shape)

    def _learn_gd_streamed(self, data_train, data_val):
        """Joint projected-AdamW with host-streamed batches.

        Same update semantics as :meth:`_learn_gd`, but images stay on the
        host and batches flow through a double-buffered device-put lookahead
        (data/pipeline.py) — the path for datasets larger than HBM (e.g. the
        full-ImageNet-val universal dictionary, BASELINE.json config 4). The
        reference's analog is the pinned-memory DataLoader (adil.py:130).
        """
        # This path always trains in the STANDARD layout: reset the blocked
        # flags so a prior (possibly crashed) blocked run can't leak its
        # s2d checkpoint kind or stale introspection into this one.
        self._train_blocked = False
        self.trained_blocked = False
        import numpy as np

        from ..data import prefetch_to_device

        ds = as_array_dataset(data_train)
        n = len(ds)
        key = self._loss_key()
        state = core.init_state(
            key, ds.image_shape, n, self.cfg, mode="gd",
            d_init=self._load_warm_start(),
        )
        step_fn = jax.jit(
            core.make_train_step(self.victim.apply_fn, self.cfg, "both"),
            donate_argnums=(0,),
        )

        # One streaming pass for clean labels.
        labels_host = np.empty((n,), np.int64)
        predict = core._predict_fn(self.victim.apply_fn)
        for idx, x, _ in ds.batches(self.cfg.batch_size):
            labels_host[idx] = np.asarray(
                predict(self.victim.variables, jnp.asarray(x, jnp.float32))
            )

        loss_all, fooling_all, val_fool = [], [], None
        timer = StepTimer(warmup=1)
        bsz = self.cfg.batch_size

        start_epoch = 0
        if self.resume and self.checkpoint_every:
            restored = self._restore_train_state(state)
            if restored is not None:
                state, key, loss_all, fooling_all = restored
                start_epoch = int(state.epoch)
                if self.verbose:
                    print(f"[adil gd/stream] resumed at epoch {start_epoch}")

        for it in range(start_epoch, self.cfg.steps):
            def host_batches(seed):
                for idx, x, _ in ds.batches(bsz, shuffle=True, seed=seed):
                    pad = bsz - len(idx)
                    mask = np.ones((bsz,), np.float32)
                    if pad:
                        mask[len(idx):] = 0.0
                        idx = np.concatenate([idx, np.zeros((pad,), idx.dtype)])
                        x = np.concatenate(
                            [x, np.zeros((pad,) + x.shape[1:], x.dtype)]
                        )
                    yield (
                        np.asarray(x, np.float32), labels_host[idx],
                        np.asarray(idx, np.int32), mask,
                    )

            sums = _WindowedSums()
            with timer.step(), annotate("adil/epoch_streamed"):
                for x, lab, idx, mask in prefetch_to_device(
                    host_batches(self.seed + it), size=2
                ):
                    state, loss, fooling = step_fn(
                        state, self.victim.variables, x, lab, idx, mask
                    )
                    sums.push(loss, fooling)
                loss_sum, fool_sum = sums.flush()
            state = state.replace(epoch=state.epoch + 1)
            loss_all.append(loss_sum / n)
            fooling_all.append(fool_sum / n)
            if data_val is not None and self.val_every and (it + 1) % self.val_every == 0:
                val_fool = self._val_fooling(state.d, data_val)
            self.metrics.log(it, loss=loss_all[-1], fooling=fooling_all[-1],
                             val_fooling=val_fool if val_fool is not None else float("nan"))
            if self.verbose:
                print(f"[adil gd/stream] epoch {it} loss {loss_all[-1]:.4f} "
                      f"fooling {fooling_all[-1]:.3f} val {val_fool}")
            if self.checkpoint_every and (it + 1) % self.checkpoint_every == 0:
                self._save_train_state(state, key, loss_all, fooling_all)
            if it > 1 and abs(loss_all[-1] - loss_all[-2]) < self.cfg.tol:
                break

        self.timing = timer.summary()
        self._save(core.d_image(state.d, ds.image_shape), state.v, {
            "loss": loss_all, "fooling_rate": fooling_all, "val_fooling": val_fool,
        })
        if self.checkpoint_every:
            self._clear_train_state()

    def _learn_gd_from_folder(self, folder, data_val, runtime):
        """Joint projected-AdamW fed directly from raw JPEGs.

        The config-4 shape (folder of files -> dictionary) without
        pre-materializing arrays: the C++ thread-pool loader
        (native/host_loader.cpp) decodes/resizes/crops into a ring buffer,
        batches flow through the device-put lookahead, and per-image v rows
        are addressed by the loader's native row indices. Same update
        semantics as :meth:`_learn_gd`. Reference: the num_workers=4
        pinned-memory DataLoader feeding learn_dictionary (adil.py:130,
        :362-364).
        """
        # Standard layout only (see _learn_gd_streamed note).
        self._train_blocked = False
        self.trained_blocked = False
        import numpy as np

        from ..data import prefetch_to_device
        from ..runtime.host_loader import HostLoader

        paths = [p for p, _ in folder.samples]
        n = len(paths)
        size = folder.image_size
        bsz = min(self.cfg.batch_size, n)
        key = self._loss_key()
        state = core.init_state(
            key, (size, size, 3), n, self.cfg, mode="gd",
            d_init=self._load_warm_start(),
        )
        step_fn = jax.jit(
            core.make_train_step(self.victim.apply_fn, self.cfg, "both"),
            donate_argnums=(0,),
        )
        predict = core._predict_fn(self.victim.apply_fn)

        # One native streaming pass for clean labels (precomputed once; the
        # documented intent-fix of the reference's per-step re-labeling,
        # adil.py:172).
        labels_host = np.zeros((n,), np.int64)
        loader = HostLoader(runtime, paths, [0] * n, bsz, size, shuffle=False)
        for _, x, labs, idxs in loader.iter_indexed():
            valid = labs != -1  # keep decode failures out of the v rows too
            preds = np.asarray(predict(self.victim.variables, jnp.asarray(x)))
            ok = valid & (labs != -2)
            labels_host[idxs[ok]] = preds[ok]
        loader.close()

        loss_all, fooling_all, val_fool = [], [], None
        timer = StepTimer(warmup=1)

        start_epoch = 0
        if self.resume and self.checkpoint_every:
            restored = self._restore_train_state(state)
            if restored is not None:
                state, key, loss_all, fooling_all = restored
                start_epoch = int(state.epoch)
                if self.verbose:
                    print(f"[adil gd/native] resumed at epoch {start_epoch}")

        for it in range(start_epoch, self.cfg.steps):
            loader = HostLoader(
                runtime, paths, labels_host.tolist(), bsz, size,
                shuffle=True, seed=self.seed + 7919 * (it + 1),
            )

            def host_batches():
                for _, x, labs, idxs in loader.iter_indexed():
                    mask = ((labs != -1) & (labs != -2)).astype(np.float32)
                    idx = np.maximum(idxs, 0).astype(np.int32)
                    yield x, np.maximum(labs, 0), idx, mask

            # Same bounded-window async readback as the streamed path: keeps
            # the decode thread + H2D lookahead fed instead of stalling them
            # on a per-step readback.
            sums = _WindowedSums()
            with timer.step(), annotate("adil/epoch_native"):
                for x, lab, idx, mask in prefetch_to_device(host_batches(), size=2):
                    state, loss, fooling = step_fn(
                        state, self.victim.variables, x, lab, idx, mask
                    )
                    sums.push(loss, fooling)
                loss_sum, fool_sum = sums.flush()
            loader.close()
            state = state.replace(epoch=state.epoch + 1)
            loss_all.append(loss_sum / n)
            fooling_all.append(fool_sum / n)
            if data_val is not None and self.val_every and (it + 1) % self.val_every == 0:
                val_fool = self._val_fooling(state.d, data_val)
            self.metrics.log(it, loss=loss_all[-1], fooling=fooling_all[-1],
                             val_fooling=val_fool if val_fool is not None else float("nan"))
            if self.verbose:
                print(f"[adil gd/native] epoch {it} loss {loss_all[-1]:.4f} "
                      f"fooling {fooling_all[-1]:.3f} val {val_fool}")
            if self.checkpoint_every and (it + 1) % self.checkpoint_every == 0:
                self._save_train_state(state, key, loss_all, fooling_all)
            if it > 1 and abs(loss_all[-1] - loss_all[-2]) < self.cfg.tol:
                break

        self.timing = timer.summary()
        self._save(core.d_image(state.d, (size, size, 3)), state.v, {
            "loss": loss_all, "fooling_rate": fooling_all, "val_fooling": val_fool,
        })
        if self.checkpoint_every:
            self._clear_train_state()

    def _learn_alter(self, data_train, data_val):
        """Alternating v-phase / d-phase. Reference: adil.py:212-332.

        Documented intent fix: the convergence/tracking metric here is the
        NORMALIZED EPOCH SUM of the final d-pass (matching the gd path,
        adil.py:189-193). The reference's d-step accidentally records only
        the LAST batch's loss — its ``loss_full += loss`` block sits outside
        the batch loop (adil.py:311-314), unlike the gd path where the same
        block is inside it — so its |Δloss| < 1e-6 stop compares noisy
        single-batch values and effectively never fires with batch_size < n.
        We implement the gd-path semantics on purpose; stop epochs can
        therefore differ from the reference for method='alter'.
        """
        # Standard layout only (see _learn_gd_streamed note).
        self._train_blocked = False
        self.trained_blocked = False
        ds, images, n, key, state = self._prepare(data_train, "alter")
        labels = core.predict_labels(self.victim.apply_fn, self.victim.variables, images)
        # Pre-sliced epochs, same as _learn_gd (one dataset gather per
        # epoch, gather-free scan — tests/test_train_scan.py), with
        # eps/kappa sweep compile-reuse. Preslicing keeps a second dataset
        # copy in HBM, so fall back to the in-scan-gather epoch for
        # datasets past the residency budget (alter has no streamed
        # variant — the reference's alter path is resident-only too,
        # adil.py:212-332).
        presliced = ds.images.nbytes <= self.RESIDENT_BYTES_LIMIT
        if presliced:
            epoch_v = core.make_epoch_fn_presliced_swept(self.victim.apply_fn, self.cfg, "v")
            epoch_d = core.make_epoch_fn_presliced_swept(self.victim.apply_fn, self.cfg, "d")
        else:
            epoch_v = core.make_epoch_fn(self.victim.apply_fn, self.cfg, "v")
            epoch_d = core.make_epoch_fn(self.victim.apply_fn, self.cfg, "d")

        def run_epoch(fn, state, batches):
            if presliced:
                return fn(state, self.victim.variables,
                          *core.preslice_epoch(images, labels, batches))
            return fn(state, self.victim.variables, images, labels, batches)
        loss_all, fooling_all, val_fool = [], [], None
        timer = StepTimer(warmup=1)

        # state.epoch counts OUTER alternation rounds on this path (each
        # round runs 2*steps_inner epoch passes), so resume restarts at the
        # right round boundary.
        start_outer = 0
        if self.resume and self.checkpoint_every:
            restored = self._restore_train_state(state)
            if restored is not None:
                state, key, loss_all, fooling_all = restored
                start_outer = int(state.epoch)
                if self.verbose:
                    print(f"[adil alter] resumed at round {start_outer}")

        outer = max(self.cfg.steps // self.cfg.steps_inner, 1)
        for it in range(start_outer, outer):
            with timer.step():
                for _ in range(self.cfg.steps_inner):
                    key, sub = jax.random.split(key)
                    batches = core.make_batches(sub, n, self.cfg.batch_size)
                    state, loss_v, _ = run_epoch(epoch_v, state, batches)
                for _ in range(self.cfg.steps_inner):
                    key, sub = jax.random.split(key)
                    batches = core.make_batches(sub, n, self.cfg.batch_size)
                    state, loss_d, fooling = run_epoch(epoch_d, state, batches)
                jax.block_until_ready(loss_d)
            state = state.replace(epoch=jnp.asarray(it + 1, jnp.int32))
            loss_all.append(float(loss_d) / n)
            fooling_all.append(float(fooling) / n)
            if data_val is not None and self.val_every and (it + 1) % self.val_every == 0:
                val_fool = self._val_fooling(state.d, data_val)
            if self.verbose:
                print(f"[adil alter] iter {it} loss {loss_all[-1]:.4f} fooling {fooling_all[-1]:.3f} val {val_fool}")
            if self.checkpoint_every and (it + 1) % self.checkpoint_every == 0:
                self._save_train_state(state, key, loss_all, fooling_all)
            if it > 1 and abs(loss_all[-1] - loss_all[-2]) < self.cfg.tol:
                break

        self.timing = timer.summary()
        self._save(core.d_image(state.d, ds.image_shape), state.v, {
            "loss": loss_all, "fooling_rate": fooling_all, "val_fooling": val_fool,
        })
        if self.checkpoint_every:
            self._clear_train_state()

    def _save(self, d, v, history):
        payload = {"d": np.asarray(d), "v": np.asarray(v)}
        # None history entries (e.g. no val set) are omitted — zero-size
        # placeholders break the orbax backend.
        payload.update({k: np.asarray(val) for k, val in history.items() if val is not None})
        self.cache.save(payload, "ImageNet", model=self.model_name)
        self.dictionary = jnp.asarray(d)
        self.history = history

    # -- inference --------------------------------------------------------

    def _load_dictionary(self) -> jax.Array:
        if self.dictionary is not None:
            return self.dictionary
        payload = self.cache.load("ImageNet", model=self.model_name)
        if payload is None:
            raise FileNotFoundError(
                f"no trained dictionary at {self.cache.path('ImageNet', model=self.model_name)}"
            )
        self.dictionary = jnp.asarray(payload["d"])
        return self.dictionary

    def _twin_solvers(self, twin):
        """Jitted supervised solvers against the blocked twin — the same
        module-level cache as the standard solvers (the twin's apply_fn is
        memoized on the victim, so sweeps share these compiles too).
        Unsupervised never routes here — it is sampling-bound."""
        fns = _solver_cache(twin.apply_fn, self.cfg)
        eps_t = jnp.float32(self.cfg.eps)
        kappa_t = jnp.float32(self.cfg.kappa)
        return {
            "ddrague": lambda variables, d, images: fns["ddrague"](
                variables, d, images, eps_t, kappa_t),
            "codes": lambda variables, d, images: fns["codes"](
                variables, d, images, eps_t, kappa_t),
        }

    def _blocked_dict(self, d):
        """Blocked-layout copy of the (fixed) dictionary, cached per d."""
        cached = getattr(self, "_blocked_d_cache", None)
        if cached is not None and cached[0] is d:
            return cached[1]
        from ..models.layers import space_to_depth

        d_b = space_to_depth(d)
        self._blocked_d_cache = (d, d_b)
        return d_b

    def _blocked_supervised(self, d, images, solver: str):
        """Run a supervised solver through the blocked twin, or None when
        the fast path doesn't apply. Exact under the column permutation:
        the Gram matrix (and so the DDrague pseudo-inverse), every
        elementwise clamp, and the per-image MSE are permutation-invariant
        (tests/test_blocked_pipeline.py proves the underlying
        gradient/forward equivalence)."""
        twin = self._blocked_victim(tuple(images.shape[1:]))
        if twin is None:
            return None
        from ..models.layers import depth_to_space, space_to_depth

        adv = self._twin_solvers(twin)[solver](
            twin.variables, self._blocked_dict(d), space_to_depth(images)
        )
        return depth_to_space(adv)

    def forward(self, images: jax.Array, labels: jax.Array) -> jax.Array:
        """Attack a batch: learn lazily if needed, then dispatch on mode.

        Reference: adil.py:432-458 (forward).
        """
        if not self.cache.exists("ImageNet", model=self.model_name) and self.dictionary is None:
            # Lazy learn on the given batch (the reference's intent at
            # adil.py:438-442; its actual call is a missing method).
            self.learn_dictionary((np.asarray(images), np.asarray(labels)), None)
        d = self._load_dictionary()
        images = jnp.asarray(images, jnp.float32)
        if self.attack_mode == "supervised":
            adv = self._blocked_supervised(d, images, "ddrague")
            if adv is not None:
                return adv
            return self._ddrague_fn(self.victim.variables, d, images)
        self._rng_calls += 1
        key = jax.random.fold_in(self._loss_key(), self._rng_calls)
        # Unsupervised stays on the standard path: it is sampling-bound
        # (best-of-trials forwards, no input-gradients), so the blocked
        # stem-gradient win doesn't apply.
        return self._unsup_fn(self.victim.variables, d, images, key)

    # Direct access to the alternative supervised solver (adil.py:569-623).
    def forward_supervised_adamw(self, images: jax.Array) -> jax.Array:
        d = self._load_dictionary()
        images = jnp.asarray(images, jnp.float32)
        adv = self._blocked_supervised(d, images, "codes")
        if adv is not None:
            return adv
        return self._codes_fn(self.victim.variables, d, images)
