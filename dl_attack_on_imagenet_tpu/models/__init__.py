"""Victim model zoo: Flax/NHWC classifiers + frozen-victim wrapper.

Mirrors the reference's model-selection block (main.py:40-58 /
demo_dL_attack.py:41-59): a name picks a classifier, an in-graph
normalization layer is prepended, and the result is a frozen function from
[0,1] pixel-space images to logits. Gradients flow *through* the victim to
the perturbation parameters, never to its weights — so the wrapper exposes a
pure ``apply_fn`` that attacks can close over under ``jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .densenet import densenet121, densenet169
from .googlenet import googlenet
from .inception import inception_v3
from .layers import IMAGENET_MEAN, IMAGENET_STD, Normalize
from .mobilenet import mobilenet_v2
from .resnet import resnet18, resnet34, resnet50
from .tiny import tiny_cnn
from .vgg import vgg11, vgg16, vgg19
from .vit import vit_b16, vit_tiny

# name -> (constructor, default input size). The short aliases match the
# reference CLI names (main.py:41-52: 'resnet' means resnet18, etc.).
MODEL_REGISTRY = {
    "resnet": (resnet18, 224),
    "resnet18": (resnet18, 224),
    "resnet34": (resnet34, 224),
    "resnet50": (resnet50, 224),
    "densenet": (densenet121, 224),
    "densenet121": (densenet121, 224),
    "densenet169": (densenet169, 224),
    "googlenet": (googlenet, 224),
    "inception": (inception_v3, 299),
    "inception_v3": (inception_v3, 299),
    "mobilenet": (mobilenet_v2, 224),
    "mobilenet_v2": (mobilenet_v2, 224),
    "vgg": (vgg11, 224),
    "vgg11": (vgg11, 224),
    "vgg16": (vgg16, 224),
    "vgg19": (vgg19, 224),
    "vit": (vit_b16, 224),
    "vit_b16": (vit_b16, 224),
    "vit_tiny": (vit_tiny, 224),
    "tiny": (tiny_cnn, 32),
}


def blanket_input_size(name: str, override: Optional[int] = None) -> Optional[int]:
    """Resolve the CLI input size to the reference's operating point.

    The reference feeds ONE blanket Resize(256)+CenterCrop(224) transform
    to every victim including inception_v3 (DS_ImageNet.py:14-18,
    main.py:47-48), so ImageNet-scale victims default to 224; small test
    victims (tiny, 32x32) keep their native size; an explicit ``override``
    always wins (e.g. 299 for Inception's native input).
    """
    if override:
        return override
    entry = MODEL_REGISTRY.get(name.lower())
    if entry is not None and entry[1] >= 224:
        return 224
    return None


def fast_victim_kwargs(name: str) -> dict:
    """Per-architecture exact-math fast knobs for ``create_model``.

    All mathematically identical to the plain build (tests/test_s2d_stem.py,
    tests/test_fold_bn.py; measured in BENCHMARKS.md round 3): ResNets and
    GoogLeNet take stem_s2d + fold_bn, DenseNet shares the same 7x7/s2 stem
    so stem_s2d applies, Inception/MobileNet fold their eval-mode BNs.
    Returns {} for architectures with no applicable knobs (vgg, vit, tiny).
    Used by ``cli.demo --fast-victim`` and ``cli.generate --fast-victim``.
    """
    key = name.lower()
    if "resnet" in key or "googlenet" in key:
        return dict(stem_s2d=True, fold_bn=True)
    if "densenet" in key:
        return dict(stem_s2d=True)
    if "inception" in key or "mobilenet" in key:
        return dict(fold_bn=True)
    return {}


@dataclasses.dataclass
class VictimModel:
    """A frozen classifier over [0,1] NHWC images.

    ``apply_fn(variables, x)`` is pure (safe to close over in jit); the
    convenience ``__call__`` binds the stored variables.
    """

    name: str
    module: Any
    variables: Any
    input_size: int
    num_classes: int
    apply_fn: Callable[[Any, jax.Array], jax.Array]
    # Normalization actually baked into apply_fn — recorded so twins
    # (e.g. ADIL._blocked_victim) can rebuild an equivalent wrapper.
    normalize: bool = True
    mean: Any = IMAGENET_MEAN
    std: Any = IMAGENET_STD

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.apply_fn(self.variables, x)

    def predict(self, x: jax.Array) -> jax.Array:
        """Hard labels — the reference constantly re-labels with
        ``model(x).argmax`` (adil.py:172 etc.)."""
        return jnp.argmax(self(x), axis=-1)


def create_model(
    name: str,
    num_classes: int = 1000,
    dtype=jnp.float32,
    rng: Optional[jax.Array] = None,
    input_size: Optional[int] = None,
    normalize: bool = True,
    variables: Any = None,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    **model_kwargs,
) -> VictimModel:
    """Build a victim by registry name, with ImageNet normalization in-graph.

    If ``variables`` is None the model is randomly initialized (no pretrained
    weights ship in this environment; use ``models.convert`` to import a
    torch checkpoint).
    """
    key = name.lower()
    if key not in MODEL_REGISTRY:
        raise ValueError(f"unknown model '{name}'; known: {sorted(MODEL_REGISTRY)}")
    ctor, default_size = MODEL_REGISTRY[key]
    size = input_size or default_size
    if key == "tiny":
        module = ctor(num_classes=min(num_classes, 10), dtype=dtype, **model_kwargs)
        norm = False
    else:
        module = ctor(num_classes=num_classes, dtype=dtype, **model_kwargs)
        norm = normalize
    # blocked_input models consume the space-to-depth layout
    # (N, size/2, size/2, 12); the parameter tree is identical to the
    # unblocked model (see resnet.S2DStem.blocked_input).
    blocked = bool(model_kwargs.get("blocked_input"))
    if variables is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if blocked:
            dummy = jnp.zeros((1, size // 2, size // 2, 12), dtype)
        else:
            dummy = jnp.zeros((1, size, size, 3), dtype)
        variables = module.init(rng, dummy)

    if norm:
        reps = 4 if blocked else 1  # blocked channel order is (ki, kj, c)
        mean_arr = jnp.tile(jnp.asarray(mean), reps).reshape(1, 1, 1, -1)
        std_arr = jnp.tile(jnp.asarray(std), reps).reshape(1, 1, 1, -1)

        def apply_fn(vars_, x):
            xn = (x - mean_arr.astype(x.dtype)) / std_arr.astype(x.dtype)
            return module.apply(vars_, xn)

    else:

        def apply_fn(vars_, x):
            return module.apply(vars_, x)

    # Jit once: VictimModel.__call__/predict run in eval/serving hot loops
    # (nested jit inside attack jits simply inlines).
    apply_fn = jax.jit(apply_fn)

    return VictimModel(
        name=key,
        module=module,
        variables=variables,
        input_size=size,
        num_classes=module.num_classes,
        apply_fn=apply_fn,
        normalize=norm,
        mean=mean,
        std=std,
    )


def blocked_twin(victim: VictimModel):
    """Blocked-input twin of a victim (same variables, same normalization),
    memoized on the victim, or None when unsupported.

    Supported when the victim's module exposes ``blocked_input`` AND its
    parameter tree already contains the S2DStem (``stem_s2d`` or
    ``blocked_input`` set) — a plain ConvBN-stem ResNet stores its stem
    under a different scope and cannot share variables with the twin.
    The memoization matters beyond speed: the twin's ``apply_fn`` identity
    is the compile-cache key for the swept training epochs.
    """
    module = victim.module
    if not (getattr(module, "stem_s2d", False)
            or getattr(module, "blocked_input", False)):
        return None
    twin = getattr(victim, "_blocked_twin", None)
    if twin is not None:
        return twin
    kwargs = {}
    # Only forward module config the victim's constructor actually carries
    # (DenseNet has no fold_bn; GoogLeNet's transform_input must survive).
    for field in ("fold_bn", "transform_input"):
        if hasattr(module, field):
            kwargs[field] = getattr(module, field)
    try:
        twin = create_model(
            victim.name,
            num_classes=victim.num_classes,
            dtype=module.dtype,
            variables=victim.variables,
            input_size=victim.input_size,
            blocked_input=True,
            normalize=victim.normalize,
            mean=victim.mean,
            std=victim.std,
            **kwargs,
        )
    except TypeError:
        return None
    victim._blocked_twin = twin
    return twin


__all__ = [
    "MODEL_REGISTRY",
    "VictimModel",
    "blanket_input_size",
    "create_model",
    "fast_victim_kwargs",
    "blocked_twin",
    "Normalize",
    "resnet18",
    "resnet34",
    "resnet50",
    "densenet121",
    "densenet169",
    "googlenet",
    "inception_v3",
    "mobilenet_v2",
    "vgg11",
    "vgg16",
    "vgg19",
    "vit_b16",
    "vit_tiny",
    "tiny_cnn",
]
