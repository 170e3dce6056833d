"""CLI victim builder: --weights conversion order + --fast-victim knobs.

The reference's entry points always run torchvision pretrained victims
(main.py:41-52); cli._victim.build_victim is the rebuild's counterpart —
it must convert a torch state_dict onto the registry victim, and with
--fast-victim must convert onto the UNFOLDED tree before applying the BN
fold (a checkpoint has no counterpart for folded kernel+bias params).
"""

import argparse

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dl_attack_on_imagenet_tpu.cli._victim import build_victim
from dl_attack_on_imagenet_tpu.models import create_model, fast_victim_kwargs
from dl_attack_on_imagenet_tpu.models.convert import flax_to_torch_state_dict


def _args(**kw):
    ns = argparse.Namespace(model="resnet18", seed=0, input_size=64,
                            fast_victim=False, weights=None)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_fast_victim_kwargs_mapping():
    assert fast_victim_kwargs("resnet50") == {"stem_s2d": True, "fold_bn": True}
    assert fast_victim_kwargs("googlenet") == {"stem_s2d": True, "fold_bn": True}
    assert fast_victim_kwargs("densenet121") == {"stem_s2d": True}
    assert fast_victim_kwargs("inception_v3") == {"fold_bn": True}
    assert fast_victim_kwargs("mobilenet_v2") == {"fold_bn": True}
    assert fast_victim_kwargs("vgg11") == {}
    assert fast_victim_kwargs("vit_b16") == {}
    assert fast_victim_kwargs("tiny") == {}


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """A torch-format state_dict from a known resnet18 victim."""
    src = create_model("resnet18", rng=jax.random.PRNGKey(7), input_size=64)
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in flax_to_torch_state_dict(src.variables).items()}
    path = tmp_path_factory.mktemp("w") / "resnet18.pth"
    torch.save(sd, str(path))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3)))
    return str(path), src, x


def test_weights_flag_loads_checkpoint(checkpoint):
    path, src, x = checkpoint
    victim = build_victim(_args(weights=path, seed=11))
    np.testing.assert_allclose(
        np.asarray(victim(x)), np.asarray(src(x)), atol=1e-5
    )


def test_weights_with_fast_victim_converts_then_folds(checkpoint):
    path, src, x = checkpoint
    victim = build_victim(_args(weights=path, seed=11, fast_victim=True))
    # stem_s2d + fold_bn applied AFTER conversion: logits still match the
    # unfolded source to fold tolerance.
    assert victim.module.fold_bn and victim.module.stem_s2d
    np.testing.assert_allclose(
        np.asarray(victim(x)), np.asarray(src(x)), atol=2e-4
    )


def test_random_init_ignores_fold_ordering():
    """Without --weights, fast-victim builds fold_bn directly (random init)."""
    victim = build_victim(_args(fast_victim=True))
    assert victim.module.fold_bn and victim.module.stem_s2d


@pytest.mark.parametrize("mod", ["main", "demo", "generate"])
def test_argparsers_carry_victim_flags(mod):
    import importlib

    m = importlib.import_module(f"dl_attack_on_imagenet_tpu.cli.{mod}")
    extra = (["--data-root", "."] if mod == "demo" else [])
    args = m.build_argparser().parse_args(
        ["--model", "resnet18", "--weights", "w.pth", "--fast-victim"] + extra
    )
    assert args.weights == "w.pth" and args.fast_victim
