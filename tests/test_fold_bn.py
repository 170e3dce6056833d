"""BN folding must be numerically exact (eval-mode victims only)."""

import jax
import jax.numpy as jnp
import numpy as np

from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.models.fold import fold_victim, fold_victim_bn


def _randomize_bn(variables, seed=0):
    """Non-trivial BN stats/affine so folding bugs can't hide behind the
    mean=0/var=1/scale=1 init."""
    key = jax.random.PRNGKey(seed)

    def rec(tree, is_stats):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k.startswith("BatchNorm"):
                    nonlocal key
                    key, k1, k2 = jax.random.split(key, 3)
                    if is_stats:
                        out[k] = {
                            "mean": jax.random.normal(k1, v["mean"].shape) * 0.5,
                            "var": jax.random.uniform(k2, v["var"].shape, minval=0.5, maxval=1.5),
                        }
                    else:
                        out[k] = {
                            "scale": jax.random.uniform(k1, v["scale"].shape, minval=0.5, maxval=1.5),
                            "bias": jax.random.normal(k2, v["bias"].shape) * 0.1,
                        }
                else:
                    out[k] = rec(v, is_stats)
            else:
                out[k] = v
        return out

    return {
        "params": rec(variables["params"], False),
        "batch_stats": rec(variables["batch_stats"], True),
    }


def _check(name, size=64, **kw):
    victim = create_model(name, rng=jax.random.PRNGKey(1), input_size=size, **kw)
    import dataclasses

    victim = dataclasses.replace(victim, variables=_randomize_bn(victim.variables))
    folded = fold_victim(victim)
    assert "batch_stats" not in folded.variables
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, size, size, 3))
    a = np.asarray(victim.apply_fn(victim.variables, x))
    b = np.asarray(folded.apply_fn(folded.variables, x))
    # NaN==NaN would make assert_allclose pass vacuously (inception at tiny
    # inputs collapses spatial dims to zero and averages over nothing).
    assert np.isfinite(a).all(), f"{name}: unfolded forward is not finite"
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_fold_resnet18():
    _check("resnet18")


def test_fold_resnet50_s2d():
    _check("resnet50", stem_s2d=True)


def test_fold_variables_structure():
    victim = create_model("resnet18", rng=jax.random.PRNGKey(1), input_size=64)
    folded_vars = fold_victim_bn(victim.variables)
    flat = jax.tree_util.tree_leaves_with_path(folded_vars)
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("BatchNorm" in n for n in names)


def test_fold_googlenet():
    # BasicConv2d eps=0.001 must be used in the fold (fold._MODEL_BN_EPS)
    _check("googlenet")


def test_fold_inception_v3():
    # 64px collapses InceptionD's VALID stride-2 convs to zero-size spatial
    # dims (all-NaN logits); 128 keeps every stage real.
    _check("inception_v3", size=128)


def test_fold_mobilenet_v2():
    _check("mobilenet_v2")


def test_fold_googlenet_s2d_stem():
    # fold + s2d stem compose (S2DStem's fold path with the 1e-3 stem eps)
    _check("googlenet", stem_s2d=True)
