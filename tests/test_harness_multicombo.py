"""Multi-name / multi-combo ``get_performance`` + ``select_hyperparameter``.

VERDICT round-2 weak #4: the reference keys every instance of a name under
the LAST instance's sub_name (performance.py:134-151) and maps results back
to attacks by zip order (performance.py:51-110 consumes the dict in
insertion order). The rebuild keeps the last-instance-key quirk by
documented intent but must not silently misalign: ``group_key`` records the
input-name -> result-key mapping, ``sub_names`` records every instance's
own sub_name, and a cross-group key collision gets a disambiguating suffix.

Also pins the blanket-224 Inception operating point the reference actually
runs (DS_ImageNet.py:14-18 feeds Resize(256)+CenterCrop(224) to EVERY
victim including inception_v3; main.py:47-48): the CLI default input size
is 224 for all victims.
"""

import numpy as np
import pytest

from dl_attack_on_imagenet_tpu import evaluation as ev


class FakeAttack:
    """Stub attack whose ``eps`` attribute specializes its sub_name
    (harness._attack_key) so combos within a group get DISTINCT keys."""

    def __init__(self, victim, scale, eps=None):
        self.scale = scale
        if eps is not None:
            self.eps = eps
        self.victim = victim

    def __call__(self, x, y):
        import jax.numpy as jnp

        return jnp.clip(jnp.asarray(x) + self.scale, 0, 1)


@pytest.fixture(scope="module")
def victim():
    import jax

    from dl_attack_on_imagenet_tpu.models import create_model

    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def loader(victim):
    import jax

    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3)))
    y = np.asarray(victim.predict(x))
    return [(x, y)]


def test_distinct_subnames_do_not_collapse(victim, loader):
    """Two combos with distinct sub_names: group lists keep BOTH entries
    under the last instance's key, and sub_names records each combo."""
    atks = {
        "fake": [
            FakeAttack(victim, 0.01, eps=0.1),
            FakeAttack(victim, 0.2, eps=0.5),
        ]
    }
    out = ev.get_performance(atks, victim, loader)
    key = out["group_key"]["fake"]
    assert key == "fake_eps_0.5"  # reference quirk: LAST instance's sub_name
    assert len(out["mse"][key]) == 2  # nothing collapsed
    assert out["sub_names"]["fake"] == ["fake_eps_0.1", "fake_eps_0.5"]


def test_multi_group_selection_maps_by_group_key(victim, loader):
    """Two attack names, each with two combos whose sub_names differ from
    the group name — selection must map results back per input name."""
    atks = {
        "small": [FakeAttack(victim, 0.01, eps=1), FakeAttack(victim, 0.02, eps=2)],
        "big": [FakeAttack(victim, 0.2, eps=1), FakeAttack(victim, 0.4, eps=2)],
    }
    selected, perf, validation = ev.select_hyperparameter(
        atks, victim, loader, budget=[0.0], criterion="mse"
    )
    k_small = validation["group_key"]["small"]
    k_big = validation["group_key"]["big"]
    assert k_small != k_big
    # budget 0 + mse criterion -> each group picks its own smallest combo
    assert perf[0]["mse"][k_small] == pytest.approx(
        min(validation["mse"][k_small])
    )
    assert perf[0]["mse"][k_big] == pytest.approx(min(validation["mse"][k_big]))
    assert perf[0]["mse"][k_small] < perf[0]["mse"][k_big]
    # the selected instance is the group's own first (scale 0.01 / 0.2)
    assert selected[0][k_small][0] is atks["small"][0]
    assert selected[0][k_big][0] is atks["big"][0]


def test_cross_group_key_collision_gets_suffix(victim, loader):
    """A group literally named like another group's specialized sub_name
    would collide; the second arrival gets a disambiguating suffix and
    group_key still maps both correctly."""
    atks = {
        "fake": [FakeAttack(victim, 0.01, eps=9)],  # -> key "fake_eps_9"
        "fake_eps_9": [FakeAttack(victim, 0.2)],  # no attrs -> same key
    }
    out = ev.get_performance(atks, victim, loader)
    k1 = out["group_key"]["fake"]
    k2 = out["group_key"]["fake_eps_9"]
    assert k1 == "fake_eps_9"
    assert k2 == "fake_eps_9__fake_eps_9"
    assert k1 in out["mse"] and k2 in out["mse"]
    # Selection still resolves each input name to its own measurements.
    selected, perf, validation = ev.select_hyperparameter(
        atks, victim, loader, budget=[0.0], criterion="mse"
    )
    assert perf[0]["mse"][k1] == pytest.approx(validation["mse"][k1][0])
    assert perf[0]["mse"][k2] == pytest.approx(validation["mse"][k2][0])
    assert selected[0][k1][0] is atks["fake"][0]
    assert selected[0][k2][0] is atks["fake_eps_9"][0]


def test_cli_blanket_224_default():
    """All three CLIs resolve the default input size to the reference's
    blanket 224 for every ImageNet victim incl. inception
    (DS_ImageNet.py:14-18), keep the tiny test victim at its native size,
    and honor an explicit override."""
    from dl_attack_on_imagenet_tpu.cli import demo as demo_cli
    from dl_attack_on_imagenet_tpu.cli import generate as generate_cli
    from dl_attack_on_imagenet_tpu.cli import main as main_cli
    from dl_attack_on_imagenet_tpu.models import blanket_input_size

    for mod in (demo_cli, main_cli, generate_cli):
        args = mod.build_argparser().parse_args(["--model", "inception_v3"])
        assert blanket_input_size("inception_v3", args.input_size) == 224
        args299 = mod.build_argparser().parse_args(
            ["--model", "inception_v3", "--input-size", "299"]
        )
        assert blanket_input_size("inception_v3", args299.input_size) == 299
    # Every ImageNet victim pins to 224; the 32x32 test victim does not.
    assert blanket_input_size("resnet18", None) == 224
    assert blanket_input_size("inception", None) == 224
    assert blanket_input_size("tiny", None) is None


def test_create_model_inception_blanket_224():
    """create_model honors the 224 override for inception (the registry's
    native default is 299)."""
    import jax

    from dl_attack_on_imagenet_tpu.models import MODEL_REGISTRY, create_model

    assert MODEL_REGISTRY["inception_v3"][1] == 299  # native default kept
    victim = create_model(
        "inception_v3", rng=jax.random.PRNGKey(0), input_size=224
    )
    assert victim.input_size == 224
    x = jax.numpy.zeros((1, 224, 224, 3))
    logits = victim(x)
    assert logits.shape == (1, 1000)
    assert bool(jax.numpy.isfinite(logits).all())
