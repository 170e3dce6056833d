"""Reference-shaped grid over the round-3 attack families through the full
harness (VERDICT r3 missing #4).

The reference workflow is "uncomment a row of the torchattacks grid and run
it through get_atks -> get_performance -> select_hyperparameter"
(performance.py:116-151, :51-110; demo_dL_attack.py:96-143). This drives
one grid containing ADIL + CW(c-grid) + APGD + Square + FAB + OnePixel
through exactly that pipeline on the tiny victim, and pins:

- per-instance sub_names (the CW c-grid yields DISTINCT sub_names — the
  `_attack_key` widening via get_atks' recorded ``_grid_combo``);
- per-instance timings of the right arity (performance.py:136-144);
- selection indices lining up with the instances actually measured.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_attack_on_imagenet_tpu import evaluation as ev
from dl_attack_on_imagenet_tpu.attacks import ADIL, APGD, CW, FAB, OnePixel, Square
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.utils import ArtifactCache


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture(scope="module")
def dataset(victim):
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3)))
    y = np.asarray(victim.predict(x))  # all rows correctly classified
    return ArrayDataset(x, y)


@pytest.fixture(scope="module")
def loader(dataset):
    return [(dataset.images, dataset.labels)]


@pytest.fixture(scope="module")
def grid(victim, dataset, tmp_path_factory):
    cache = ArtifactCache(str(tmp_path_factory.mktemp("grid_cache")))
    eps = 8 / 255
    return {
        # the reference's own swept row (demo_dL_attack.py:114-118)
        "adil": ev.get_atks(
            victim, ADIL, "n_atoms", [4], "kappa", [10.0],
            loss="logits", steps=2, batch_size=8, data_train=dataset,
            steps_inference=3, cache=cache, model_name="gridtiny",
        ),
        # the commented c-grid row (demo_dL_attack.py:129)
        "cw": ev.get_atks(victim, CW, "c", [0.1, 1.0], steps=5),
        "apgd": ev.get_atks(victim, APGD, "eps", [eps], steps=5),
        "square": ev.get_atks(victim, Square, "eps", [eps], n_queries=30),
        "fab": ev.get_atks(victim, FAB, "eps", [eps], steps=3, n_classes=5),
        "onepixel": ev.get_atks(
            victim, OnePixel, "pixels", [1], steps=2, popsize=10, inf_batch=8
        ),
    }


def test_grid_through_get_performance(grid, victim, loader):
    perf = ev.get_performance(grid, victim, loader)

    # Every group produced one result list per instance, timed.
    for name, instances in grid.items():
        key = perf["group_key"][name]
        for metric in ("fooling_rate", "rmse", "mse", "time"):
            assert len(perf[metric][key]) == len(instances), (name, metric)
        for t in perf["time"][key]:
            assert t > 0
        for fr in perf["fooling_rate"][key]:
            assert 0.0 <= fr <= 1.0
        # sub_names recorded per instance
        assert len(perf["sub_names"][name]) == len(instances)

    # The CW c-grid must NOT collapse to identical display sub-names.
    cw_names = perf["sub_names"]["cw"]
    assert len(set(cw_names)) == 2, cw_names
    assert any("c_0.1" in s for s in cw_names) and any(
        "c_1.0" in s for s in cw_names
    ), cw_names


def test_selection_indices_line_up(grid, victim, loader):
    # mse is the reference's per-image SUM of squared pixel diffs
    # (performance.py:249-266) — an eps=8/255 linf perturbation at 32x32x3
    # sums to ~2, so the generous budget admits every combo.
    selected, perf, validation_perf = ev.select_hyperparameter(
        grid, victim, loader, budget=[50.0], criterion="mse_limit"
    )
    gk = validation_perf["group_key"]
    sel = selected[0]
    for name, instances in grid.items():
        key = gk[name]
        chosen = sel[key]
        assert len(chosen) == 1, (name, chosen)
        # The chosen instance is one of the measured ones, and its measured
        # metrics equal the reported selection values at the same index.
        ind = instances.index(chosen[0])
        assert perf[0]["fooling_rate"][key] == pytest.approx(
            validation_perf["fooling_rate"][key][ind]
        )
        assert perf[0]["mse"][key] == pytest.approx(
            validation_perf["mse"][key][ind]
        )

    # CW's mse grows with c, so under the generous budget the mse_limit
    # criterion (max fooling, tie -> max mse) picks a specific, checkable
    # index — the alignment the reference zips by order.
    cw_key = gk["cw"]
    fr = np.asarray(validation_perf["fooling_rate"][cw_key])
    ms = np.asarray(validation_perf["mse"][cw_key])
    best = np.where(fr == fr.max())[0]
    expect = int(best[np.argmax(ms[best])])
    assert sel[cw_key][0] is grid["cw"][expect]
