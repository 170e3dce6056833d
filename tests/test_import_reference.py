"""Importing reference torch-pickle artifacts into the ArtifactCache.

The reference memoizes trained attacks as torch.save'd lists (adil.py:210,
adil_regularized.py:499, uappgd.py:107, fast_uap.py:97); a migrating user
imports them once and the attack classes here pick them up through their
normal memoization lookup. These tests build artifacts in the exact
reference formats with real torch, import them, and verify (a) the attack
classes skip training and serve inference from the import, (b) the NCHW
atoms-last -> NHWC atoms-first layout conversion preserves the D·v
perturbation bit-for-bit against the reference's tensordot contraction
(adil.py:25: tensordot(v[idx], D, dims=[[1],[3]])).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from dl_attack_on_imagenet_tpu.attacks import ADIL, ADILR, FastUAP, UAPPGD
from dl_attack_on_imagenet_tpu.data import ArrayDataset
from dl_attack_on_imagenet_tpu.models import create_model
from dl_attack_on_imagenet_tpu.ops import dict_apply
from dl_attack_on_imagenet_tpu.utils import (
    ArtifactCache,
    import_adil,
    import_adilr,
    import_uap,
    import_universal,
)

H = W = 32
K = 5
N = 8


@pytest.fixture(scope="module")
def victim():
    return create_model("tiny", rng=jax.random.PRNGKey(7))


@pytest.fixture()
def ref_adil_artifact(tmp_path):
    """[d (C,H,W,K), v (N,K), loss_all, fooling_all, val_fool] per adil.py:210."""
    g = torch.Generator().manual_seed(0)
    d = torch.rand((3, H, W, K), generator=g) * 2 - 1
    v = torch.rand((N, K), generator=g) * 0.01
    path = str(tmp_path / "ImageNet_ref.bin")
    torch.save([d, v, [0.5, 0.4, 0.3], [0.0, 0.1, 0.2], 0.15], path)
    return path, d, v


class TestAdilImport:
    def test_layout_preserves_dv(self, tmp_path, ref_adil_artifact):
        path, d_t, v_t = ref_adil_artifact
        cache = ArtifactCache(str(tmp_path / "cache"))
        import_adil(path, cache, "tiny")
        payload = cache.load("ImageNet", model="tiny")
        assert payload["d"].shape == (K, H, W, 3)
        # reference contraction: (N,K) x (C,H,W,K) -> (N,C,H,W)
        dv_ref = torch.tensordot(v_t, d_t, dims=[[1], [3]]).numpy()
        dv_here = np.asarray(dict_apply(jnp.asarray(payload["v"]),
                                        jnp.asarray(payload["d"])))
        np.testing.assert_allclose(
            dv_here, np.transpose(dv_ref, (0, 2, 3, 1)), rtol=0, atol=1e-6
        )

    def test_adil_class_serves_from_import(self, tmp_path, victim,
                                           ref_adil_artifact):
        path, _, _ = ref_adil_artifact
        cache = ArtifactCache(str(tmp_path / "cache"))
        import_adil(path, cache, "tiny")
        atk = ADIL(victim, n_atoms=K, eps=8 / 255, cache=cache,
                   model_name="tiny", steps_inference=3, trials=2)
        x = jnp.asarray(np.random.default_rng(0).random((4, H, W, 3)),
                        jnp.float32)
        adv = atk(x)  # no data_train: must come from the imported artifact
        assert adv.shape == x.shape
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        assert float(jnp.max(jnp.abs(adv - x))) > 0  # attack applied
        # the class's dictionary is the imported one (atoms-first layout)
        payload = cache.load("ImageNet", model="tiny")
        np.testing.assert_allclose(np.asarray(atk._load_dictionary()),
                                   payload["d"], atol=0)

    def test_history_curves_imported(self, tmp_path, ref_adil_artifact):
        path, _, _ = ref_adil_artifact
        cache = ArtifactCache(str(tmp_path / "cache"))
        import_adil(path, cache, "tiny")
        payload = cache.load("ImageNet", model="tiny")
        np.testing.assert_allclose(payload["loss"], [0.5, 0.4, 0.3])
        np.testing.assert_allclose(payload["fooling_rate"], [0.0, 0.1, 0.2])
        np.testing.assert_allclose(payload["val_fooling"], 0.15)


class TestUapImport:
    @pytest.mark.parametrize("kind,cls", [("UAPPGD", UAPPGD),
                                          ("FastUAP", FastUAP)])
    def test_import_and_forward(self, tmp_path, victim, kind, cls):
        e_t = torch.rand((1, 3, H, W)) * 0.05
        path = str(tmp_path / "attack.bin")
        torch.save([e_t, [0.1, 0.6]], path)
        cache = ArtifactCache(str(tmp_path / "cache"))
        import_uap(path, cache, "tiny", kind)
        atk = cls(victim, cache=cache, model_name="tiny")
        x = jnp.asarray(np.random.default_rng(1).random((4, H, W, 3)),
                        jnp.float32)
        adv = atk(x)
        expected = np.clip(
            np.asarray(x) + np.transpose(e_t.numpy(), (0, 2, 3, 1)), 0, 1
        )
        np.testing.assert_allclose(np.asarray(adv), expected, atol=1e-6)

    def test_variable_style_artifact(self, tmp_path, victim):
        # uappgd saves an autograd Variable with requires_grad
        e_t = (torch.rand((1, 3, H, W)) * 0.05).requires_grad_(True)
        path = str(tmp_path / "attack.bin")
        torch.save([e_t, []], path)
        cache = ArtifactCache(str(tmp_path / "cache"))
        import_uap(path, cache, "tiny", "UAPPGD")
        payload = cache.load("UAPPGD", model="tiny")
        assert payload["e"].shape == (1, H, W, 3)


class TestAdilrImport:
    def test_import_serves_unsupervised(self, tmp_path, victim):
        g = torch.Generator().manual_seed(2)
        d = torch.randn((3, H, W, K), generator=g) * 0.01
        v = torch.randn((N, K), generator=g) * 0.1
        labels = torch.arange(N) % 3
        pred = torch.zeros(N, dtype=torch.long)
        path = str(tmp_path / "adilr.bin")
        torch.save([d, labels, pred, v, [1.0, 0.5]], path)
        cache = ArtifactCache(str(tmp_path / "cache"))
        import_adilr(path, cache, "tiny", lam1=0.1, lam2=0.1, steps=100,
                     tag="train")
        atk = ADILR(victim, lambda_l1=0.1, lambda_l2=0.1, n_atoms=K,
                    steps=100, param_or_train="train", cache=cache,
                    model_name="tiny", attack="unsupervised", trials=2)
        assert atk.mean is not None and atk.scale is not None  # Laplace refit
        x = jnp.asarray(np.random.default_rng(2).random((4, H, W, 3)),
                        jnp.float32)
        adv = atk(x)
        assert adv.shape == x.shape
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1


    def test_import_class_trainer_format(self, tmp_path, victim):
        # The ADILR class's executed trainer saves the ADIL-style 5-list
        # [d, v, loss_all, fooling_all, val_fool] (adil_regularized.py:815)
        # — auto-detected by element shapes.
        g = torch.Generator().manual_seed(4)
        d = torch.randn((3, H, W, K), generator=g) * 0.01
        v = torch.randn((N, K), generator=g) * 0.1
        path = str(tmp_path / "adilr_class.bin")
        torch.save([d, v, [1.0, 0.5], [0.0, 0.2], 0.3], path)
        cache = ArtifactCache(str(tmp_path / "cache"))
        # default tag matches the ADILR class default (param_selecting)
        import_adilr(path, cache, "tiny", lam1=0.1, lam2=0.1, steps=100)
        payload = cache.load("ADILR", model="tiny", lam1=0.1, lam2=0.1,
                             atoms=K, steps=100, tag="param_selecting")
        assert payload is not None
        assert payload["d"].shape == (K, H, W, 3)
        assert payload["v"].shape == (N, K)
        # the codes (not a metric curve) landed in v
        np.testing.assert_allclose(
            payload["v"], v.numpy().astype(np.float32), atol=1e-7
        )

    def test_class_format_import_serves_labels_atoms(self, tmp_path, victim):
        # Class-trainer artifacts carry no labels; the conditioned Laplace
        # fit must fall back to the provided dataset's labels (not be
        # suppressed by a 0-d object array from np.asarray(None)).
        g = torch.Generator().manual_seed(6)
        d = torch.randn((3, H, W, K), generator=g) * 0.01
        v = torch.randn((N, K), generator=g) * 0.1
        path = str(tmp_path / "adilr_class2.bin")
        torch.save([d, v, [1.0, 0.5], [0.0, 0.2], 0.3], path)
        cache = ArtifactCache(str(tmp_path / "cache"))
        import_adilr(path, cache, "tiny", lam1=0.1, lam2=0.1, steps=100)
        x = np.random.default_rng(6).random((N, H, W, 3)).astype(np.float32)
        y = (np.arange(N) % 3).astype(np.int64)
        atk = ADILR(victim, lambda_l1=0.1, lambda_l2=0.1, n_atoms=K,
                    steps=100, cache=cache, model_name="tiny",
                    attack="unsupervised", trials=2,
                    attack_conditioned="labels_atoms", data_train=(x, y))
        assert "labels_atoms" in atk.mean
        adv = atk(jnp.asarray(x[:4]), jnp.asarray(y[:4]))
        assert adv.shape == (4, H, W, 3)

    def test_reject_garbage_artifact(self, tmp_path):
        path = str(tmp_path / "bad.bin")
        torch.save([torch.zeros((3, H, W, K)), torch.zeros((7,))], path)
        cache = ArtifactCache(str(tmp_path / "cache"))
        with pytest.raises(ValueError, match="ADILR"):
            import_adilr(path, cache, "tiny", lam1=0.1, lam2=0.1)


def test_ddp_module_artifact_clear_error(tmp_path):
    # The DDP path pickles the whole module (adil.py:428); importing must
    # fail with a message explaining the re-save recipe, not an obscure
    # unpack error.
    m = torch.nn.Linear(2, 2)
    path = str(tmp_path / "ddp.bin")
    torch.save([m, [0.1], [0.2]], path)
    cache = ArtifactCache(str(tmp_path / "cache"))
    with pytest.raises(ValueError, match="DDP"):
        import_adil(path, cache, "tiny")


def test_universal_out_path_normalized(tmp_path):
    import os

    v = np.random.default_rng(5).random((3, H, W)).astype(np.float32)
    src = str(tmp_path / "pert.npy")
    np.save(src, v)
    out = import_universal(src, str(tmp_path / "converted"))  # no .npy
    assert out.endswith(".npy") and os.path.exists(out)


def test_universal_npy_roundtrip(tmp_path):
    v = np.random.default_rng(3).random((1, 3, H, W)).astype(np.float32)
    src = str(tmp_path / "pert.npy")
    np.save(src, v)
    out = import_universal(src, str(tmp_path / "pert_nhwc.npy"))
    v2 = np.load(out)
    assert v2.shape == (H, W, 3)
    np.testing.assert_allclose(v2, np.transpose(v[0], (1, 2, 0)))


def test_cli_wrapper(tmp_path, victim):
    from dl_attack_on_imagenet_tpu.cli import import_artifacts as cli

    e_t = torch.rand((1, 3, H, W)) * 0.05
    path = str(tmp_path / "attack.bin")
    torch.save([e_t, [0.2]], path)
    cli.main(["--kind", "uappgd", "--model", "tiny", "--src", path,
              "--cache", str(tmp_path / "cache")])
    cache = ArtifactCache(str(tmp_path / "cache"))
    assert cache.exists("UAPPGD", model="tiny")
