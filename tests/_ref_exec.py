"""Make the reference's OWN code executable and importable for parity tests.

The reference at /root/reference is runnable in this environment except for
two import-time blockers (VERDICT round 4, missing #1):

  * ``torchattacks.attack.Attack`` — the base class every attack subclasses
    (attacks/utils.py:4). Stubbed here with the minimal surface the
    reference actually touches: ``.model``, ``.device``, ``._targeted``,
    and ``__call__ -> forward`` dispatch (the torchattacks v3 contract).
  * ``hostlist`` + SLURM env vars — env_setting.py:10-16 reads them at
    import time and adil.py:12 imports env_setting unconditionally
    (SURVEY.md §2.4). Stubbed with a single-host topology.

Everything else (torch CPU, scipy, tqdm, PIL) is installed, so the
reference modules below run their ACTUAL lines. Tests import through
:func:`load_reference` and compare repo outputs against these executions —
upgrading the parity story from "independent oracle of the same algorithm"
to "the reference's own code agrees" (PARITY.md, executed-reference audit).
"""

import contextlib
import os
import sys
import types

REF_ROOT = "/root/reference"

_SLURM_ENV = {
    "SLURM_JOB_NODELIST": "localhost",
    "SLURM_STEP_NODELIST": "localhost",
    "SLURM_STEP_GPUS": "0",
    "SLURM_NTASKS": "1",
    "SLURM_JOB_NUM_NODES": "1",
    "SLURM_PROCID": "0",
    "SLURM_LOCALID": "0",
}


def _install_stubs():
    import torch

    if "torchattacks" not in sys.modules:
        ta = types.ModuleType("torchattacks")
        atk_mod = types.ModuleType("torchattacks.attack")

        class Attack:
            """Minimal torchattacks.attack.Attack: exactly the attributes
            the reference reads (adil.py:68/:104/:109, utils.py:4)."""

            def __init__(self, name, model):
                self.attack = name
                self.model = model
                try:
                    self.device = next(model.parameters()).device
                except (StopIteration, AttributeError):
                    self.device = torch.device("cpu")
                self._targeted = False

            def __call__(self, *args, **kwargs):
                return self.forward(*args, **kwargs)

        atk_mod.Attack = Attack
        ta.attack = atk_mod
        sys.modules["torchattacks"] = ta
        sys.modules["torchattacks.attack"] = atk_mod

    # torch removed zero_gradients in 1.9; fast_uap.py:12 / deepfool.py:5
    # still import it. Restore the historical behavior (zero .grad in place).
    # NB: ``torch.autograd.gradcheck`` as an attribute resolves to a
    # different object than the submodule; import it by module path.
    import importlib

    _gradcheck = importlib.import_module("torch.autograd.gradcheck")

    if not hasattr(_gradcheck, "zero_gradients"):

        def zero_gradients(x):
            if isinstance(x, torch.Tensor):
                if x.grad is not None:
                    x.grad.detach_()
                    x.grad.zero_()
            elif isinstance(x, (tuple, list)):
                for elem in x:
                    zero_gradients(elem)

        _gradcheck.zero_gradients = zero_gradients

    if "hostlist" not in sys.modules:
        hl = types.ModuleType("hostlist")

        def expand_hostlist(spec):
            """python-hostlist semantics for the forms the tests use:
            'node[001-004,007],other[1-2],plain' -> expanded, padding kept
            (env_setting.py:10 takes hostnames[0])."""
            import re

            out = []
            # split on commas not inside brackets
            parts = re.findall(r"[^,\[]+(?:\[[^\]]*\])?", spec)
            for part in parts:
                m = re.match(r"^(.*?)\[([^\]]*)\]$", part)
                if not m:
                    if part:
                        out.append(part)
                    continue
                prefix, ranges = m.group(1), m.group(2)
                for r in ranges.split(","):
                    if "-" in r:
                        lo, hi = r.split("-")
                        width = len(lo)
                        for v in range(int(lo), int(hi) + 1):
                            out.append(f"{prefix}{v:0{width}d}")
                    else:
                        out.append(f"{prefix}{r}")
            return out

        hl.expand_hostlist = expand_hostlist
        sys.modules["hostlist"] = hl

    # torchvision isn't installed. deepfool.py:6 / universal_pert.py:8 only
    # import its transforms module (their transform line is commented out),
    # but DS_ImageNet.py:2-18 actually USES ImageFolder + Resize/CenterCrop/
    # ToTensor — stubbed here with torchvision's documented semantics so the
    # reference's own dataset/split lines execute:
    #   * ImageFolder: classes = sorted subdir names, samples sorted per
    #     class by path, PIL RGB loader (torchvision.datasets.folder).
    #   * Resize(s): shorter side -> s, long side TRUNCATED int(s*long/
    #     short), PIL bilinear (F._compute_resized_output_size).
    #   * CenterCrop(c): top/left = int(round((dim - c) / 2.0)) — ROUND,
    #     not floor (torchvision.transforms.functional.center_crop).
    #   * ToTensor: HWC uint8 -> CHW float32 / 255.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_t = types.ModuleType("torchvision.transforms")
        tv_d = types.ModuleType("torchvision.datasets")

        class Compose:
            def __init__(self, ts):
                self.ts = ts

            def __call__(self, x):
                for t in self.ts:
                    x = t(x)
                return x

        class Resize:
            def __init__(self, size):
                self.size = size

            def __call__(self, img):
                from PIL import Image

                w, h = img.size
                s = self.size
                if w <= h:
                    ow, oh = s, int(s * h / w)
                else:
                    ow, oh = int(s * w / h), s
                return img.resize((ow, oh), Image.BILINEAR)

        class CenterCrop:
            def __init__(self, size):
                self.size = size

            def __call__(self, img):
                w, h = img.size
                c = self.size
                left = int(round((w - c) / 2.0))
                top = int(round((h - c) / 2.0))
                return img.crop((left, top, left + c, top + c))

        class ToTensor:
            def __call__(self, img):
                import numpy as np
                import torch as _torch

                arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
                return _torch.from_numpy(arr.transpose(2, 0, 1).copy())

        tv_t.Compose = Compose
        tv_t.Resize = Resize
        tv_t.CenterCrop = CenterCrop
        tv_t.ToTensor = ToTensor
        tv_t.transforms = tv_t
        tv.transforms = tv_t

        def pil_loader(path):
            from PIL import Image

            with open(path, "rb") as f:
                return Image.open(f).convert("RGB")

        class ImageFolder:
            IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")

            def __init__(self, root, transform=None, target_transform=None,
                         loader=pil_loader):
                self.root = root
                self.transform = transform
                self.target_transform = target_transform
                self.loader = loader
                self.classes = sorted(
                    e.name for e in os.scandir(root) if e.is_dir()
                )
                if not self.classes:
                    raise FileNotFoundError(
                        f"Couldn't find any class folder in {root}."
                    )
                self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
                self.samples = []
                for c in self.classes:
                    cdir = os.path.join(root, c)
                    # sorted() over the completed walk gives the
                    # deterministic order (same as torchvision's)
                    for dirpath, dirnames, filenames in sorted(os.walk(cdir)):
                        for fname in sorted(filenames):
                            if fname.lower().endswith(self.IMG_EXTENSIONS):
                                self.samples.append(
                                    (os.path.join(dirpath, fname),
                                     self.class_to_idx[c])
                                )
                self.targets = [t for _, t in self.samples]

            def __len__(self):
                return len(self.samples)

            def __getitem__(self, index):
                path, target = self.samples[index]
                sample = self.loader(path)
                if self.transform is not None:
                    sample = self.transform(sample)
                if self.target_transform is not None:
                    target = self.target_transform(target)
                return sample, target

        # re-home the function-scoped classes so pickle (torch.save of a
        # DS_ImageNet instance, imagenet_loading.py:53's workflow) can
        # resolve them by module+qualname
        for cls, mod in ((Compose, "torchvision.transforms"),
                         (Resize, "torchvision.transforms"),
                         (CenterCrop, "torchvision.transforms"),
                         (ToTensor, "torchvision.transforms"),
                         (ImageFolder, "torchvision.datasets"),
                         (pil_loader, "torchvision.datasets")):
            cls.__module__ = mod
            cls.__qualname__ = cls.__name__

        tv_d.ImageFolder = ImageFolder
        tv_d.pil_loader = pil_loader
        tv_d.folder = tv_d
        tv.datasets = tv_d
        # main.py:5 / demo_dL_attack.py:4 import torchvision.models at
        # module level; their pretrained-model constructors are only
        # reached past the CUDA guard, so an empty module satisfies the
        # imports (the entry scripts execute to their own guard).
        tv_m = types.ModuleType("torchvision.models")
        tv.models = tv_m
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision.datasets"] = tv_d
        sys.modules["torchvision.models"] = tv_m

    if "torchmetrics" not in sys.modules:
        tmx = types.ModuleType("torchmetrics")

        class Accuracy:
            def __init__(self):
                self.correct = 0
                self.total = 0

            def to(self, device):
                return self

            def __call__(self, preds, target):
                c = int((preds.argmax(dim=-1) == target).sum())
                self.correct += c
                self.total += int(target.numel())
                return torch.tensor(c / max(int(target.numel()), 1))

            def compute(self):
                return torch.tensor(self.correct / max(self.total, 1))

            def reset(self):
                self.correct = 0
                self.total = 0

        tmx.Accuracy = Accuracy
        sys.modules["torchmetrics"] = tmx

    for key, val in _SLURM_ENV.items():
        os.environ.setdefault(key, val)


@contextlib.contextmanager
def cuda_as_identity():
    """Run reference code whose `.cuda()` calls are hardcoded
    (deepfool.py:60, universal_pert.py:61-65 — SURVEY.md §2.4) on CPU:
    Tensor.cuda/Module.cuda become identity for the duration."""
    import torch

    t_cuda = torch.Tensor.cuda
    m_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = t_cuda
        torch.nn.Module.cuda = m_cuda


def load_reference_deepfool():
    """Import the reference's standalone deepfool + universal_pert modules
    (attacks/attacks_classes/*.py). universal_pert.py:2 does
    ``from deepfool import deepfool`` — a root-relative import that only
    resolves with the attacks_classes dir itself on sys.path (SURVEY.md
    §2.1)."""
    _install_stubs()
    classes_dir = os.path.join(REF_ROOT, "attacks", "attacks_classes")
    for p in (REF_ROOT, classes_dir):
        if p not in sys.path:
            sys.path.insert(0, p)
    import deepfool as ref_deepfool
    import universal_pert as ref_universal

    return types.SimpleNamespace(
        deepfool=ref_deepfool, universal=ref_universal
    )


def load_reference_uap():
    """Import the reference's UAPPGD + FastUAP modules (executed, not read).

    uappgd.py imports ``env_setting`` root-relative (:13) and torchattacks
    (:6); fast_uap.py needs the ``zero_gradients`` restore (:12). Both
    resolve with the stubs above and REF_ROOT on sys.path.
    """
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import attacks.attacks_classes.uappgd as ref_uappgd
    import attacks.attacks_classes.fast_uap as ref_fast_uap

    return types.SimpleNamespace(uappgd=ref_uappgd, fast_uap=ref_fast_uap)


def load_reference_imagenet():
    """Import the reference's DS_ImageNet.py + imagenet_loading.py
    (executed, not read) — the data layer, via the faithful torchvision
    ImageFolder/transforms stub installed above."""
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import DS_ImageNet as ref_ds
    import imagenet_loading as ref_loading

    return types.SimpleNamespace(ds=ref_ds, loading=ref_loading)


def load_reference_accuracy():
    """Import the reference's model_accuracy.py (executed, not read).

    The one blocker is ``torchmetrics`` (not installed). Stubbed with the
    torchmetrics v0.x ``Accuracy`` contract the reference was written
    against — update(logits, target) accumulates argmax==target counts,
    compute() returns the running mean, reset() clears — which is exactly
    the surface model_accuracy touches (:51-62). NB in torchmetrics >=1.0
    the no-arg ``Accuracy()`` call itself raises (``task`` became
    required), so the reference is uncallable against current releases;
    the stub restores the historical behavior.
    """
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import model_accuracy as ref_model_accuracy

    return types.SimpleNamespace(model_accuracy=ref_model_accuracy)


def load_reference():
    """Import and return the reference's own modules (executed, not read).

    Returns a namespace with ``utils`` (attacks/utils.py), ``adilr``
    (attacks_classes/adil_regularized.py), ``adil``
    (attacks_classes/adil.py), and ``performance`` (performance.py).
    """
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import attacks.utils as ref_utils  # noqa: reference module
    import attacks.attacks_classes.adil_regularized as ref_adilr
    import attacks.attacks_classes.adil as ref_adil
    import performance as ref_performance

    return types.SimpleNamespace(
        utils=ref_utils,
        adilr=ref_adilr,
        adil=ref_adil,
        performance=ref_performance,
    )


@contextlib.contextmanager
def torch_f64():
    """Run a reference call with torch's default dtype set to float64 so its
    internal ``torch.rand``/``torch.zeros``/``torch.eye`` allocations match
    f64 inputs (the reference itself never sets dtypes)."""
    import torch

    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        yield
    finally:
        torch.set_default_dtype(prev)


class IndexedDataset:
    """The reference's ``Subset_I.indexed`` contract (imagenet_loading.py:8-18):
    a dataset whose __getitem__ yields (i, x, y) when ``indexed`` is True and
    (x, y) otherwise — required by ADIL.learn_dictionary_* which toggles the
    flag (adil.py:117/:129)."""

    def __init__(self, images, labels):
        self.images = images
        self.labels = labels
        self.indexed = False

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        if self.indexed:
            return i, self.images[i], self.labels[i]
        return self.images[i], self.labels[i]
