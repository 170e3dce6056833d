"""Attack algorithms (L4 of the reference layer map, SURVEY.md §1).

Public exports mirror /root/reference/attacks/__init__.py:1-5 (ADIL, ADILR,
UAPPGD, FastUAP) plus the standalone deepfool/universal-perturbation helpers
that the reference keeps un-exported.
"""

from .base import Attack  # noqa: F401
from .adil import ADIL  # noqa: F401
from .adil_core import AdilConfig  # noqa: F401
from .adil_regularized import ADILR, RegularizedConfig  # noqa: F401
from .apgd import APGD, APGDT  # noqa: F401
from .autoattack import AutoAttack  # noqa: F401
from .cw import CW  # noqa: F401
from .deepfool import DeepFool, deepfool_batch  # noqa: F401
from .fab import FAB  # noqa: F401
from .fast_uap import DeepFoolCosinus, FastUAP  # noqa: F401
from .fgsm_family import (  # noqa: F401
    DIFGSM,
    EOTPGD,
    FFGSM,
    GN,
    MIFGSM,
    RFGSM,
    TPGD,
    VANILA,
)
from .one_pixel import OnePixel  # noqa: F401
from .pgd import BIM, FGSM, PGD  # noqa: F401
from .square import Square  # noqa: F401
from .uap_pgd import UAPPGD  # noqa: F401
from .universal_pert import universal_perturbation  # noqa: F401

__all__ = [
    "Attack",
    "ADIL",
    "AdilConfig",
    "ADILR",
    "RegularizedConfig",
    "DeepFool",
    "deepfool_batch",
    "DeepFoolCosinus",
    "FastUAP",
    "UAPPGD",
    "universal_perturbation",
    "FGSM",
    "PGD",
    "BIM",
    "RFGSM",
    "FFGSM",
    "MIFGSM",
    "TPGD",
    "EOTPGD",
    "DIFGSM",
    "GN",
    "VANILA",
    "CW",
    "APGD",
    "APGDT",
    "Square",
    "FAB",
    "AutoAttack",
    "OnePixel",
]
