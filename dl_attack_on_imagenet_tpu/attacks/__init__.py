"""Attack algorithms (L4 of the reference layer map, SURVEY.md §1).

Public exports mirror /root/reference/attacks/__init__.py:1-5 (ADIL, ADILR,
UAPPGD, FastUAP) plus the standalone deepfool/universal-perturbation helpers
that the reference keeps un-exported.
"""

from .base import Attack  # noqa: F401
from .adil import ADIL  # noqa: F401
from .adil_core import AdilConfig  # noqa: F401

__all__ = ["Attack", "ADIL", "AdilConfig"]
