"""Core attack-math kernel library (pure jnp, Pallas drop-ins in pallas_kernels).

Reference semantics reproduced from /root/reference/attacks/utils.py and the
projection/loss helpers inside /root/reference/attacks/attacks_classes/adil.py.
"""

from .projections import (
    l1_ball_project,
    l1_ball_project_bisect,
    l2_ball_project,
    l2_sphere_project,
    linf_clamp,
    clamp_image,
    soft_threshold,
    project_atoms,
    project_codes,
    project_dictionary,
)
from .dictionary import (
    dict_apply,
    dict_flatten,
    dict_unflatten,
    dict_gram,
    dict_pinv,
    codes_from_pinv,
)
from .losses import (
    cw_margin_loss,
    cross_entropy_sum,
    cross_entropy_mean,
    attack_loss,
    dlr_loss,
    dlr_loss_targeted,
)
from .laplace import (
    laplace_fit,
    laplace_fit_per_atom,
    laplace_fit_conditioned,
    laplace_sample,
)

__all__ = [
    "l1_ball_project",
    "l1_ball_project_bisect",
    "l2_ball_project",
    "l2_sphere_project",
    "linf_clamp",
    "clamp_image",
    "soft_threshold",
    "project_atoms",
    "project_codes",
    "project_dictionary",
    "dict_apply",
    "dict_flatten",
    "dict_unflatten",
    "dict_gram",
    "dict_pinv",
    "codes_from_pinv",
    "cw_margin_loss",
    "cross_entropy_sum",
    "cross_entropy_mean",
    "attack_loss",
    "dlr_loss",
    "dlr_loss_targeted",
    "laplace_fit",
    "laplace_fit_per_atom",
    "laplace_fit_conditioned",
    "laplace_sample",
]
