"""Evaluation / experiment harness (L5 of the reference layer map).

Mirrors /root/reference/performance.py and model_accuracy.py: hyper-grid
expansion, fooling/MSE/RMSE/time measurement, budget-based hyper-parameter
selection, cross-model transfer matrices, and batched top-1 accuracy
(single-device and mesh-sharded).
"""

from .metrics import (
    compute_fooling_rate,
    compute_mse,
    compute_rmse,
    model_accuracy,
    model_accuracy_sharded,
)
from .harness import (
    expand_grid,
    get_atks,
    get_performance,
    get_transfer_performance,
    performance,
    select_hyperparameter,
)

__all__ = [
    "compute_fooling_rate",
    "compute_mse",
    "compute_rmse",
    "model_accuracy",
    "model_accuracy_sharded",
    "expand_grid",
    "get_atks",
    "get_performance",
    "get_transfer_performance",
    "performance",
    "select_hyperparameter",
]
