from mmtrs_tpu.metrics.binary import (
    roc_auc,
    average_precision,
    brier,
    log_loss,
    confusion,
    binary_report,
    evaluate,
)
from mmtrs_tpu.metrics.thresholds import (
    choose_threshold,
    tune_threshold,
    threshold_grid,
    sweep_thresholds,
)

__all__ = [
    "roc_auc",
    "average_precision",
    "brier",
    "log_loss",
    "confusion",
    "binary_report",
    "evaluate",
    "choose_threshold",
    "tune_threshold",
    "threshold_grid",
    "sweep_thresholds",
]
