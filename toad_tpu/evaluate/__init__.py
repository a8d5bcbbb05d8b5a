from toad_tpu.evaluate.metrics import (
    AccuracyLogger,
    binary_auc,
    error_rate,
    macro_ovr_auc,
    micro_ovr_auc,
    ovr_aucs,
    topk_accuracy,
)
from toad_tpu.evaluate.engine import evaluate_split, EvalResult

__all__ = [
    "AccuracyLogger",
    "binary_auc",
    "error_rate",
    "macro_ovr_auc",
    "micro_ovr_auc",
    "ovr_aucs",
    "topk_accuracy",
    "evaluate_split",
    "EvalResult",
]
