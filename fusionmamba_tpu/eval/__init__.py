from .metrics_seg import RunningScore, present_classes_metrics
from .metrics_sod import e_measure, f_measure_sod, mae, s_measure

__all__ = [
    "RunningScore", "present_classes_metrics",
    "s_measure", "f_measure_sod", "e_measure", "mae",
]
