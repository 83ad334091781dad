from .metrics_fusion import (
    entropy,
    fusion_report,
    mutual_information,
    qabf,
    ssim,
    std_dev,
)
from .metrics_seg import RunningScore, present_classes_metrics
from .metrics_sod import e_measure, f_measure_sod, mae, s_measure

__all__ = [
    "RunningScore", "present_classes_metrics",
    "s_measure", "f_measure_sod", "e_measure", "mae",
    "ssim", "qabf", "entropy", "std_dev", "mutual_information",
    "fusion_report",
]
