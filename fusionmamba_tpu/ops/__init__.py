from .selective_scan import selective_scan
from .scan_ref import selective_scan_ref
from .scan_assoc import selective_scan_assoc
from .scan_pallas import selective_scan_pallas
from .scan2d import cross_merge, cross_scan, efficient_merge, efficient_scan

__all__ = [
    "selective_scan",
    "selective_scan_ref",
    "selective_scan_assoc",
    "selective_scan_pallas",
    "efficient_scan",
    "efficient_merge",
    "cross_scan",
    "cross_merge",
]
