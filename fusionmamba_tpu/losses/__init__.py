from .fusion_loss import FusionLossOutput, fusion_loss, sobel_xy
from .segmentation import (
    PST900_CLASS_WEIGHTS,
    combined_fusion_segmentation_loss,
    compute_class_weights,
    cross_entropy,
    dice_loss_foreground,
    focal_loss,
    improved_pst900_loss,
    segmentation_loss,
)
from .ssim import msssim, ssim

__all__ = [
    "fusion_loss", "FusionLossOutput", "sobel_xy", "msssim", "ssim",
    "segmentation_loss", "improved_pst900_loss", "focal_loss",
    "cross_entropy", "dice_loss_foreground", "compute_class_weights",
    "combined_fusion_segmentation_loss", "PST900_CLASS_WEIGHTS",
]
