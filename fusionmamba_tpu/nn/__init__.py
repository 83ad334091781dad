from .blocks import VSSBlock, VSSBlockCross
from .layers import (
    BiAttn,
    CrossLayer,
    DifferentialEnhance,
    DropPath,
    ECALayer,
    LDC,
    Mlp,
    SegmentationHead,
)
from .patch import FinalPatchExpand, PatchEmbed, PatchExpand, PatchMerging
from .ss2d import SS2D, SS2DCross

__all__ = [
    "VSSBlock", "VSSBlockCross", "BiAttn", "CrossLayer",
    "DifferentialEnhance", "DropPath", "ECALayer", "LDC", "Mlp",
    "SegmentationHead", "FinalPatchExpand", "PatchEmbed", "PatchExpand",
    "PatchMerging", "SS2D", "SS2DCross",
]
