from .torch_import import (
    convert_fusion_state_dict,
    convert_seg_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "convert_fusion_state_dict",
    "convert_seg_state_dict",
    "load_torch_checkpoint",
]
