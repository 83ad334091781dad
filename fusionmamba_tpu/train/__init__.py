from .loop import (
    SegTrainState,
    TrainState,
    make_fusion_optimizer,
    make_fusion_train_step,
    make_seg_optimizer,
    make_seg_train_step,
    poly_lr,
    reference_fusion_lr,
    resolve_compute_dtype,
    set_learning_rate,
)

__all__ = [
    "TrainState", "SegTrainState", "make_fusion_optimizer",
    "make_fusion_train_step", "make_seg_optimizer", "make_seg_train_step",
    "poly_lr", "reference_fusion_lr", "resolve_compute_dtype",
    "set_learning_rate",
]
