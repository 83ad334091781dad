"""Configuration dataclasses (the reference hardcodes these; SURVEY.md §5.6).

Defaults mirror `VSSM_Fusion.__init__`
(`models/vmamba_Fusion_efficross.py:754-757`); the tiny config is the CT-MRI
variant from the reference README (`README.md:54`).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class FusionModelConfig:
    in_chans: int = 1
    patch_size: int = 4
    depths: Tuple[int, ...] = (2, 2, 9, 2)
    depths_decoder: Tuple[int, ...] = (2, 9, 2, 2)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    d_state: int = 16
    ssm_ratio: float = 2.0
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    # eps of the VSSBlock/VSSBlockCross pre-norms: the reference builds them
    # with partial(nn.LayerNorm, eps=1e-6) (`models/cross.py:1267,1302`).
    # SS2D out_norm / BiAttn / patch norms use the torch DEFAULT 1e-5 and
    # are hardcoded to 1e-5 at their call sites.
    norm_eps: float = 1e-6
    patch_norm: bool = True
    # "adaptive" (the default) = the cumsum_mm Pallas kernel while the
    # saturation margin is inside its exactness envelope, with a per-call
    # on-device switch to the magnitude-exact doubling kernel when training
    # drift crosses it (ops/selective_scan.py) -- exact at any input
    # magnitude with no retrace, so trained checkpoints infer/train
    # correctly out of the box
    scan_impl: str = "adaptive"
    # rematerialize each VSSBlock in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for O(depth) less activation HBM, unlocking
    # larger (throughput-optimal) batch sizes on a 16 GB v5e chip
    remat: bool = False
    # "light" remat: recompute only the wide cheap branches (Mlp/BiAttn/ECA)
    # in the backward -- saves activation HBM without re-running the Pallas
    # scan/dwconv kernels (nn/blocks.py)
    remat_light: bool = False
    # compute the tail (FinalPatchExpand's LayerNorm + the 1x1 output conv)
    # in the PRE-depth-to-space layout as grouped ops on full 384-wide lanes
    # instead of 24-wide lanes at 256^2 (identical math -- depth-to-space
    # maps each channel group to one output position; nn/patch.py). The
    # 24-lane full-resolution layout wastes >80% of each vector register
    # and costs ~15 ms/step at batch 24 (PERF.md).
    fused_tail: bool = True
    # segmentation
    num_seg_classes: int = 9

    def __post_init__(self):
        # "bypass" is a timing-ablation stub in ops/selective_scan.py, NOT a
        # model: it must be unreachable from a model config
        allowed = ("adaptive", "auto", "auto_exact", "ref", "assoc",
                   "pallas", "pallas_exact", "pallas_interpret", "sp")
        if self.scan_impl not in allowed:
            raise ValueError(
                f"scan_impl must be one of {allowed}, got {self.scan_impl!r}")

    @property
    def dims_decoder(self) -> Tuple[int, ...]:
        return tuple(reversed(self.dims))


def full_config(**overrides) -> FusionModelConfig:
    return FusionModelConfig(**overrides)


def tiny_config(**overrides) -> FusionModelConfig:
    """CT-MRI tiny config (`README.md:54`)."""
    overrides.setdefault("depths", (2, 2, 1, 2))
    overrides.setdefault("depths_decoder", (2, 1, 2, 2))
    return FusionModelConfig(**overrides)


def test_config(**overrides) -> FusionModelConfig:
    """Miniature config for unit tests (not a reference variant)."""
    overrides.setdefault("depths", (1, 1))
    overrides.setdefault("depths_decoder", (1, 1))
    overrides.setdefault("dims", (16, 32))
    overrides.setdefault("d_state", 4)
    overrides.setdefault("drop_path_rate", 0.0)
    return FusionModelConfig(**overrides)
