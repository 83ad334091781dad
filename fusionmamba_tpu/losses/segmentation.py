"""Segmentation losses (match `loss.py:61-154` and
`train_segmentation.py:37-91` of the reference).

* `cross_entropy`: torch-semantics CE over logits (B, H, W, C) and integer
  targets (B, H, W); optional per-class weights normalize by the summed
  weight of the selected targets (torch `nn.CrossEntropyLoss(weight=...)`),
  optional ignore_index.
* `segmentation_loss`: weighted CE + 0.5 * focal(gamma=2) with the hardcoded
  PST900 inverse-frequency weights [1, 970, 121.25, 970, 53.89] when
  num_classes == 5 (`loss.py:72-78`).
* `improved_pst900_loss`: data-driven class weights + CE + 0.5*focal +
  0.3*dice over foreground classes (`train_segmentation.py:62-91`; the
  optional lovasz term is omitted, matching the reference when
  `lovasz_losses` is not importable).
* `combined_fusion_segmentation_loss`: w_f * fusion + w_s * seg
  (`loss.py:105-154`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .fusion_loss import fusion_loss

PST900_CLASS_WEIGHTS = (1.0, 970.0, 121.25, 970.0, 53.89)


def _per_pixel_ce(logits: jnp.ndarray, target: jnp.ndarray):
    """Unreduced CE; logits (B,H,W,C), target int (B,H,W)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.clip(target, 0, logits.shape[-1] - 1)
    picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -picked


def cross_entropy(logits: jnp.ndarray, target: jnp.ndarray,
                  weight: jnp.ndarray | None = None,
                  ignore_index: int = -100) -> jnp.ndarray:
    ce = _per_pixel_ce(logits, target)
    valid = (target != ignore_index).astype(jnp.float32)
    if weight is not None:
        w = weight[jnp.clip(target, 0, logits.shape[-1] - 1)] * valid
        return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1e-12)


def focal_loss(logits: jnp.ndarray, target: jnp.ndarray,
               alpha: float = 1.0, gamma: float = 2.0,
               ignore_index: int = -100) -> jnp.ndarray:
    ce = _per_pixel_ce(logits, target)
    valid = (target != ignore_index).astype(jnp.float32)
    pt = jnp.exp(-ce)
    fl = alpha * (1.0 - pt) ** gamma * ce * valid
    return jnp.sum(fl) / jnp.maximum(jnp.sum(valid), 1e-12)


def dice_loss_foreground(logits: jnp.ndarray, target: jnp.ndarray,
                         num_classes: int, smooth: float = 1e-6):
    """Mean (1 - dice) over classes 1..C-1 (`train_segmentation.py:67-78`)."""
    probs = jax.nn.softmax(logits, axis=-1)
    total = 0.0
    for c in range(1, num_classes):
        p = probs[..., c]
        t = (target == c).astype(jnp.float32)
        inter = jnp.sum(p * t)
        union = jnp.sum(p) + jnp.sum(t)
        total += 1.0 - (2.0 * inter + smooth) / (union + smooth)
    return total / (num_classes - 1)


class SegLossOutput(NamedTuple):
    total: jnp.ndarray
    ce: jnp.ndarray
    focal: jnp.ndarray


def segmentation_loss(logits: jnp.ndarray, target: jnp.ndarray,
                      num_classes: int,
                      weight: jnp.ndarray | None = None,
                      alpha: float = 1.0, gamma: float = 2.0,
                      ignore_index: int = -100) -> SegLossOutput:
    if weight is None and num_classes == 5:
        weight = jnp.asarray(PST900_CLASS_WEIGHTS, jnp.float32)
    ce = cross_entropy(logits, target, weight, ignore_index)
    fl = focal_loss(logits, target, alpha, gamma, ignore_index)
    return SegLossOutput(ce + 0.5 * fl, ce, fl)


class ImprovedSegLossOutput(NamedTuple):
    total: jnp.ndarray
    ce: jnp.ndarray
    focal: jnp.ndarray
    dice: jnp.ndarray


def improved_pst900_loss(logits: jnp.ndarray, target: jnp.ndarray,
                         num_classes: int,
                         class_weights: jnp.ndarray) -> ImprovedSegLossOutput:
    ce = cross_entropy(logits, target, class_weights)
    fl = focal_loss(logits, target)
    dl = dice_loss_foreground(logits, target, num_classes)
    return ImprovedSegLossOutput(ce + 0.5 * fl + 0.3 * dl, ce, fl, dl)


def compute_class_weights(class_counts: jnp.ndarray) -> jnp.ndarray:
    """Inverse-frequency weights, min-normalized
    (`train_segmentation.py:53-55`)."""
    freq = class_counts / jnp.sum(class_counts)
    w = 1.0 / (freq + 1e-6)
    return w / jnp.min(w)


def combined_fusion_segmentation_loss(
        image_vis_y, image_ir, seg_labels, fusion_out, seg_logits,
        num_seg_classes: int, fusion_weight: float = 1.0,
        segmentation_weight: float = 1.0):
    out = {}
    total = 0.0
    if fusion_out is not None:
        f = fusion_loss(image_vis_y, image_ir, fusion_out)
        out.update(fusion_total=f.total, fusion_mse=f.loss_in,
                   fusion_ssim=f.ssim_value, fusion_grad=f.loss_grad)
        total = total + fusion_weight * f.total
    if seg_logits is not None and seg_labels is not None:
        s = segmentation_loss(seg_logits, seg_labels, num_seg_classes)
        out.update(seg_total=s.total, seg_ce=s.ce, seg_focal=s.focal)
        total = total + segmentation_weight * s.total
    out["total"] = total
    return out
