"""Fusion training loss (matches `loss.py:15-56` of the reference).

loss_total = 100 * [0.5*(1 - msssim(gen, y)) + 0.5*(1 - msssim(gen, ir))]
           + 10 * MSE(max(y, ir), gen)
           + 1 * L1(max(|sobel| y, |sobel| ir), |sobel| gen)

with msssim(normalize=True) and the fixed Sobel-xy operator of
`loss.py:15-31`. All images NHWC single-channel in [0, 1].
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ssim import msssim, sep_filter2d

# Sobel factors exactly: sobel_x = [1,2,1]^T (rows/H) (x) [-1,0,1] (cols/W),
# sobel_y = [1,0,-1]^T (x) [1,2,1] (`loss.py:15-31` convolves the 2-D taps)
_SMOOTH = (1.0, 2.0, 1.0)
_DIFF_X = (-1.0, 0.0, 1.0)
_DIFF_Y = (1.0, 0.0, -1.0)


def sobel_xy(x: jnp.ndarray) -> jnp.ndarray:
    """|sobel_x| + |sobel_y| with SAME (zero) padding, as separable banded
    matmuls (single-channel depthwise convs waste 127/128 VPU lanes on TPU
    -- see `losses/ssim.py:_band_matrix`). Accepts (B, H, W) -- the
    copy-free layout -- or NHWC; rank is preserved."""
    gx = sep_filter2d(x, _SMOOTH, _DIFF_X, same=True)
    gy = sep_filter2d(x, _DIFF_Y, _SMOOTH, same=True)
    return jnp.abs(gx) + jnp.abs(gy)


class FusionLossOutput(NamedTuple):
    total: jnp.ndarray
    loss_in: jnp.ndarray
    ssim_value: jnp.ndarray
    loss_grad: jnp.ndarray


def fusion_loss(image_vis_y: jnp.ndarray, image_ir: jnp.ndarray,
                generate_img: jnp.ndarray,
                w_ssim: float = 100.0, w_in: float = 10.0,
                w_grad: float = 1.0) -> FusionLossOutput:
    # squeeze the C=1 axis: the whole pipeline (banded matmuls, pools,
    # elementwise) runs rank-3 (B, H, W) where XLA tiles (h, w) minor --
    # the NHWC C=1 form costs ~16 ms/step in layout copies at b24
    image_y = image_vis_y[..., 0]
    image_ir = image_ir[..., 0]
    generate_img = generate_img[..., 0]
    x_in_max = jnp.maximum(image_y, image_ir)

    # both msssim comparisons through ONE batched filter pyramid (2B): the
    # dynamic-range probe reads img1 = gen in both reference calls
    # (`loss.py:46-47` passes generate_img first), so batching is exact
    ms = msssim(jnp.concatenate([generate_img, generate_img], axis=0),
                jnp.concatenate([image_y, image_ir], axis=0),
                normalize=True, splits=2)
    ssim_value = 0.5 * (1.0 - ms[0]) + 0.5 * (1.0 - ms[1])

    loss_in = jnp.mean((x_in_max - generate_img) ** 2)

    y_grad = sobel_xy(image_y)
    ir_grad = sobel_xy(image_ir)
    gen_grad = sobel_xy(generate_img)
    joint = jnp.maximum(y_grad, ir_grad)
    loss_grad = jnp.mean(jnp.abs(joint - gen_grad))

    total = w_ssim * ssim_value + w_in * loss_in + w_grad * loss_grad
    return FusionLossOutput(total, loss_in, ssim_value, loss_grad)
