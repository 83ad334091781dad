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

from .ssim import msssim

_SOBEL_X = jnp.asarray(
    [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], jnp.float32)
_SOBEL_Y = jnp.asarray(
    [[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]], jnp.float32)


def sobel_xy(x: jnp.ndarray) -> jnp.ndarray:
    """|sobel_x| + |sobel_y| on NHWC single-channel, SAME padding."""
    k = jnp.stack([_SOBEL_X, _SOBEL_Y], axis=-1)[:, :, None, :]  # (3,3,1,2)
    g = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return jnp.abs(g[..., :1]) + jnp.abs(g[..., 1:])


class FusionLossOutput(NamedTuple):
    total: jnp.ndarray
    loss_in: jnp.ndarray
    ssim_value: jnp.ndarray
    loss_grad: jnp.ndarray


def fusion_loss(image_vis_y: jnp.ndarray, image_ir: jnp.ndarray,
                generate_img: jnp.ndarray,
                w_ssim: float = 100.0, w_in: float = 10.0,
                w_grad: float = 1.0) -> FusionLossOutput:
    image_y = image_vis_y[..., :1]
    x_in_max = jnp.maximum(image_y, image_ir)

    ms1 = msssim(generate_img, image_y, normalize=True)
    ms2 = msssim(generate_img, image_ir, normalize=True)
    ssim_value = 0.5 * (1.0 - ms1) + 0.5 * (1.0 - ms2)

    loss_in = jnp.mean((x_in_max - generate_img) ** 2)

    y_grad = sobel_xy(image_y)
    ir_grad = sobel_xy(image_ir)
    gen_grad = sobel_xy(generate_img)
    joint = jnp.maximum(y_grad, ir_grad)
    loss_grad = jnp.mean(jnp.abs(joint - gen_grad))

    total = w_ssim * ssim_value + w_in * loss_in + w_grad * loss_grad
    return FusionLossOutput(total, loss_in, ssim_value, loss_grad)
