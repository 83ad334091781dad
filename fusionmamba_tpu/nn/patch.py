"""Patch embedding / merging / expansion ops (NHWC, flax.linen).

Reproduces `models/vmamba_Fusion_efficross.py`: PatchEmbed2D (:151-174),
PatchMerging2D (:177-217), PatchExpand2D (:220-236),
Final_PatchExpand2D (:239-255). All pure layout + matmul; XLA lowers the
space-to-depth/depth-to-space to relayouts.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .initializers import torch_conv_bias, torch_conv_kernel, trunc_normal


class PatchEmbed(nn.Module):
    """4x4 stride-4 conv patchify + optional LayerNorm."""
    embed_dim: int = 96
    patch_size: int = 4
    use_norm: bool = True

    @nn.compact
    def __call__(self, x):  # (B, H, W, in_chans)
        p = self.patch_size
        fan_in = p * p * x.shape[-1]
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            kernel_init=torch_conv_kernel(),
            bias_init=torch_conv_bias(fan_in), name="proj")(x)
        if self.use_norm:
            x = nn.LayerNorm(name="norm")(x)
        return x


class PatchMerging(nn.Module):
    """2x2 space-to-depth + LN(4C) + Linear(4C -> 2C, no bias).

    Concat order matches the reference slices (h even/w even, h odd/w even,
    h even/w odd, h odd/w odd -- `vmamba_Fusion_efficross.py:200-211`)."""
    dim: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C); H, W assumed even
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False,
                     kernel_init=trunc_normal(0.02), name="reduction")(x)
        return x


class PatchExpand(nn.Module):
    """Linear(2d -> 4d, no bias) + 2x depth-to-space + LN(d).

    Input has 2*dim channels; output has dim channels at 2x resolution."""
    dim: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, 2*dim)
        B, H, W, C = x.shape
        c_out = C // 2
        x = nn.Dense(2 * C, use_bias=False,
                     kernel_init=trunc_normal(0.02), name="expand")(x)
        x = x.reshape(B, H, W, 2, 2, c_out)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, c_out)
        x = nn.LayerNorm(name="norm")(x)
        return x


class FinalPatchExpand(nn.Module):
    """Linear(d -> 4d, no bias) + 4x depth-to-space + LN(d/4)."""
    dim: int
    scale: int = 4

    @nn.compact
    def __call__(self, x):  # (B, H, W, dim)
        B, H, W, C = x.shape
        s = self.scale
        c_out = C // s
        x = nn.Dense(s * C, use_bias=False,
                     kernel_init=trunc_normal(0.02), name="expand")(x)
        x = x.reshape(B, H, W, s, s, c_out)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, s * H, s * W, c_out)
        x = nn.LayerNorm(name="norm")(x)
        return x
