"""Patch embedding / merging / expansion ops (NHWC, flax.linen).

Reproduces `models/vmamba_Fusion_efficross.py`: PatchEmbed2D (:151-174),
PatchMerging2D (:177-217), PatchExpand2D (:220-236),
Final_PatchExpand2D (:239-255). All pure layout + matmul; XLA lowers the
space-to-depth/depth-to-space to relayouts.
"""
from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .initializers import torch_conv_bias, torch_conv_kernel, trunc_normal
from .layers import FusedLayerNorm

# the reference patch ops use bare torch nn.LayerNorm -> eps 1e-5
# (`vmamba_Fusion_efficross.py:151-255`); FusedLayerNorm routes the hot
# (B, H, W, C) norms through the Pallas LN kernel (ops/ln_pallas.py)
_EPS = 1e-5


@functools.lru_cache(maxsize=None)
def _group_avg_matrix(groups: int, width: int) -> np.ndarray:
    """(groups*width, groups) block matrix averaging each width-chunk."""
    m = np.zeros((groups * width, groups), np.float32)
    for g in range(groups):
        m[g * width:(g + 1) * width, g] = 1.0 / width
    return m


@functools.lru_cache(maxsize=None)
def _group_bcast_matrix(groups: int, width: int) -> np.ndarray:
    """(groups, groups*width) block matrix replicating per-group values."""
    return (_group_avg_matrix(groups, width).T * width).astype(np.float32)


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
            x = FusedLayerNorm(epsilon=_EPS, name="norm")(x)
        return x


class PatchMerging(nn.Module):
    """2x2 space-to-depth + LN(4C) + Linear(4C -> 2C, no bias).

    Concat order matches the reference slices (h even/w even, h odd/w even,
    h even/w odd, h odd/w odd -- `vmamba_Fusion_efficross.py:200-211`),
    expressed as ONE reshape/transpose (channel group order (wp, hp)) so
    XLA lowers a single relayout instead of four strided gathers + a
    concatenate; bit-identical to the slice form (tests)."""
    dim: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C); H, W assumed even
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # (B, H2, hp, W2, wp, C) -> (B, H2, W2, wp, hp, C): flattening
        # (wp, hp) yields groups (0,0),(0,1),(1,0),(1,1) = the reference's
        # x0 (he,we), x1 (ho,we), x2 (he,wo), x3 (ho,wo) concat order
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(B, H // 2, W // 2, 4 * C)
        x = FusedLayerNorm(epsilon=_EPS, name="norm")(x)
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
        x = FusedLayerNorm(epsilon=_EPS, name="norm")(x)
        return x


class _LNParams(nn.Module):
    """Bare LayerNorm scale/bias parameters, matching nn.LayerNorm's param
    tree exactly (so checkpoints are interchangeable with the unfused path).
    """
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class FinalPatchExpand(nn.Module):
    """Linear(d -> 4d, no bias) + 4x depth-to-space + LN(d/4).

    With compact=True the depth-to-space is DEFERRED: the LN is computed in
    the pre-expand (B, H, W, s*s*c_out) layout as a grouped normalization
    over each c_out-channel group (depth-to-space maps group (s1, s2) to
    output position (s*h+s1, s*w+s2), so this is bit-equivalent math), and
    the compact tensor is returned. At 256^2 output with c_out=24, the
    post-expand layout uses 24 of 128 vector lanes; the compact layout is
    full-width and the group statistics ride the MXU as block-matrix dots.
    """
    dim: int
    scale: int = 4

    @nn.compact
    def __call__(self, x, compact: bool = False):  # (B, H, W, dim)
        B, H, W, C = x.shape
        s = self.scale
        c_out = C // s
        x = nn.Dense(s * C, use_bias=False,
                     kernel_init=trunc_normal(0.02), name="expand")(x)
        if not compact:
            x = x.reshape(B, H, W, s, s, c_out)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, s * H, s * W, c_out)
            x = FusedLayerNorm(epsilon=_EPS, name="norm")(x)
            return x
        gamma, beta = _LNParams(c_out, name="norm")()
        groups = s * s
        xf = x.astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST  # fp32 stats like nn.LayerNorm
        mavg = jnp.asarray(_group_avg_matrix(groups, c_out))
        bcast = jnp.asarray(_group_bcast_matrix(groups, c_out))
        mu = jnp.einsum("bhwc,cg->bhwg", xf, mavg, precision=hp)
        ex2 = jnp.einsum("bhwc,cg->bhwg", xf * xf, mavg, precision=hp)
        var = ex2 - mu * mu  # use_fast_variance; eps = torch LN default
        rs = jax.lax.rsqrt(var + _EPS)
        mu_b = jnp.einsum("bhwg,gc->bhwc", mu, bcast, precision=hp)
        rs_b = jnp.einsum("bhwg,gc->bhwc", rs, bcast, precision=hp)
        y = (xf - mu_b) * rs_b * jnp.tile(gamma, groups) + jnp.tile(
            beta, groups)
        return y.astype(x.dtype)
