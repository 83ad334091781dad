"""Primitive layers of the fusion network (NHWC, flax.linen).

Each class documents the reference component it reproduces (file:line in
/root/reference) including the quirks that shape trained-checkpoint parity.
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.ln_pallas import layer_norm_fused, ln_spatial_mean
from .initializers import torch_conv_bias, torch_conv_kernel, trunc_normal


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


class FusedLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm (+ optional fused gate multiply) backed by the
    Pallas fused-LN kernel (ops/ln_pallas.py -- the reference's Triton
    layernorm analog, `mamba_ssm/ops/triton/layernorm.py`). Param tree is
    identical to nn.LayerNorm, so checkpoints are interchangeable; numerics
    match flax (fp32 fast-variance stats)."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x, gate=None, gate_act: str = "none"):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return layer_norm_fused(x, scale, bias, gate, eps=self.epsilon,
                                gate_act=gate_act)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath used at
    `models/cross.py:1353,1374-1376`).

    `uni`, if given, is a precomputed per-sample uniform(0,1) row (at least
    batch wide) from which the keep mask is thresholded -- the model draws
    ONE uniform table per step instead of one flax make_rng per DropPath.
    The per-module make_rng path folds the module path into the key with a
    chain of tiny u32 kernels; at 60 DropPath instances that storm measured
    ~80 ms/step of device time at b24 (PERF.md)."""
    rate: float = 0.0
    deterministic: bool | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool | None = None, uni=None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic)
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        if uni is None:
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, shape)
        else:
            mask = (uni[: x.shape[0]] < keep).reshape(shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Dense(nn.Dense):
    """nn.Dense with the reference's trunc_normal(0.02)/zeros init
    (`vmamba_Fusion_efficross.py:845-848`)."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("kernel_init", trunc_normal(0.02))
        super().__init__(*args, **kwargs)


class LDC(nn.Module):
    """Learnable central-difference conv (`models/cross.py:790-814`).

    Effective weight = W * (1 - theta * M[i,o] * center_mask * sum_k W[.,i,o])
    where M is a learnable per-(in,out) mask and theta a learnable scalar
    (both init 1 and 0.5). Stored in HWIO; groups=1, 3x3, pad 1, no bias
    (reference default bias=False).
    """
    in_channels: int
    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        w = self.param(
            "kernel", torch_conv_kernel(),
            (k, k, self.in_channels, self.out_channels))
        learnable_mask = self.param(
            "learnable_mask", nn.initializers.ones,
            (self.in_channels, self.out_channels))
        theta = self.param(
            "learnable_theta", lambda key, shape: 0.5 * jnp.ones(shape),
            (1,))
        center = jnp.zeros((k, k, 1, 1), w.dtype).at[
            k // 2, k // 2, 0, 0].set(1.0)
        wsum = jnp.sum(w, axis=(0, 1), keepdims=True)   # (1,1,I,O)
        mask = 1.0 - theta * learnable_mask[None, None] * center * wsum
        eff_w = w * mask
        return jax.lax.conv_general_dilated(
            x, eff_w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ECALayer(nn.Module):
    """Efficient channel attention (`models/cross.py:1233-1259`): GAP over
    space -> conv1d(k=3) across the channel axis -> sigmoid gate."""
    k_size: int = 3

    @nn.compact
    def __call__(self, x):  # NHWC
        w = self.param(
            "conv_kernel", torch_conv_bias(self.k_size), (self.k_size,))
        m = jnp.mean(x, axis=(1, 2))             # (B, C)
        # the k-tap SAME conv over the channel axis as explicit shifted
        # multiply-adds: a (B, C, 1) conv_general_dilated lowers to a
        # standalone convolution-fusion launch per call site (~40 of them
        # per step, fwd+bwd), while these few elementwise ops fuse into
        # the surrounding graph. Identical math (zero-padded taps).
        half = self.k_size // 2
        mp = jnp.pad(m, ((0, 0), (half, half)))
        C = m.shape[-1]
        y = sum(w[i] * jax.lax.dynamic_slice_in_dim(mp, i, C, axis=1)
                for i in range(self.k_size))
        gate = jax.nn.sigmoid(y)
        return x * gate[:, None, None, :]


class _BareLNParams(nn.Module):
    """LayerNorm scale/bias parameters only, param tree identical to
    nn.LayerNorm / FusedLayerNorm (checkpoint-interchangeable)."""
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class BiAttn(nn.Module):
    """Global channel attention (`models/cross.py:744-768`): LN -> spatial
    mean -> reduce(0.125x) -> GELU -> expand -> sigmoid -> scale input.

    The LN output feeds ONLY the spatial mean, so the LN + mean run as one
    fused reduction (ops/ln_pallas.py::ln_spatial_mean): the full-width
    normalized tensor never exists in HBM in either direction. Param tree
    ("norm"/scale+bias) stays identical to the unfused nn.LayerNorm form,
    so checkpoints are interchangeable."""
    in_channels: int
    act_ratio: float = 0.125

    @nn.compact
    def __call__(self, x):  # NHWC
        C = x.shape[-1]
        reduce_ch = int(self.in_channels * self.act_ratio)
        scale, bias = _BareLNParams(C, name="norm")()
        # eps 1e-5 = torch nn.LayerNorm default (`models/cross.py:748`)
        g = ln_spatial_mean(x, scale, bias, eps=1e-5)  # (B, C) fp32
        g = g.astype(x.dtype)[:, None, None, :]
        g = gelu_exact(Dense(reduce_ch, name="global_reduce")(g))
        attn = jax.nn.sigmoid(Dense(self.in_channels, name="channel_select")(g))
        return x * attn


class _DenseParams(nn.Module):
    """nn.Dense's parameters (kernel (in, out) + bias (out,)) without its
    compute -- param tree identical to `Dense`, so checkpoints are
    interchangeable with the unfused Mlp form."""
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", trunc_normal(0.02),
                           (self.in_features, self.features)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class Mlp(nn.Module):
    """2-layer GELU MLP (`models/cross.py:770-788`).

    On TPU with inactive dropout (the shipped configs set drop=0.0, like
    the reference's instantiations) the whole block runs as ONE fused
    Pallas kernel (ops/mlp_pallas.py): the 4x-wide hidden activations
    never round-trip HBM in either direction (the unfused form was the
    single largest non-scan profile slice, 37.6 ms/step at b24 bf16 --
    bench_artifacts/r5/)."""
    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        C = x.shape[-1]
        w1, b1 = _DenseParams(C, self.hidden, name="fc1")()
        w2, b2 = _DenseParams(self.hidden, self.out, name="fc2")()

        if self.drop > 0.0 and not deterministic:
            # dropout needs the unfused form (rng masks between the layers);
            # flax modules are created OUTSIDE any lax branch
            h = gelu_exact(x @ w1 + b1)
            h = nn.Dropout(self.drop)(h, deterministic=False)
            y = h @ w2 + b2
            return nn.Dropout(self.drop)(y, deterministic=False)

        from ..ops.mlp_pallas import fused_mlp
        return jax.lax.platform_dependent(
            tpu=lambda: fused_mlp(x, w1, b1, w2, b2),
            default=lambda: gelu_exact(x @ w1 + b1) @ w2 + b2)


class DifferentialEnhance(nn.Module):
    """Cross-modal difference gating (`models/cross.py:843-864`):
    w12 = sigmoid(GAP(x1-x2)), F1 = w12*fuse + x1 (and symmetrically F2).
    The reference also constructs an unused `lastconv`; omitted here."""

    @nn.compact
    def __call__(self, fuse, x1, x2):
        w12 = jax.nn.sigmoid(jnp.mean(x1 - x2, axis=(1, 2), keepdims=True))
        w21 = jax.nn.sigmoid(jnp.mean(x2 - x1, axis=(1, 2), keepdims=True))
        return w12 * fuse + x1, w21 * fuse + x2


class CrossLayer(nn.Module):
    """Texture + differential enhancement (`models/cross.py:866-888`):
    F_i = LDC_i(x_i) + DiffEnhance(fuse, x1, x2)_i."""
    dim: int

    @nn.compact
    def __call__(self, fuse, x1, x2):
        tx1 = LDC(self.dim, self.dim, name="texture_enhance1")(x1)
        tx2 = LDC(self.dim, self.dim, name="texture_enhance2")(x2)
        df1, df2 = DifferentialEnhance(name="diff_enhance")(fuse, x1, x2)
        return tx1 + df1, tx2 + df2


class SegmentationHead(nn.Module):
    """Seg head (`vmamba_Fusion_efficross.py:932-992`): two conv3x3+BN+ReLU,
    1x1 sigmoid attention gate, dropout, 1x1 classifier."""
    in_channels: int
    num_classes: int
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # NHWC
        c2 = self.in_channels * 2

        def conv(ch, k, name):
            return nn.Conv(
                ch, (k, k), padding="SAME", name=name,
                kernel_init=nn.initializers.kaiming_normal(),
                bias_init=nn.initializers.zeros)

        x = conv(c2, 3, "conv1")(x)
        x = nn.BatchNorm(use_running_average=deterministic, name="bn1")(x)
        x = jax.nn.relu(x)
        x = conv(c2, 3, "conv2")(x)
        x = nn.BatchNorm(use_running_average=deterministic, name="bn2")(x)
        x = jax.nn.relu(x)
        att = jax.nn.sigmoid(conv(c2, 1, "attention")(x))
        x = x * att
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return conv(self.num_classes, 1, "final_conv")(x)
