"""SS2D modules: the VMamba 2-D selective-scan core (NHWC, flax.linen).

`SS2D` reproduces `models/cross.py:417-742` (v2 / "efficient" core with
stride-2 four-direction scan); `SS2DCross` reproduces `SS2D_cross_new`
(`models/cross.py:890-1230`) including its checkpoint-relevant quirks:
a single depthwise conv shared by both modalities (`:1212-1213`), the
pre-scan fusion x1*x2 + x1 + x2 (`:372`), and the z2 gate computed from the
already-activated z1 (`:1207-1209` -- z2 = silu(silu(z1_raw))).

The scan pipeline follows `cross_selective_scan` (`models/cross.py:266-337`):
efficient_scan -> per-direction x_proj einsum -> dt low-rank projection ->
fp32 selective scan (A = -exp(A_logs), delta_softplus) -> efficient_merge ->
LayerNorm. Projections run on the MXU via einsum with channels in lanes; the
K=4 directions are a batch axis of the fused Pallas kernel rather than a
channel-dim fold (reference folds K into channels, `models/cross.py:239`).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (
    cross_merge,
    cross_scan,
    efficient_merge,
    efficient_scan,
    selective_scan,
)
from ..ops.dwconv_pallas import depthwise_conv3x3
from .layers import FusedLayerNorm
from .initializers import (
    a_log_s4d,
    dt_proj_bias,
    dt_proj_weight,
    torch_conv_bias,
    torch_conv_kernel,
    trunc_normal,
)

K_DIRS = 4


class DepthwiseConv2d(nn.Module):
    """Depthwise 3x3 SAME conv via the Pallas kernel (XLA's depthwise
    lowering is ~100x off VPU peak -- ops/dwconv_pallas.py). Parameter
    layout matches nn.Conv's HWIO (3, 3, 1, C) so checkpoints are
    interchangeable. act="silu" fuses the SiLU epilogue into the kernel."""
    features: int
    use_bias: bool = True
    act: str = "none"

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", torch_conv_kernel(),
                       (3, 3, 1, self.features))
        b = (self.param("bias", torch_conv_bias(9), (self.features,))
             if self.use_bias else None)
        return depthwise_conv3x3(x, k[:, :, 0, :], b, act=self.act)


class _SSMCore(nn.Module):
    """Shared SSM parameter bundle + scan pipeline for SS2D and SS2DCross."""
    d_model: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    dt_rank: int | None = None
    scan_impl: str = "auto"
    # "efficient" = stride-2 decimated scan (reference forward_corev2, the
    # live default -- `models/cross.py:709-722`); "fullres" = full-resolution
    # 4-direction scan (reference forward_corev0 semantics,
    # `models/vmamba_Fusion_efficross.py:391-429`)
    scan_variant: str = "efficient"

    @property
    def d_inner(self) -> int:
        return int(self.ssm_ratio * self.d_model)

    @property
    def rank(self) -> int:
        return (math.ceil(self.d_model / 16)
                if self.dt_rank is None else self.dt_rank)

    @nn.compact
    def scan(self, x, gate=None, gate_act: str = "none"):
        # x: (B, H, W, d_inner); gate RAW (pre-activation) when gate_act
        # != "none" -- the activation runs inside the fused LN kernel
        B, H, W, D = x.shape
        N = self.d_state
        R = self.rank

        x_proj_weight = self.param(
            "x_proj_weight", dt_proj_weight(D),  # torch Linear default-free;
            (K_DIRS, R + 2 * N, D))
        dt_projs_weight = self.param(
            "dt_projs_weight", dt_proj_weight(R), (K_DIRS, D, R))
        dt_projs_bias = self.param(
            "dt_projs_bias", dt_proj_bias(), (K_DIRS, D))
        A_logs = self.param(
            "A_logs", a_log_s4d(N), (K_DIRS, D, N))
        Ds = self.param("Ds", nn.initializers.ones, (K_DIRS, D))

        fullres = self.scan_variant == "fullres"
        xs = cross_scan(x) if fullres else efficient_scan(x)  # (B, 4, L, D)
        x_dbl = jnp.einsum("bkld,kcd->bklc", xs, x_proj_weight)
        dts_low = x_dbl[..., :R]               # (B, 4, L, R) low-rank dt
        Bs = x_dbl[..., R:R + N]
        Cs = x_dbl[..., R + N:]

        # activations keep their dtype (bf16 under mixed precision -- every
        # scan impl converts to fp32 INTERNALLY, matching the reference's
        # fp32-in-kernel policy `models/cross.py:239-245`, and the Pallas
        # kernel does the convert in VMEM so bf16 halves its HBM traffic);
        # parameters A/D/bias always enter fp32.
        # dt stays LOW-RANK here: the dt_projs expansion to (B, 4, L, D)
        # runs inside the scan kernel on the MXU (prologue fusion -- the
        # expanded dt never exists in HBM; `models/cross.py:305-310`
        # semantics, MambaInnerFn fusion scope).
        As = -jnp.exp(A_logs.astype(jnp.float32))
        ys = selective_scan(
            xs, dts_low, As, Bs, Cs,
            Ds.astype(jnp.float32), dt_projs_bias.astype(jnp.float32),
            delta_softplus=True, impl=self.scan_impl,
            dt_lowrank_weight=dt_projs_weight)  # (B, 4, L, D)

        y = (cross_merge(ys, H, W) if fullres
             else efficient_merge(ys, H, W))         # (B, H, W, D)
        # fused LN + the callers' `y * z` gate (incl. the gate's silu
        # activation) in one Pallas pass (`models/cross.py:334-335` then
        # `:731,742` / `:1207-1209,1225-1229`);
        # eps 1e-5 = torch nn.LayerNorm default (`models/cross.py:472,945`)
        y = FusedLayerNorm(epsilon=1e-5, name="out_norm")(
            y, gate=gate, gate_act=gate_act)
        return y.astype(x.dtype)


class SS2D(_SSMCore):
    """Single-modal SS2D (`models/cross.py:417-742`, forward `:724-742`)."""
    d_conv: int = 3
    conv_bias: bool = True
    proj_bias: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # NHWC (B,H,W,d_model)
        d_exp = self.d_inner
        xz = nn.Dense(2 * d_exp, use_bias=self.proj_bias,
                      kernel_init=trunc_normal(0.02), name="in_proj")(x)
        xpart, z = jnp.split(xz, 2, axis=-1)
        # z stays RAW: its silu runs inside the fused out_norm gate
        # (`models/cross.py:731` z = silu(z); `:742` y * z); the conv's
        # SiLU rides the conv kernel's epilogue
        xpart = DepthwiseConv2d(d_exp, use_bias=self.conv_bias,
                                act="silu", name="conv2d")(xpart)
        y = self.scan(xpart, gate=z, gate_act="silu")
        out = nn.Dense(self.d_model, use_bias=self.proj_bias,
                       kernel_init=trunc_normal(0.02), name="out_proj")(y)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class SS2DCross(_SSMCore):
    """Cross-modal SS2D (`models/cross.py:890-1230`)."""
    d_conv: int = 3
    conv_bias: bool = True
    proj_bias: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        d_exp = self.d_inner
        xz1 = nn.Dense(2 * d_exp, use_bias=self.proj_bias,
                       kernel_init=trunc_normal(0.02), name="in_proj1")(x1)
        xz2 = nn.Dense(2 * d_exp, use_bias=self.proj_bias,
                       kernel_init=trunc_normal(0.02), name="in_proj2")(x2)
        x1p, z1 = jnp.split(xz1, 2, axis=-1)
        x2p, _z2_unused = jnp.split(xz2, 2, axis=-1)
        # reference quirk (`models/cross.py:1207-1209`): z1 = act(z1), then
        # z2 = act(z1) reads the already-activated z1. The whole dual gate
        # y*z1 + y*z2 = y*(silu(raw) + silu(silu(raw))) runs inside the
        # fused LN ("silu_sum") from the RAW z1.

        conv = DepthwiseConv2d(d_exp, use_bias=self.conv_bias,
                               act="silu",
                               name="conv2d")  # shared (`:1212-1213`)
        x1p = conv(x1p)
        x2p = conv(x2p)

        fused = x1p * x2p + x1p + x2p  # pre-scan fusion (`:372`)
        y = self.scan(fused, gate=z1, gate_act="silu_sum")
        out = nn.Dense(self.d_model, use_bias=self.proj_bias,
                       kernel_init=trunc_normal(0.02), name="out_proj")(y)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out
