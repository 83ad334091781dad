"""Encoder/decoder and fusion blocks (NHWC, flax.linen).

`VSSBlock` reproduces `VSSBlock_new` (`models/cross.py:1297-1383`) and
`VSSBlockCross` reproduces `VSSBlock_Cross_new` (`models/cross.py:1262-1295`).
Checkpoint-relevant structure notes:
  * the LDC conv branch reads x_ssm + eca(x_ssm), not the block input
    (`models/cross.py:1365-1371`);
  * one shared BiAttn (`se`) gates both the SSM and conv branches (`:1372`);
  * the cross block's output is x1 + x2 + y + eca(y) (`:1294`), and its
    DropPath is constructed but never applied in forward.
"""
from __future__ import annotations

import flax.linen as nn

from .layers import (
    BiAttn,
    CrossLayer,
    DropPath,
    ECALayer,
    FusedLayerNorm,
    LDC,
    Mlp,
)
from .ss2d import SS2D, SS2DCross


class VSSBlock(nn.Module):
    dim: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    drop_path: float = 0.0
    mlp_ratio: float = 4.0
    mlp_drop: float = 0.0
    attn_drop: float = 0.0
    norm_eps: float = 1e-5
    scan_impl: str = "auto"
    # "light" remat: recompute only the cheap wide branches (Mlp with its
    # 4x hidden, BiAttn, ECA) in the backward instead of saving their
    # intermediates -- cuts activation HBM traffic WITHOUT re-running the
    # Pallas scan/dwconv kernels (unlike whole-block remat, which re-runs
    # them and measured a net loss at every batch size -- PERF.md)
    remat_light: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 dp_uni=None):  # x: (B, H, W, C); dp_uni: (2, >=B) uniforms
        eca_cls = nn.remat(ECALayer) if self.remat_light else ECALayer
        attn_cls = nn.remat(BiAttn) if self.remat_light else BiAttn
        mlp_cls = (nn.remat(Mlp, static_argnums=(2,))
                   if self.remat_light else Mlp)
        inp = x
        x = FusedLayerNorm(epsilon=self.norm_eps, name="norm")(x)
        x_ssm = SS2D(
            d_model=self.dim, d_state=self.d_state, ssm_ratio=self.ssm_ratio,
            dropout=self.attn_drop, scan_impl=self.scan_impl, name="op",
        )(x, deterministic=deterministic)
        x_eca = eca_cls(name="eca")(x_ssm)
        x = x_ssm + x_eca
        x_conv = LDC(self.dim, self.dim, name="conv_branch")(x)
        se = attn_cls(self.dim, name="se")
        x = se(x_ssm) + se(x_conv)
        x = inp + DropPath(self.drop_path, name="drop_path")(
            x, deterministic=deterministic,
            uni=None if dp_uni is None else dp_uni[0])
        if self.mlp_ratio > 0:
            h = FusedLayerNorm(epsilon=self.norm_eps, name="norm2")(x)
            h = mlp_cls(int(self.dim * self.mlp_ratio), self.dim,
                        drop=self.mlp_drop, name="mlp")(h, deterministic)
            x = x + DropPath(self.drop_path, name="drop_path2")(
                h, deterministic=deterministic,
                uni=None if dp_uni is None else dp_uni[1])
        return x


class VSSBlockCross(nn.Module):
    dim: int
    d_state: int = 16
    ssm_ratio: float = 2.0
    attn_drop: float = 0.0
    norm_eps: float = 1e-5
    scan_impl: str = "auto"

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        fuse = x1 + x2
        f1, f2 = CrossLayer(self.dim, name="cross_layer")(fuse, x1, x2)
        f1 = FusedLayerNorm(epsilon=self.norm_eps, name="ln_1")(f1)
        f2 = FusedLayerNorm(epsilon=self.norm_eps, name="ln_2")(f2)
        y = SS2DCross(
            d_model=self.dim, d_state=self.d_state, ssm_ratio=self.ssm_ratio,
            dropout=self.attn_drop, scan_impl=self.scan_impl,
            name="self_attention_cross",
        )(f1, f2, deterministic=deterministic)
        y_sp = ECALayer(name="self_attention_cross_spatial")(y)
        return x1 + x2 + y + y_sp
