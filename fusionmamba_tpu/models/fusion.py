"""VSSMFusion: U-shaped dual-encoder VMamba fusion network (NHWC).

Reproduces `VSSM_Fusion` (`models/vmamba_Fusion_efficross.py:753-929`) and
`VSSM_Fusion_Segmentation` (`:995-1078`) in flax.linen:

  * one shared encoder trunk applied to both modalities (the reference runs
    `self.layers` twice via forward_features_1/2, `:861-883`), two separate
    patch embeddings;
  * per-scale cross-modal fusion of the skip tensors through four
    `VSSBlockCross` (`:885-890`);
  * decoder adds fused skips before each up stage except the first
    (`:892-899`);
  * head: FinalPatchExpand + 1x1 conv to 1 channel, then the
    `out + 2*x1 + 2*x2` residual (`:927`, duplicated adds preserved).

I/O is NHWC: x1, x2 are (B, H, W, in_chans); output (B, H, W, 1).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import FusionModelConfig
from ..nn.blocks import VSSBlock, VSSBlockCross
from ..nn.initializers import torch_conv_bias, torch_conv_kernel
from ..nn.layers import SegmentationHead
from ..nn.patch import FinalPatchExpand, PatchEmbed, PatchExpand, PatchMerging


class VSSStage(nn.Module):
    """Encoder stage: depth x VSSBlock, then optional PatchMerging
    (`vmamba_Fusion_efficross.py:622-685`)."""
    dim: int
    depth: int
    drop_paths: Sequence[float]
    d_state: int
    ssm_ratio: float
    mlp_ratio: float
    attn_drop: float
    norm_eps: float
    scan_impl: str
    downsample: bool
    remat: bool = False
    remat_light: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dp_uni=None):
        block_cls = _remat_block if self.remat else VSSBlock
        for i in range(self.depth):
            x = block_cls(
                dim=self.dim, d_state=self.d_state, ssm_ratio=self.ssm_ratio,
                drop_path=self.drop_paths[i], mlp_ratio=self.mlp_ratio,
                attn_drop=self.attn_drop, norm_eps=self.norm_eps,
                scan_impl=self.scan_impl, remat_light=self.remat_light,
                name=f"block{i}",
            )(x, deterministic, None if dp_uni is None else dp_uni[i])
        if self.downsample:
            x = PatchMerging(self.dim, name="downsample")(x)
        return x


class VSSStageUp(nn.Module):
    """Decoder stage: optional PatchExpand first, then depth x VSSBlock
    (`vmamba_Fusion_efficross.py:688-749`)."""
    dim: int
    depth: int
    drop_paths: Sequence[float]
    d_state: int
    ssm_ratio: float
    mlp_ratio: float
    attn_drop: float
    norm_eps: float
    scan_impl: str
    upsample: bool
    remat: bool = False
    remat_light: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dp_uni=None):
        if self.upsample:
            x = PatchExpand(self.dim, name="upsample")(x)
        block_cls = _remat_block if self.remat else VSSBlock
        for i in range(self.depth):
            x = block_cls(
                dim=self.dim, d_state=self.d_state, ssm_ratio=self.ssm_ratio,
                drop_path=self.drop_paths[i], mlp_ratio=self.mlp_ratio,
                attn_drop=self.attn_drop, norm_eps=self.norm_eps,
                scan_impl=self.scan_impl, remat_light=self.remat_light,
                name=f"block{i}",
            )(x, deterministic, None if dp_uni is None else dp_uni[i])
        return x


# jax.checkpoint around each block: recompute its activations in the
# backward instead of saving them (`deterministic` is static arg 2)
_remat_block = nn.remat(VSSBlock, static_argnums=(2,))


class _FinalConv(nn.Module):
    """1x1 conv C->1, param tree identical to nn.Conv(1, (1, 1)).

    In compact mode the input is the PRE-depth-to-space tensor
    (B, H, W, groups*C) from FinalPatchExpand(compact=True); the conv is a
    block-diagonal (groups*C, groups) matmul followed by the deferred
    depth-to-space of the scalar outputs -- exactly conv(depth_to_space(x))
    but on full-width lanes (see nn/patch.py docstring)."""
    c_in: int
    scale: int = 4

    @nn.compact
    def __call__(self, x, compact: bool = False):
        k = self.param("kernel", torch_conv_kernel(), (1, 1, self.c_in, 1))
        b = self.param("bias", torch_conv_bias(self.c_in), (1,))
        kvec = k[0, 0, :, 0]
        if not compact:
            return (jnp.einsum("bhwc,c->bhw", x, kvec.astype(x.dtype))
                    + b.astype(x.dtype))[..., None]
        B, H, W, F = x.shape
        s = self.scale
        groups = F // self.c_in
        # block-diagonal weights built differentiably from the conv kernel
        mask = jnp.asarray(
            (np.arange(F)[:, None] // self.c_in
             == np.arange(groups)[None, :]).astype(np.float32))
        wblk = jnp.tile(kvec, groups)[:, None] * mask
        y = jnp.einsum("bhwf,fg->bhwg", x.astype(jnp.float32), wblk,
                       precision=jax.lax.Precision.HIGHEST) + b
        y = y.reshape(B, H, W, s, s).transpose(0, 1, 3, 2, 4)
        return y.reshape(B, s * H, s * W, 1).astype(x.dtype)


def _dpr_schedule(rate: float, depths: Sequence[int]):
    total = sum(depths)
    vals = [float(v) for v in np.linspace(0.0, rate, total)]
    out, idx = [], 0
    for d in depths:
        out.append(tuple(vals[idx:idx + d]))
        idx += d
    return out


class VSSMFusion(nn.Module):
    cfg: FusionModelConfig

    def setup(self):
        c = self.cfg
        nl = len(c.depths)
        dims = c.dims
        dims_dec = c.dims_decoder
        dpr = _dpr_schedule(c.drop_path_rate, c.depths)
        dpr_dec_flat = [float(v) for v in np.linspace(
            0.0, c.drop_path_rate, sum(c.depths_decoder))][::-1]
        dpr_dec, idx = [], 0
        for d in c.depths_decoder:
            dpr_dec.append(tuple(dpr_dec_flat[idx:idx + d]))
            idx += d

        self.patch_embed1 = PatchEmbed(dims[0], c.patch_size, c.patch_norm)
        self.patch_embed2 = PatchEmbed(dims[0], c.patch_size, c.patch_norm)
        self.pos_drop = nn.Dropout(c.drop_rate)

        common = dict(
            d_state=c.d_state, ssm_ratio=c.ssm_ratio, mlp_ratio=c.mlp_ratio,
            attn_drop=c.attn_drop_rate, norm_eps=c.norm_eps,
            scan_impl=c.scan_impl, remat=c.remat,
            remat_light=c.remat_light)
        self.layers = [
            VSSStage(dim=dims[i], depth=c.depths[i], drop_paths=dpr[i],
                     downsample=(i < nl - 1), **common)
            for i in range(nl)
        ]
        self.layers_up = [
            VSSStageUp(dim=dims_dec[i], depth=c.depths_decoder[i],
                       drop_paths=dpr_dec[i], upsample=(i != 0), **common)
            for i in range(nl)
        ]
        self.cross_blocks = [
            VSSBlockCross(dim=dims[i], d_state=c.d_state,
                          ssm_ratio=c.ssm_ratio,
                          attn_drop=c.attn_drop_rate, norm_eps=c.norm_eps,
                          scan_impl=c.scan_impl)
            for i in range(nl)
        ]
        self.final_up = FinalPatchExpand(dims_dec[-1], scale=4)
        self.final_conv = _FinalConv(dims_dec[-1] // 4, scale=4)

    def _dp_tables(self, width, deterministic):
        """ONE uniform table per step covering every DropPath draw (2 per
        VSSBlock). Returns (enc, dec): per-stage arrays (depth, 2, width),
        or (None, None) when no draw happens. Replaces 60 per-module flax
        make_rng calls whose module-path fold-in chains cost ~80 ms/step of
        tiny u32 kernels at b24 (PERF.md) with a single RNG op."""
        c = self.cfg
        if deterministic or c.drop_path_rate == 0.0:
            return None, None
        n = 2 * (sum(c.depths) + sum(c.depths_decoder))
        uni = jax.random.uniform(self.make_rng("dropout"), (n, width))
        out, off = [], 0
        for d in list(c.depths) + list(c.depths_decoder):
            out.append(uni[off:off + 2 * d].reshape(d, 2, width))
            off += 2 * d
        k = len(c.depths)
        return out[:k], out[k:]

    def encode_pair(self, x1, x2, deterministic=True, dp_tables=None):
        """Run the SHARED encoder trunk once on both modalities batched
        together (2B). The reference iterates `self.layers` twice with the
        same weights (forward_features_1/2, `vmamba_Fusion_efficross.py:861-883`);
        mathematically identical per-sample, but one 2B pass halves the
        number of scan-kernel launches and doubles their size (the deep
        stages are launch-bound at batch 6)."""
        x = jnp.concatenate([self.patch_embed1(x1), self.patch_embed2(x2)],
                            axis=0)
        x = self.pos_drop(x, deterministic=deterministic)
        skips = []
        for i, layer in enumerate(self.layers):
            skips.append(x)
            x = layer(x, deterministic=deterministic,
                      dp_uni=None if dp_tables is None else dp_tables[i])
        return x, skips  # concatenated (2B, ...) tensors

    def decode(self, x, fused_skips, deterministic=True, dp_tables=None):
        for i, layer_up in enumerate(self.layers_up):
            if i > 0:
                x = x + fused_skips[-i]
            x = layer_up(x, deterministic=deterministic,
                         dp_uni=None if dp_tables is None else dp_tables[i])
        return x

    def features(self, x1, x2, deterministic=True, compact_tail=False):
        """Run the full network up to (and including) final_up; returns the
        (B, H, W, dims[0]//4) feature map the seg head and fusion head share
        (`vmamba_Fusion_efficross.py:1052-1060`). With compact_tail=True the
        depth-to-space of final_up is deferred (see FinalPatchExpand)."""
        enc_dp, dec_dp = self._dp_tables(2 * x1.shape[0], deterministic)
        ecat, skips = self.encode_pair(x1, x2, deterministic,
                                       dp_tables=enc_dp)
        e1, e2 = jnp.split(ecat, 2, axis=0)
        x = e1 + e2
        fused = [
            cross(*jnp.split(s, 2, axis=0), deterministic=deterministic)
            for cross, s in zip(self.cross_blocks, skips)
        ]
        x = self.decode(x, fused, deterministic, dp_tables=dec_dp)
        return self.final_up(x, compact=compact_tail)

    def __call__(self, x1, x2, deterministic: bool = True):
        compact = self.cfg.fused_tail
        feats = self.features(x1, x2, deterministic, compact_tail=compact)
        out = self.final_conv(feats, compact=compact)
        # reference residual `x + x_1 + x_2 + x_1 + x_2` (:927 via :1065)
        return out + 2.0 * x1 + 2.0 * x2


class VSSMFusionSeg(nn.Module):
    """Fusion + segmentation heads sharing one trunk
    (`vmamba_Fusion_efficross.py:995-1078`)."""
    cfg: FusionModelConfig

    def setup(self):
        self.fusion_model = VSSMFusion(self.cfg)
        self.segmentation_head = SegmentationHead(
            in_channels=self.cfg.dims_decoder[-1] // 4,
            num_classes=self.cfg.num_seg_classes,
            dropout_rate=0.3)

    def __call__(self, x1, x2, deterministic: bool = True,
                 return_fusion: bool = True, return_segmentation: bool = True):
        feats = self.fusion_model.features(x1, x2, deterministic)
        out = {}
        if return_segmentation:
            out["segmentation"] = self.segmentation_head(
                feats, deterministic=deterministic)
        if return_fusion:
            fused = self.fusion_model.final_conv(feats)
            out["fusion"] = fused + 2.0 * x1 + 2.0 * x2
        return out
