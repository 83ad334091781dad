"""PyTorch .pth <-> flax params converter for VSSMFusion(+Seg).

Table-driven: `fusion_key_map(depths, depths_decoder)` enumerates every
(torch_key, flax_path, transform) triple of the reference `VSSM_Fusion`
state_dict (`models/vmamba_Fusion_efficross.py:753-929`), so import
(`convert_fusion_state_dict`) and export (`export_torch_state_dict`) share
one mapping and round-trip exactly.

Layout transforms:
  * linear  : Linear weight (out, in)         <-> Dense kernel (in, out)
  * conv    : Conv2d weight (O, I, kh, kw)    <-> HWIO (kh, kw, I, O)
  * eca     : Conv1d weight (1, 1, k)         <-> (k,)
  * mask_t  : LDC learnable_mask (out, in)    <-> (in, out)
  * a_logs  : (K*D, N)                        <-> (K, D, N)
  * ds      : (K*D,)                          <-> (K, D)
  * none    : identity

Torch keys with no JAX counterpart are ignored on import: LDC `base_mask`
(constant ones), `Diff_enhance.lastconv.*` (constructed but unused in the
reference forward, `models/cross.py:849`); export re-synthesizes them so the
reference model can `load_state_dict` strictly.
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, Tuple

import numpy as np

K_DIRS = 4


def _t(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


# transform registry: torch->flax and flax->torch
_FWD = {
    "none": lambda x: x,
    "linear": lambda x: x.T,
    "conv": lambda x: x.transpose(2, 3, 1, 0),
    "eca": lambda x: x.reshape(-1),
    "mask_t": lambda x: x.T,
    "a_logs": lambda x: x.reshape(K_DIRS, -1, x.shape[-1]),
    "ds": lambda x: x.reshape(K_DIRS, -1),
}
_BWD = {
    "none": lambda x: x,
    "linear": lambda x: x.T,
    "conv": lambda x: x.transpose(3, 2, 0, 1),
    "eca": lambda x: x.reshape(1, 1, -1),
    "mask_t": lambda x: x.T,
    "a_logs": lambda x: x.reshape(-1, x.shape[-1]),
    "ds": lambda x: x.reshape(-1),
}

MapEntry = Tuple[str, Tuple[str, ...], str]


def _layernorm(tk: str, fp: Tuple[str, ...]) -> Iterator[MapEntry]:
    yield tk + ".weight", fp + ("scale",), "none"
    yield tk + ".bias", fp + ("bias",), "none"


def _linear(tk: str, fp: Tuple[str, ...], bias: bool) -> Iterator[MapEntry]:
    yield tk + ".weight", fp + ("kernel",), "linear"
    if bias:
        yield tk + ".bias", fp + ("bias",), "none"


def _conv(tk: str, fp: Tuple[str, ...], bias: bool = True) -> Iterator[MapEntry]:
    yield tk + ".weight", fp + ("kernel",), "conv"
    if bias:
        yield tk + ".bias", fp + ("bias",), "none"


def _ldc(tk: str, fp: Tuple[str, ...]) -> Iterator[MapEntry]:
    yield tk + ".conv.weight", fp + ("kernel",), "conv"
    yield tk + ".learnable_mask", fp + ("learnable_mask",), "mask_t"
    yield tk + ".learnable_theta", fp + ("learnable_theta",), "none"


def _eca(tk: str, fp: Tuple[str, ...]) -> Iterator[MapEntry]:
    yield tk + ".conv.weight", fp + ("conv_kernel",), "eca"


def _ssm_core(tk: str, fp: Tuple[str, ...]) -> Iterator[MapEntry]:
    yield tk + ".x_proj_weight", fp + ("x_proj_weight",), "none"
    yield tk + ".dt_projs_weight", fp + ("dt_projs_weight",), "none"
    yield tk + ".dt_projs_bias", fp + ("dt_projs_bias",), "none"
    yield tk + ".A_logs", fp + ("A_logs",), "a_logs"
    yield tk + ".Ds", fp + ("Ds",), "ds"
    yield from _layernorm(tk + ".out_norm", fp + ("out_norm",))


def _ss2d(tk: str, fp: Tuple[str, ...]) -> Iterator[MapEntry]:
    yield from _linear(tk + ".in_proj", fp + ("in_proj",), bias=False)
    yield from _conv(tk + ".conv2d", fp + ("conv2d",))
    yield from _ssm_core(tk, fp)
    yield from _linear(tk + ".out_proj", fp + ("out_proj",), bias=False)


def _ss2d_cross(tk: str, fp: Tuple[str, ...]) -> Iterator[MapEntry]:
    yield from _linear(tk + ".in_proj1", fp + ("in_proj1",), bias=False)
    yield from _linear(tk + ".in_proj2", fp + ("in_proj2",), bias=False)
    yield from _conv(tk + ".conv2d", fp + ("conv2d",))
    yield from _ssm_core(tk, fp)
    yield from _linear(tk + ".out_proj", fp + ("out_proj",), bias=False)


def _biattn(tk: str, fp: Tuple[str, ...]) -> Iterator[MapEntry]:
    yield from _layernorm(tk + ".norm", fp + ("norm",))
    yield from _linear(tk + ".global_reduce", fp + ("global_reduce",), True)
    yield from _linear(tk + ".channel_select", fp + ("channel_select",), True)


def _vss_block(tk: str, fp: Tuple[str, ...]) -> Iterator[MapEntry]:
    yield from _layernorm(tk + ".norm", fp + ("norm",))
    yield from _ss2d(tk + ".op", fp + ("op",))
    yield from _ldc(tk + ".conv_branch", fp + ("conv_branch",))
    yield from _eca(tk + ".self_attention_cross_channel", fp + ("eca",))
    yield from _biattn(tk + ".se", fp + ("se",))
    yield from _layernorm(tk + ".norm2", fp + ("norm2",))
    yield from _linear(tk + ".mlp.fc1", fp + ("mlp", "fc1"), True)
    yield from _linear(tk + ".mlp.fc2", fp + ("mlp", "fc2"), True)


def _cross_block(tk: str, fp: Tuple[str, ...]) -> Iterator[MapEntry]:
    yield from _layernorm(tk + ".ln_1", fp + ("ln_1",))
    yield from _layernorm(tk + ".ln_2", fp + ("ln_2",))
    yield from _ldc(tk + ".Cross_layer.texture_enhance1",
                    fp + ("cross_layer", "texture_enhance1"))
    yield from _ldc(tk + ".Cross_layer.texture_enhance2",
                    fp + ("cross_layer", "texture_enhance2"))
    yield from _ss2d_cross(tk + ".self_attention_cross",
                           fp + ("self_attention_cross",))
    yield from _eca(tk + ".self_attention_cross_spatial",
                    fp + ("self_attention_cross_spatial",))


def fusion_key_map(depths, depths_decoder,
                   prefix: str = "") -> Iterator[MapEntry]:
    p = prefix
    for which in ("1", "2"):
        yield from _conv(f"{p}patch_embed{which}.proj",
                         (f"patch_embed{which}", "proj"))
        yield from _layernorm(f"{p}patch_embed{which}.norm",
                              (f"patch_embed{which}", "norm"))
    nl = len(depths)
    for i in range(nl):
        for j in range(depths[i]):
            yield from _vss_block(f"{p}layers.{i}.blocks.{j}",
                                  (f"layers_{i}", f"block{j}"))
        if i < nl - 1:
            yield from _layernorm(f"{p}layers.{i}.downsample.norm",
                                  (f"layers_{i}", "downsample", "norm"))
            yield from _linear(f"{p}layers.{i}.downsample.reduction",
                               (f"layers_{i}", "downsample", "reduction"),
                               bias=False)
    for i in range(nl):
        if i != 0:
            yield from _linear(f"{p}layers_up.{i}.upsample.expand",
                               (f"layers_up_{i}", "upsample", "expand"),
                               bias=False)
            yield from _layernorm(f"{p}layers_up.{i}.upsample.norm",
                                  (f"layers_up_{i}", "upsample", "norm"))
        for j in range(depths_decoder[i]):
            yield from _vss_block(f"{p}layers_up.{i}.blocks.{j}",
                                  (f"layers_up_{i}", f"block{j}"))
    for i in range(nl):
        yield from _cross_block(f"{p}Cross_block.{i}", (f"cross_blocks_{i}",))
    yield from _linear(f"{p}final_up.expand", ("final_up", "expand"),
                       bias=False)
    yield from _layernorm(f"{p}final_up.norm", ("final_up", "norm"))
    yield from _conv(f"{p}final_conv", ("final_conv",))


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _get(tree: Dict[str, Any], path: Tuple[str, ...]):
    node = tree
    for k in path:
        node = node[k]
    return node


def convert_fusion_state_dict(sd: Dict[str, Any], depths, depths_decoder,
                              prefix: str = "") -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for tk, fp, tr in fusion_key_map(depths, depths_decoder, prefix):
        _set(tree, fp, _FWD[tr](_t(sd[tk])))
    return tree


def export_torch_state_dict(params: Dict[str, Any], depths, depths_decoder,
                            prefix: str = "") -> Dict[str, np.ndarray]:
    """flax params -> reference-layout state_dict (numpy values), including
    the re-synthesized constant buffers (`base_mask`)."""
    sd: Dict[str, np.ndarray] = {}
    for tk, fp, tr in fusion_key_map(depths, depths_decoder, prefix):
        sd[tk] = _BWD[tr](np.asarray(_get(params, fp)))
    # constant buffers the reference persists: LDC modules carry a
    # `base_mask` ones-buffer next to their conv (`models/cross.py:795-799`);
    # eca's `.conv.weight` is a plain conv1d with no such buffer
    for tk in list(sd):
        if tk.endswith(".conv.weight") and (
                "texture_enhance" in tk or "conv_branch" in tk):
            sd[tk[: -len(".conv.weight")] + ".base_mask"] = np.ones_like(
                sd[tk])
    return sd


def convert_seg_state_dict(sd: Dict[str, Any], depths,
                           depths_decoder) -> Dict[str, Any]:
    """Convert a VSSM_Fusion_Segmentation checkpoint (params + batch_stats).
    Head layout: `vmamba_Fusion_efficross.py:940-960` (attention is a
    Sequential, hence `.attention.0`)."""
    fusion = convert_fusion_state_dict(sd, depths, depths_decoder,
                                       prefix="fusion_model.")
    head: Dict[str, Any] = {}
    hp = "segmentation_head"
    for conv in ("conv1", "conv2", "final_conv"):
        for tk, fp, tr in _conv(f"{hp}.{conv}", (conv,)):
            _set(head, fp, _FWD[tr](_t(sd[tk])))
    for tk, fp, tr in _conv(f"{hp}.attention.0", ("attention",)):
        _set(head, fp, _FWD[tr](_t(sd[tk])))
    stats: Dict[str, Any] = {}
    for bn in ("bn1", "bn2"):
        _set(head, (bn, "scale"), _t(sd[f"{hp}.{bn}.weight"]))
        _set(head, (bn, "bias"), _t(sd[f"{hp}.{bn}.bias"]))
        _set(stats, ("segmentation_head", bn, "mean"),
             _t(sd[f"{hp}.{bn}.running_mean"]))
        _set(stats, ("segmentation_head", bn, "var"),
             _t(sd[f"{hp}.{bn}.running_var"]))
    return {
        "params": {"fusion_model": fusion, "segmentation_head": head},
        "batch_stats": stats,
    }


def load_torch_checkpoint(path: str, depths=(2, 2, 9, 2),
                          depths_decoder=(2, 9, 2, 2),
                          segmentation: bool = False) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if segmentation:
        return convert_seg_state_dict(sd, depths, depths_decoder)
    return {"params": convert_fusion_state_dict(sd, depths, depths_decoder)}
