"""HuggingFace Mamba checkpoint import for the LM stack.

TPU-native analog of `mamba_ssm/utils/hf.py` (`load_config_hf` /
`load_state_dict_hf`): the released `state-spaces/mamba-*` checkpoints ship
a `config.json` + `pytorch_model.bin` whose keys follow
`mamba_ssm/models/mixer_seq_simple.py` naming (`backbone.embedding`,
`backbone.layers.{i}.{norm,mixer.*}`, `backbone.norm_f`, tied `lm_head`).
This module maps that state dict onto `models.mamba_lm.MambaLMHeadModel`
variables. Zero-egress environments pass a LOCAL directory or file path;
when the `transformers` hub cache is available, model names resolve
through `cached_file` exactly like the reference.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np

from ..models.mamba_lm import MambaLMHeadModel


def _np(x) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (fp32)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, np.float32)


#: ssm_cfg keys the flax MambaBlock honors (`models/mamba_lm.py`); any other
#: key in a checkpoint's config would silently build a mismatched model whose
#: converted params only fail later with an opaque apply-time shape error.
_SSM_CFG_KEYS = ("d_state", "d_conv", "expand", "dt_rank")


def model_from_config(cfg: Dict[str, Any]) -> MambaLMHeadModel:
    """Build the flax LM from a `config.json` dict
    (`mamba_ssm/models/config_mamba.py` fields; vocab padded to the
    `pad_vocab_size_multiple`, `mixer_seq_simple.py:181-184`).
    Honors ssm_cfg's d_state/d_conv/expand/dt_rank and raises on any
    other ssm_cfg key (e.g. `layer` selecting a non-Mamba1 mixer)."""
    vocab = int(cfg["vocab_size"])
    mult = int(cfg.get("pad_vocab_size_multiple", 8))
    if vocab % mult:
        vocab += mult - vocab % mult
    ssm_cfg = cfg.get("ssm_cfg") or {}
    unknown = sorted(set(ssm_cfg) - set(_SSM_CFG_KEYS))
    if unknown:
        raise ValueError(
            f"unsupported ssm_cfg keys {unknown}: this importer builds the "
            f"Mamba-1 MambaBlock, which honors only {_SSM_CFG_KEYS}")
    dt_rank = ssm_cfg.get("dt_rank", "auto")
    return MambaLMHeadModel(
        vocab_size=vocab,
        d_model=int(cfg["d_model"]),
        n_layer=int(cfg["n_layer"]),
        d_state=int(ssm_cfg.get("d_state", 16)),
        d_conv=int(ssm_cfg.get("d_conv", 4)),
        expand=int(ssm_cfg.get("expand", 2)),
        dt_rank=None if dt_rank in ("auto", None) else int(dt_rank),
        rms_norm=bool(cfg.get("rms_norm", True)),
    )


def convert_mamba_state_dict(sd: Dict[str, Any], n_layer: int) -> Dict:
    """mamba_ssm state dict -> flax `{"params": ...}` tree.

    Key map (torch (out, in) Linear weights transpose to flax (in, out)
    kernels; conv1d (C, 1, W) -> (W, 1, C)):
      backbone.embedding.weight            -> embedding/embedding
      backbone.layers.{i}.norm.weight      -> blocks_{i}/norm/scale
      backbone.layers.{i}.mixer.in_proj.weight  -> .../mixer/in_proj/kernel.T
      ... conv1d.{weight,bias}             -> conv1d_kernel / conv1d_bias
      ... x_proj.weight                    -> x_proj/kernel.T
      ... dt_proj.{weight,bias}            -> dt_proj_weight / dt_proj_bias
      ... A_log, D                         -> A_log, D
      ... out_proj.weight                  -> out_proj/kernel.T
      backbone.norm_f.weight               -> norm_f/scale
    `lm_head.weight` is tied to the embedding and ignored
    (`mixer_seq_simple.py:235-238`).
    """
    params: Dict[str, Any] = {
        "embedding": {"embedding": _np(sd["backbone.embedding.weight"])},
    }
    for i in range(n_layer):
        p = f"backbone.layers.{i}."
        norm: Dict[str, Any] = {"scale": _np(sd[p + "norm.weight"])}
        if p + "norm.bias" in sd:  # LayerNorm flavor
            norm["bias"] = _np(sd[p + "norm.bias"])
        mixer = {
            "in_proj": {"kernel": _np(sd[p + "mixer.in_proj.weight"]).T},
            "conv1d_kernel": _np(sd[p + "mixer.conv1d.weight"]).transpose(
                2, 1, 0),
            "conv1d_bias": _np(sd[p + "mixer.conv1d.bias"]),
            "x_proj": {"kernel": _np(sd[p + "mixer.x_proj.weight"]).T},
            "dt_proj_weight": _np(sd[p + "mixer.dt_proj.weight"]),
            "dt_proj_bias": _np(sd[p + "mixer.dt_proj.bias"]),
            "A_log": _np(sd[p + "mixer.A_log"]),
            "D": _np(sd[p + "mixer.D"]),
            "out_proj": {"kernel": _np(sd[p + "mixer.out_proj.weight"]).T},
        }
        params[f"blocks_{i}"] = {"norm": norm, "mixer": mixer}
    norm_f: Dict[str, Any] = {"scale": _np(sd["backbone.norm_f.weight"])}
    if "backbone.norm_f.bias" in sd:
        norm_f["bias"] = _np(sd["backbone.norm_f.bias"])
    params["norm_f"] = norm_f
    return {"params": params}


def export_mamba_state_dict(variables: Dict, n_layer: int) -> Dict[str, np.ndarray]:
    """Inverse of `convert_mamba_state_dict` (round-trip validation and
    checkpoint interchange back to the reference stack)."""
    params = variables["params"]
    sd: Dict[str, np.ndarray] = {
        "backbone.embedding.weight": _np(params["embedding"]["embedding"]),
    }
    for i in range(n_layer):
        blk = params[f"blocks_{i}"]
        p = f"backbone.layers.{i}."
        sd[p + "norm.weight"] = _np(blk["norm"]["scale"])
        if "bias" in blk["norm"]:
            sd[p + "norm.bias"] = _np(blk["norm"]["bias"])
        m = blk["mixer"]
        sd[p + "mixer.in_proj.weight"] = _np(m["in_proj"]["kernel"]).T
        sd[p + "mixer.conv1d.weight"] = _np(m["conv1d_kernel"]).transpose(
            2, 1, 0)
        sd[p + "mixer.conv1d.bias"] = _np(m["conv1d_bias"])
        sd[p + "mixer.x_proj.weight"] = _np(m["x_proj"]["kernel"]).T
        sd[p + "mixer.dt_proj.weight"] = _np(m["dt_proj_weight"])
        sd[p + "mixer.dt_proj.bias"] = _np(m["dt_proj_bias"])
        sd[p + "mixer.A_log"] = _np(m["A_log"])
        sd[p + "mixer.D"] = _np(m["D"])
        sd[p + "mixer.out_proj.weight"] = _np(m["out_proj"]["kernel"]).T
    sd["backbone.norm_f.weight"] = _np(params["norm_f"]["scale"])
    if "bias" in params["norm_f"]:
        sd["backbone.norm_f.bias"] = _np(params["norm_f"]["bias"])
    sd["lm_head.weight"] = sd["backbone.embedding.weight"]  # tied
    return sd


def _resolve(name_or_path: str) -> Tuple[str, str]:
    """Return (config_path, weights_path) for a local dir/file or, when the
    transformers hub cache has it, a model name (`utils/hf.py:9-18`)."""
    if os.path.isdir(name_or_path):
        cfg = os.path.join(name_or_path, "config.json")
        for w in ("pytorch_model.bin", "model.bin", "weights.bin"):
            wp = os.path.join(name_or_path, w)
            if os.path.exists(wp):
                return cfg, wp
        raise FileNotFoundError(
            f"no pytorch_model.bin under {name_or_path!r}")
    if os.path.isfile(name_or_path):  # bare .bin next to config.json
        return (os.path.join(os.path.dirname(name_or_path), "config.json"),
                name_or_path)
    from transformers.utils import CONFIG_NAME, WEIGHTS_NAME
    from transformers.utils.hub import cached_file
    return (cached_file(name_or_path, CONFIG_NAME),
            cached_file(name_or_path, WEIGHTS_NAME))


def load_mamba_hf(name_or_path: str):
    """Load a released Mamba LM checkpoint.

    Returns (model, variables). Accepts a local directory containing
    `config.json` + `pytorch_model.bin` (zero-egress path), a direct .bin
    path, or a hub model name if the transformers cache can resolve it.
    """
    import torch

    cfg_path, weights_path = _resolve(name_or_path)
    with open(cfg_path) as f:
        cfg = json.load(f)
    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    model = model_from_config(cfg)
    variables = convert_mamba_state_dict(sd, model.n_layer)
    return model, variables
