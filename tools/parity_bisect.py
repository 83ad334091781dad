"""Activation-level parity bisect: reference torch VSSM_Fusion (CPU) vs our
VSSMFusion with converted weights, comparing intermediate activations to
locate the first diverging module. Tiny config, 32x32 inputs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

DEPTHS = (1, 1)
DEPTHS_DEC = (1, 1)
DIMS = (16, 32)
D_STATE = 16


def main():
    import torch

    from reference_harness import build_reference_fusion

    ref = build_reference_fusion(DEPTHS, DEPTHS_DEC, DIMS, D_STATE)

    rng = np.random.default_rng(42)
    batch = int(os.environ.get("FM_BISECT_BATCH", "1"))
    x = rng.uniform(0, 1, (batch, 32, 32, 1)).astype(np.float32)
    y = rng.uniform(0, 1, (batch, 32, 32, 1)).astype(np.float32)

    # ---- torch side with hooks ----
    capture = {}

    def hook(name):
        def _h(mod, inp, out):
            if isinstance(out, tuple):
                out = out[0]
            capture.setdefault(name, []).append(out.detach().numpy())
        return _h

    hooks = {
        "patch_embed1": ref.patch_embed1,
        "enc_stage0": ref.layers[0],
        "enc_stage1": ref.layers[1],
        "cross0": ref.Cross_block[0],
        "cross1": ref.Cross_block[1],
        "dec_stage0": ref.layers_up[0],
        "dec_stage1": ref.layers_up[1],
        "final_up": ref.final_up,
        # drill-down inside encoder block 0
        "b0.norm": ref.layers[0].blocks[0].norm,
        "b0.op": ref.layers[0].blocks[0].op,
        "b0.conv_branch": ref.layers[0].blocks[0].conv_branch,
        "b0.eca": ref.layers[0].blocks[0].self_attention_cross_channel,
        "b0.se": ref.layers[0].blocks[0].se,
        "b0.mlp": ref.layers[0].blocks[0].mlp,
        "b0.op.conv2d": ref.layers[0].blocks[0].op.conv2d,
        "b0.op.in_proj": ref.layers[0].blocks[0].op.in_proj,
        # drill-down inside cross block 1 (seed of the divergence)
        "c1.ln_1": ref.Cross_block[1].ln_1,
        "c1.ln_2": ref.Cross_block[1].ln_2,
        "c1.cross_layer": ref.Cross_block[1].Cross_layer,
        "c1.ssm": ref.Cross_block[1].self_attention_cross,
        "c1.eca": ref.Cross_block[1].self_attention_cross_spatial,
        "c1.in_proj1": ref.Cross_block[1].self_attention_cross.in_proj1,
        "c1.in_proj2": ref.Cross_block[1].self_attention_cross.in_proj2,
        "c1.conv2d": ref.Cross_block[1].self_attention_cross.conv2d,
        "c1.out_norm": ref.Cross_block[1].self_attention_cross.out_norm,
        "c1.te1": ref.Cross_block[1].Cross_layer.texture_enhance1,
        "c1.te2": ref.Cross_block[1].Cross_layer.texture_enhance2,
        "c1.diff": ref.Cross_block[1].Cross_layer.Diff_enhance,
        "du1.upsample": ref.layers_up[1].upsample,
        "du1.up.expand": ref.layers_up[1].upsample.expand,
        "fu.expand": ref.final_up.expand,
        "du1.block0": ref.layers_up[1].blocks[0],
    }
    for name, mod in hooks.items():
        mod.register_forward_hook(hook(name))

    with torch.no_grad():
        want_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(y.transpose(0, 3, 1, 2)))
    capture["OUT"] = [want_out.numpy()]

    # ---- jax side with capture_intermediates ----
    import jax
    import jax.numpy as jnp

    from fusionmamba_tpu.checkpoints.torch_import import (
        convert_fusion_state_dict)
    from fusionmamba_tpu.config import FusionModelConfig
    from fusionmamba_tpu.models import VSSMFusion

    params = convert_fusion_state_dict(ref.state_dict(), DEPTHS, DEPTHS_DEC)
    cfg = FusionModelConfig(depths=DEPTHS, depths_decoder=DEPTHS_DEC,
                            dims=DIMS, d_state=D_STATE, drop_path_rate=0.0,
                            scan_impl="ref")
    model = VSSMFusion(cfg)
    import contextlib
    dev_ctx = (jax.default_device(jax.devices("cpu")[0])
               if os.environ.get("FM_BISECT_CPU") else contextlib.nullcontext())
    with dev_ctx, jax.default_matmul_precision("float32"):
        got_out, state = model.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(y),
            capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]

    def get(path, call):
        node = inter
        for k in path.split("/"):
            node = node[k]
        calls = node["__call__"]
        v = calls[call] if call < len(calls) else calls[-1]
        if isinstance(v, tuple):
            v = v[0]
        return np.asarray(v)

    # flax intermediate path per torch capture key (NHWC both sides after
    # torch NCHW->NHWC transpose where needed)
    def nchw(a):
        return a.transpose(0, 3, 1, 2) if a.ndim == 4 else a

    pairs = [
        ("patch_embed1", "patch_embed1", False),   # both NHWC
        ("b0.norm", "layers_0/block0/norm", False),
        ("b0.op.in_proj", "layers_0/block0/op/in_proj", False),
        ("b0.op.conv2d", "layers_0/block0/op/conv2d", True),
        ("b0.op", "layers_0/block0/op", False),
        ("b0.conv_branch", "layers_0/block0/conv_branch", True),
        ("b0.eca", "layers_0/block0/eca", True),
        ("b0.se", "layers_0/block0/se", False),
        ("b0.mlp", "layers_0/block0/mlp", False),
        ("c1.ln_1", "cross_blocks_1/ln_1", False),
        ("c1.ln_2", "cross_blocks_1/ln_2", False),
        ("c1.cross_layer", "cross_blocks_1/cross_layer", True),
        ("c1.te1", "cross_blocks_1/cross_layer/texture_enhance1", True),
        ("c1.te2", "cross_blocks_1/cross_layer/texture_enhance2", True),
        ("c1.diff", "cross_blocks_1/cross_layer/diff_enhance", True),
        ("c1.in_proj1", "cross_blocks_1/self_attention_cross/in_proj1", False),
        ("c1.in_proj2", "cross_blocks_1/self_attention_cross/in_proj2", False),
        ("c1.conv2d", "cross_blocks_1/self_attention_cross/conv2d", True),
        ("c1.out_norm", "cross_blocks_1/self_attention_cross/out_norm", False),
        ("c1.ssm", "cross_blocks_1/self_attention_cross", False),
        ("c1.eca", "cross_blocks_1/self_attention_cross_spatial", True),
        ("du1.up.expand", "layers_up_1/upsample/expand", False),
        ("fu.expand", "final_up/expand", False),
        ("du1.upsample", "layers_up_1/upsample", False),
        ("du1.block0", "layers_up_1/block0", False),
        ("enc_stage0", "layers_0", False),
        ("enc_stage1", "layers_1", False),
        ("cross0", "cross_blocks_0", False),
        ("cross1", "cross_blocks_1", False),
        ("dec_stage0", "layers_up_0", False),
        ("dec_stage1", "layers_up_1", False),
        ("final_up", "final_up", False),
    ]
    for tname, jpath, torch_is_nchw in pairs:
        if tname not in capture:
            print(f"{tname:>20s}: (not captured)")
            continue
        for ci, want in enumerate(capture[tname]):
            try:
                got = get(jpath, ci)
                if torch_is_nchw and want.ndim == 4:
                    want = want.transpose(0, 2, 3, 1)
                if want.shape != got.shape:
                    print(f"{tname:>20s}[{ci}]: SHAPE want {want.shape} "
                          f"got {got.shape}")
                    continue
                err = np.abs(want - got)
                denom = np.abs(want).max() + 1e-12
                print(f"{tname:>20s}[{ci}]: rel {err.max()/denom:10.3e} "
                      f"abs {err.max():10.3e} scale {denom:8.3f}")
            except Exception as e:
                print(f"{tname:>20s}[{ci}]: ERROR {type(e).__name__}: {e}")

    want = capture["OUT"][0].transpose(0, 2, 3, 1)
    err = np.abs(want - np.asarray(got_out))
    print(f"{'OUT':>20s}: rel {err.max()/np.abs(want).max():10.3e}")


if __name__ == "__main__":
    main()
