"""Fusion inference CLI (mirrors reference `test.py:53-111`).

Walks paired IR/VIS folders, grayscale-reads, bicubic-resizes to 256x256,
runs the fused model, clamps to [0,1], min-max renormalizes, writes uint8
images, and prints wall-clock time. Differences from the reference: model /
checkpoint / folders are flags instead of hardcoded paths, inference is
batched and jit-compiled, and checkpoints may be orbax dirs or converted
reference .pth files.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def get_image_files(folder):
    exts = (".bmp", ".tif", ".jpg", ".jpeg", ".png")
    return sorted(f for f in os.listdir(folder) if f.lower().endswith(exts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ir_dir", required=True)
    ap.add_argument("--vis_dir", required=True)
    ap.add_argument("--out_dir", default="./outputs")
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint dir or reference .pth file")
    ap.add_argument("--model", choices=["full", "tiny"], default="full")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fusionmamba_tpu.config import full_config, tiny_config
    from fusionmamba_tpu.models import VSSMFusion

    cfg = full_config() if args.model == "full" else tiny_config()
    model = VSSMFusion(cfg)

    os.makedirs(args.out_dir, exist_ok=True)
    x0 = jnp.zeros((1, args.size, args.size, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, x0)
    if args.ckpt:
        if args.ckpt.endswith(".pth"):
            from fusionmamba_tpu.checkpoints import load_torch_checkpoint
            variables = load_torch_checkpoint(
                args.ckpt, cfg.depths, cfg.depths_decoder)
        else:
            from fusionmamba_tpu.checkpoints.orbax_io import load_checkpoint
            variables = load_checkpoint(args.ckpt, variables)

    @jax.jit
    def fuse(v, a, b):
        out = model.apply(v, a, b)
        return jnp.clip(out, 0.0, 1.0)

    def read_gray(path):
        img = Image.open(path).convert("L")
        img = img.resize((args.size, args.size), resample=3)  # bicubic
        return np.asarray(img, np.float32)[..., None] / 255.0

    ir_files = get_image_files(args.ir_dir)
    vis_files = get_image_files(args.vis_dir)

    tic = time.time()
    for start in range(0, len(ir_files), args.batch):
        chunk = list(zip(ir_files, vis_files))[start:start + args.batch]
        a = np.stack([read_gray(os.path.join(args.ir_dir, f)) for f, _ in chunk])
        b = np.stack([read_gray(os.path.join(args.vis_dir, f)) for _, f in chunk])
        # pad the tail batch to the compiled batch size
        pad = args.batch - len(chunk)
        if pad:
            a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
            b = np.concatenate([b, np.zeros((pad,) + b.shape[1:], b.dtype)])
        out = np.asarray(fuse(variables, jnp.asarray(a), jnp.asarray(b)))
        for (ir_name, _), img in zip(chunk, out):
            # min-max renormalize per reference test.py:93
            img = (img - img.min()) / (img.max() - img.min() + 1e-12)
            arr = (np.squeeze(img) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(args.out_dir, ir_name))
    print("Processing time: {}".format(time.time() - tic))


if __name__ == "__main__":
    main()
