"""Segmentation visualization CLI (reference components:
`visualize_acod_segmentation.py`, `generate_segmentation_comparison.py`).

Writes side-by-side PNG grids: [vis | ir | fused | GT | prediction] with a
per-dataset color palette. Works for acod/mfnet/pst900.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

NUM_CLASSES = {"acod": 2, "mfnet": 9, "pst900": 5}

# MFNet-style palette (class 0 = unlabeled/background)
PALETTE = np.array([
    [0, 0, 0], [64, 0, 128], [64, 64, 0], [0, 128, 192], [0, 0, 192],
    [128, 128, 0], [64, 64, 128], [192, 128, 128], [192, 64, 0],
], np.uint8)


def colorize(labels: np.ndarray, num_classes: int) -> np.ndarray:
    pal = PALETTE[:num_classes]
    return pal[np.clip(labels.astype(int), 0, num_classes - 1)]


def to_rgb(gray01: np.ndarray) -> np.ndarray:
    g = (np.clip(np.squeeze(gray01), 0, 1) * 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, required=True,
                    choices=list(NUM_CLASSES))
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--out_dir", type=str, default="visualizations")
    ap.add_argument("--num_samples", type=int, default=8)
    ap.add_argument("--model", choices=["full", "tiny"], default="full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fusionmamba_tpu.config import full_config, tiny_config
    from fusionmamba_tpu.data import FusionDataset
    from fusionmamba_tpu.models import VSSMFusionSeg

    num_classes = NUM_CLASSES[args.dataset]
    cfg_fn = full_config if args.model == "full" else tiny_config
    cfg = cfg_fn(num_seg_classes=num_classes)
    model = VSSMFusionSeg(cfg)

    x0 = jnp.zeros((1, 256, 256, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, x0)
    if args.ckpt.endswith(".pth"):
        from fusionmamba_tpu.checkpoints import load_torch_checkpoint
        variables = load_torch_checkpoint(
            args.ckpt, cfg.depths, cfg.depths_decoder, segmentation=True)
    else:
        from fusionmamba_tpu.checkpoints.orbax_io import load_checkpoint
        variables = load_checkpoint(args.ckpt, variables)

    split = "test" if args.dataset in ("mfnet", "pst900") else "train"
    ds = FusionDataset(split=split, dataset_name=args.dataset)

    @jax.jit
    def predict(v, a, b):
        outs = model.apply(v, a, b, deterministic=True,
                           return_fusion=True, return_segmentation=True)
        return (jnp.clip(outs["fusion"], 0, 1),
                jnp.argmax(outs["segmentation"], axis=-1))

    os.makedirs(args.out_dir, exist_ok=True)
    n = min(args.num_samples, len(ds))
    for i in range(n):
        item = ds[i]
        vis_y, ir = item[0], item[1]
        lbl = item[2] if len(item) > 2 else None
        fused, pred = predict(variables, jnp.asarray(vis_y[None]),
                              jnp.asarray(ir[None]))
        panels = [to_rgb(vis_y), to_rgb(ir), to_rgb(np.asarray(fused[0]))]
        if lbl is not None:
            panels.append(colorize(lbl, num_classes))
        panels.append(colorize(np.asarray(pred[0]), num_classes))
        grid = np.concatenate(panels, axis=1)
        Image.fromarray(grid).save(
            os.path.join(args.out_dir, f"{args.dataset}_sample{i}.png"))
    print(f"wrote {n} visualization grids to {args.out_dir}")


if __name__ == "__main__":
    main()
