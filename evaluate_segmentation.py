"""Segmentation evaluation CLI.

Covers the reference eval suite (`evaluate_mfnet_segmentation.py`,
`evaluate_pst900_segmentation{,_proper}.py`, `evaluate_acod_segmentation.py`):
  * mfnet / pst900: overall confusion-matrix metrics (RunningScore) plus the
    per-sample present-classes-only mAcc/mIoU variant;
  * acod: SOD metrics (S-measure, F-measure, E-measure, MAE).
Results are printed and written to `<dataset>_segmentation_results.txt`
(matching the reference's committed result-file format).
"""
from __future__ import annotations

import argparse

import numpy as np

NUM_CLASSES = {"acod": 2, "mfnet": 9, "pst900": 5}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, required=True,
                    choices=list(NUM_CLASSES))
    ap.add_argument("--ckpt", type=str, required=True,
                    help="orbax checkpoint dir or reference .pth")
    ap.add_argument("--model", choices=["full", "tiny"], default="full")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fusionmamba_tpu.config import full_config, tiny_config
    from fusionmamba_tpu.data import FusionDataset, batch_iterator
    from fusionmamba_tpu.eval import (
        RunningScore, e_measure, f_measure_sod, mae, present_classes_metrics,
        s_measure)
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
    def predict_logits(v, a, b):
        outs = model.apply(v, a, b, deterministic=True,
                           return_fusion=False, return_segmentation=True)
        return outs["segmentation"]

    lines = [f"{args.dataset} segmentation evaluation", "=" * 40]

    if args.dataset == "acod":
        s_vals, f_vals, e_vals, mae_vals = [], [], [], []
        n = 0
        for batch in batch_iterator(ds, args.batch, shuffle=False,
                                    drop_last=False):
            vis_y, ir, lbl = batch
            logits = np.asarray(predict_logits(
                variables, jnp.asarray(vis_y), jnp.asarray(ir)))
            prob_fg = np.exp(logits[..., 1]) / np.exp(logits).sum(-1)
            for p, t in zip(prob_fg, lbl):
                s_vals.append(s_measure(p, t))
                f_vals.append(f_measure_sod(p, t))
                e_vals.append(e_measure(p, t))
                mae_vals.append(mae(p, t))
                n += 1
        lines += [
            f"S-measure: {np.mean(s_vals):.4f}",
            f"F-measure: {np.mean(f_vals):.4f}",
            f"E-measure: {np.mean(e_vals):.4f}",
            f"MAE: {np.mean(mae_vals):.4f}",
            f"samples: {n}",
        ]
    else:
        score = RunningScore(num_classes)
        present_accs, present_ious = [], []
        n = 0
        for batch in batch_iterator(ds, args.batch, shuffle=False,
                                    drop_last=False):
            vis_y, ir, lbl = batch
            logits = np.asarray(predict_logits(
                variables, jnp.asarray(vis_y), jnp.asarray(ir)))
            pred = logits.argmax(-1)
            score.update(lbl, pred)
            for p, t in zip(pred, lbl):
                m = present_classes_metrics(p, t, num_classes)
                if m:
                    present_accs.append(m["mAcc"])
                    present_ious.append(m["mIoU"])
                n += 1
        s = score.get_scores()
        lines += [
            f"mAcc (present classes): {np.mean(present_accs):.4f}",
            f"mAcc (all classes): {s['mean_acc']:.4f}",
            f"mIoU (present classes): {np.mean(present_ious):.4f}",
            f"mIoU (overall): {s['mean_iou']:.4f}",
            f"pixel accuracy: {s['pixel_acc']:.4f}",
            f"samples: {n}",
            "per-class IoU: " + " ".join(f"{v:.4f}" for v in s["iou"]),
        ]

    report = "\n".join(lines)
    print(report)
    out = args.out or f"{args.dataset}_segmentation_results.txt"
    with open(out, "w") as f:
        f.write(report + "\n")


if __name__ == "__main__":
    main()
