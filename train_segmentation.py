"""Segmentation / combined training CLI (mirrors reference
`train_segmentation.py:102-547`).

Semantics preserved: per-dataset class counts (acod 2 / mfnet 9 / pst900 5,
`:299-306`); PST900 special-casing -- batch 2, AdamW 5e-5 + poly LR,
data-driven ImprovedPST900Loss, grad-clip 1.0 (`:342-369,462-463`); modes
{fusion, segmentation, both} with fusion/seg loss weights; periodic test
eval with best-mIoU checkpointing (`:531-540`).
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

NUM_CLASSES = {"acod": 2, "mfnet": 9, "pst900": 5}


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, default="mfnet",
                    choices=list(NUM_CLASSES))
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--fusion_weight", type=float, default=1.0)
    ap.add_argument("--seg_weight", type=float, default=1.0)
    ap.add_argument("--mode", type=str, default="segmentation",
                    choices=["fusion", "segmentation", "both"])
    ap.add_argument("--eval_interval", type=int, default=1)
    ap.add_argument("--ckpt_dir", type=str, default="model_last/segmentation")
    ap.add_argument("--model", choices=["full", "tiny"], default="full")
    ap.add_argument("--scan_impl", type=str, default="adaptive")
    ap.add_argument("--precision", choices=["auto", "bf16", "fp32"],
                    default="auto",
                    help="compute dtype for the train step (master params "
                         "stay fp32; all scan MATH stays fp32 in-kernel). "
                         "auto = bf16 on TPU, fp32 elsewhere -- bf16 is the "
                         "measured-best v5e operating point (PERF.md)")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="train/eval on N deterministic synthetic labeled "
                         "pairs instead of the on-disk dataset")
    ap.add_argument("--num_workers", "-j", type=int, default=8,
                    help="loader threads (cv2/PIL release the GIL); 0 = "
                         "synchronous in-loop loading")
    ap.add_argument("--scan_guard", dest="scan_guard", action="store_true",
                    default=True,
                    help="monitor the scan's cumsum-rescale saturation "
                         "margin every logged step (the library-default "
                         "scan algorithm is exact only below margin 60; "
                         "see ops/scan_guard.py). Costs ~1-2%% of a step")
    ap.add_argument("--no_scan_guard", dest="scan_guard",
                    action="store_false")
    ap.add_argument("--auto_exact", dest="auto_exact", action="store_true",
                    default=True,
                    help="rebuild the step on the magnitude-exact scan "
                         "tier (one recompile) if the saturation margin "
                         "crosses the cumsum rescale clip (see train.py)")
    ap.add_argument("--no_auto_exact", dest="auto_exact",
                    action="store_false")
    return ap.parse_args()


def compute_dataset_class_counts(ds, num_classes: int) -> np.ndarray:
    """Full-dataset label histogram (`train_segmentation.py:43-55`)."""
    counts = np.zeros(num_classes, np.float64)
    for i in range(len(ds)):
        item = ds[i]
        if len(item) == 3:
            lbl = item[2]
            counts += np.bincount(
                np.clip(lbl.flatten(), 0, num_classes - 1),
                minlength=num_classes)
    return counts


def evaluate(model, variables, ds, num_classes, batch_size, logger):
    import jax
    import jax.numpy as jnp

    from fusionmamba_tpu.data import batch_iterator
    from fusionmamba_tpu.eval import RunningScore

    @jax.jit
    def predict(v, a, b):
        outs = model.apply(v, a, b, deterministic=True,
                           return_fusion=False, return_segmentation=True)
        return jnp.argmax(outs["segmentation"], axis=-1)

    score = RunningScore(num_classes)
    for batch in batch_iterator(ds, batch_size, shuffle=False,
                                drop_last=False):
        vis_y, ir, lbl = batch
        pred = np.asarray(predict(variables, jnp.asarray(vis_y),
                                  jnp.asarray(ir)))
        score.update(lbl, pred)
    s = score.get_scores()
    logger.info(f"eval: pixel_acc={s['pixel_acc']:.4f} "
                f"mAcc={s['mean_acc']:.4f} mIoU={s['mean_iou']:.4f} "
                f"fwIoU={s['fw_iou']:.4f}")
    return s


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from fusionmamba_tpu.checkpoints.orbax_io import (save_checkpoint,
                                                      wait_for_saves)
    from fusionmamba_tpu.config import full_config, tiny_config
    from fusionmamba_tpu.data import (FusionDataset, SyntheticFusionDataset,
                                      batch_iterator)
    from fusionmamba_tpu.data.prefetch import device_prefetch, threaded_batches
    from fusionmamba_tpu.losses import compute_class_weights
    from fusionmamba_tpu.models import VSSMFusionSeg
    from fusionmamba_tpu.train import (
        SegTrainState, make_seg_optimizer, make_seg_train_step, poly_lr,
        resolve_compute_dtype, set_learning_rate)
    from fusionmamba_tpu.utils import setup_logger

    logger = setup_logger(logpth=args.ckpt_dir)
    num_classes = NUM_CLASSES[args.dataset]
    is_pst900 = args.dataset == "pst900"
    batch_size = 2 if is_pst900 else args.batch_size
    lr = 5e-5 if is_pst900 else args.lr

    cfg_fn = full_config if args.model == "full" else tiny_config
    cfg = cfg_fn(scan_impl=args.scan_impl, num_seg_classes=num_classes)
    model = VSSMFusionSeg(cfg)

    if args.synthetic:
        train_ds = SyntheticFusionDataset(length=args.synthetic,
                                          num_classes=num_classes)
        test_ds = SyntheticFusionDataset(length=max(2, args.synthetic // 4),
                                         num_classes=num_classes, seed=1)
    else:
        train_ds = FusionDataset(split="train", dataset_name=args.dataset)
        test_ds = (FusionDataset(split="test", dataset_name=args.dataset)
                   if args.dataset in ("mfnet", "pst900") else None)

    class_weights = None
    improved = False
    if is_pst900:
        counts = compute_dataset_class_counts(train_ds, num_classes)
        class_weights = jnp.asarray(
            compute_class_weights(jnp.asarray(counts)))
        improved = True
        logger.info(f"PST900 class weights: {np.asarray(class_weights)}")

    x0 = jnp.zeros((1, 256, 256, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, x0)
    state = SegTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_seg_optimizer(lr=lr, clip=1.0))
    train_step = make_seg_train_step(
        model, num_classes, mode=args.mode,
        fusion_weight=args.fusion_weight, seg_weight=args.seg_weight,
        class_weights=class_weights, improved=improved,
        compute_dtype=resolve_compute_dtype(args.precision),
        scan_guard=args.scan_guard)

    steps_per_epoch = len(train_ds) // batch_size
    max_iter = steps_per_epoch * args.epochs
    key = jax.random.PRNGKey(0)
    best_miou = -1.0
    step = 0
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        if args.num_workers > 0:
            # thread-pool loading + depth-2 device prefetch (overlaps H2D
            # with the running step; reference: 16-worker DataLoader)
            it = device_prefetch(
                threaded_batches(train_ds, batch_size, shuffle=True,
                                 seed=epoch, num_workers=args.num_workers))
        else:
            it = batch_iterator(train_ds, batch_size, seed=epoch)
        for batch in it:
            vis_y, ir, lbl = batch
            if is_pst900:
                state = set_learning_rate(state, poly_lr(lr, step, max_iter))
            state, metrics = train_step(
                state, jnp.asarray(vis_y), jnp.asarray(ir),
                jnp.asarray(lbl), jax.random.fold_in(key, step))
            step += 1
            if step % 10 == 0:
                logger.info(
                    f"epoch:{epoch} step:{step}/{max_iter} "
                    + " ".join(f"{k}:{float(v):.4f}"
                               for k, v in metrics.items()))
                margin = float(metrics.get("scan_sat_margin", 0.0))
                from fusionmamba_tpu.ops.scan_guard import (
                    SATURATION_CLIP, saturation_action)
                act = saturation_action(margin, cfg.scan_impl,
                                        args.auto_exact)
                if act == "switch":
                    logger.warning(
                        f"scan saturation margin {margin:.1f} >= clip "
                        f"({SATURATION_CLIP}); switching to the exact "
                        "scan tier (impl=auto_exact, one recompile)")
                    import dataclasses as _dc
                    cfg = _dc.replace(cfg, scan_impl="auto_exact")
                    model = VSSMFusionSeg(cfg)
                    train_step = make_seg_train_step(
                        model, num_classes, mode=args.mode,
                        fusion_weight=args.fusion_weight,
                        seg_weight=args.seg_weight,
                        class_weights=class_weights, improved=improved,
                        compute_dtype=resolve_compute_dtype(
                            args.precision),
                        scan_guard=args.scan_guard)
                elif act in ("warn_exceed", "warn_near"):
                    sev = ("EXCEEDS" if act == "warn_exceed"
                           else "is within 10% of")
                    logger.warning(
                        f"scan saturation margin {margin:.1f} {sev} "
                        f"the cumsum rescale clip ({SATURATION_CLIP}); "
                        "set FM_SCAN_ALGO=doubling (exact for any "
                        "magnitude)")
        logger.info(f"epoch {epoch} done in {time.time() - t0:.1f}s")

        ckpt = os.path.join(os.path.abspath(args.ckpt_dir),
                            f"segmentation_model_{args.dataset}")
        tree = {"params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats)}
        # async: serialization overlaps the next epoch (orbax joins any
        # in-flight save before starting another); wait_for_saves() at exit
        save_checkpoint(ckpt, tree, blocking=False)
        if test_ds is not None and epoch % args.eval_interval == 0:
            scores = evaluate(model, tree, test_ds, num_classes,
                              batch_size, logger)
            if scores["mean_iou"] > best_miou:
                best_miou = scores["mean_iou"]
                save_checkpoint(ckpt + "_best", tree, blocking=False)
                logger.info(f"new best mIoU {best_miou:.4f}")
    wait_for_saves()


if __name__ == "__main__":
    main()
