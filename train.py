"""Fusion training CLI (mirrors reference `train.py:74-241`).

Per-dataset warm start, Adam with the reference per-epoch decay
lr = 1e-4 * 0.75^(epoch-1) (`train.py:125-131`), batch 6 at 256x256,
output clamp to [0,1], Fusionloss, 10-step loss/ETA logging, per-dataset
checkpoint save. `--dataset all` trains acod, mfnet, pst900 sequentially
(`train.py:223-235`). TPU-native: jitted train step, GSPMD batch sharding
across all local devices, orbax checkpoints.
"""
from __future__ import annotations

import argparse
import datetime
import os
import time


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, default="pst900",
                    choices=["acod", "mfnet", "pst900", "all"])
    ap.add_argument("--epochs", "-E", type=int, default=2)
    ap.add_argument("--batch_size", "-B", type=int, default=6)
    ap.add_argument("--model", choices=["full", "tiny", "test"],
                    default="full",
                    help="full/tiny are the reference variants; test is a "
                         "miniature config for CI-scale mesh tests")
    ap.add_argument("--ckpt_dir", type=str, default="model_last/my_cross")
    ap.add_argument("--num_workers", "-j", type=int, default=8,
                    help="loader threads (cv2/PIL release the GIL); 0 = "
                         "synchronous in-loop loading")
    ap.add_argument("--scan_impl", type=str, default="adaptive")
    ap.add_argument("--precision", choices=["auto", "bf16", "fp32"],
                    default="auto",
                    help="compute dtype for the train step (master params "
                         "stay fp32; all scan MATH stays fp32 in-kernel). "
                         "auto = bf16 on TPU, fp32 elsewhere. bf16 is the "
                         "measured-best operating point on v5e (77 pairs/s "
                         "at batch 24 vs 47 at batch 12 fp32, PERF.md) -- "
                         "the scan/dwconv kernels take bf16 I/O natively, "
                         "halving their HBM traffic")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="train on N deterministic synthetic pairs instead "
                         "of the on-disk dataset (drives the full CLI "
                         "end-to-end without the reference datasets)")
    ap.add_argument("--mesh", type=str, default="", metavar="NDATA,NMODEL",
                    help="device mesh: batch sharded over NDATA, the large "
                         "SS2D/MLP projections Megatron-sharded over NMODEL "
                         "(parallel/sharding.py; optimizer moments follow "
                         "their params). Default: all local devices "
                         "data-parallel. Combine with --scan_impl sp to "
                         "also shard the scan's sequence axis over 'model'")
    ap.add_argument("--image_size", type=int, default=256,
                    help="synthetic-data image size (the reference pipeline "
                         "is fixed at 256; used by tests on small meshes)")
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
                    help="when the saturation margin crosses the cumsum "
                         "rescale clip, rebuild the train step on the "
                         "magnitude-exact scan tier (impl=auto_exact, one "
                         "recompile) and continue -- training drift can "
                         "then never silently saturate decay weights "
                         "(evidence: bench_artifacts/trajectory/)")
    ap.add_argument("--no_auto_exact", dest="auto_exact",
                    action="store_false")
    return ap.parse_args(argv)


def train_fusion(args, dataset_name: str, logger):
    import jax
    import jax.numpy as jnp

    from fusionmamba_tpu.checkpoints.orbax_io import (
        checkpoint_exists, load_checkpoint, save_checkpoint)
    from fusionmamba_tpu.config import full_config, tiny_config
    from fusionmamba_tpu.data import (FusionDataset, SyntheticFusionDataset,
                                      batch_iterator)
    from fusionmamba_tpu.data.prefetch import device_prefetch, threaded_batches
    from fusionmamba_tpu.models import VSSMFusion
    from fusionmamba_tpu.parallel.sharding import (
        batch_sharding, make_mesh, opt_state_shardings, param_shardings)
    from fusionmamba_tpu.train import (
        TrainState, make_fusion_optimizer, make_fusion_train_step,
        reference_fusion_lr, resolve_compute_dtype, set_learning_rate)

    size = args.image_size
    from fusionmamba_tpu.config import test_config
    cfg_fn = {"full": full_config, "tiny": tiny_config,
              "test": test_config}[args.model]
    cfg = cfg_fn(scan_impl=args.scan_impl)
    model = VSSMFusion(cfg)

    x0 = jnp.zeros((1, size, size, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, x0)
    params = variables["params"]

    ckpt_path = os.path.join(args.ckpt_dir, f"fusion_model_{dataset_name}")
    if checkpoint_exists(ckpt_path):
        logger.info(f"warm start from {ckpt_path}")
        params = load_checkpoint(ckpt_path, params)

    if args.mesh:
        n_data, n_model = (int(v) for v in args.mesh.split(","))
    else:
        n_data, n_model = jax.local_device_count(), 1
    n_devices = n_data * n_model
    mesh = make_mesh(n_data, n_model)
    tensor_parallel = n_model > 1

    state = TrainState.create(
        apply_fn=model.apply, params=params,
        # flatten=False under tensor parallelism: moments keep the param
        # tree so they can carry their params' Megatron shardings
        tx=make_fusion_optimizer(1e-4, flatten=not tensor_parallel))
    if tensor_parallel:
        state = state.replace(
            params=jax.device_put(state.params,
                                  param_shardings(mesh, state.params)),
            opt_state=jax.device_put(
                state.opt_state,
                opt_state_shardings(mesh, state.opt_state, state.params)))
    train_step = make_fusion_train_step(
        model, compute_dtype=resolve_compute_dtype(args.precision),
        scan_guard=args.scan_guard)

    ds = (SyntheticFusionDataset(length=args.synthetic, size=(size, size))
          if args.synthetic
          else FusionDataset(split="train", dataset_name=dataset_name))
    bs = batch_sharding(mesh)

    steps_per_epoch = len(ds) // args.batch_size
    total_steps = steps_per_epoch * args.epochs
    logger.info(f"{dataset_name}: {len(ds)} pairs, "
                f"{steps_per_epoch} steps/epoch, {n_devices} devices")

    key = jax.random.PRNGKey(0)
    st = glob_st = time.time()
    step = 0
    for epoch in range(1, args.epochs + 1):
        state = set_learning_rate(state, reference_fusion_lr(epoch))
        if args.num_workers > 0:
            # async pipeline: thread-pool item loading + depth-2 device
            # prefetch so H2D transfer overlaps the running step (the
            # reference uses a 16-worker DataLoader, `train.py:111-118`)
            it = device_prefetch(
                threaded_batches(ds, args.batch_size, shuffle=True,
                                 seed=epoch, num_workers=args.num_workers),
                sharding=bs)
        else:
            it = (tuple(jax.device_put(jnp.asarray(b), bs) for b in batch)
                  for batch in batch_iterator(ds, args.batch_size,
                                              shuffle=True, seed=epoch))
        for batch in it:
            vis_y, ir = batch[0], batch[1]
            with mesh:
                state, metrics = train_step(state, vis_y, ir,
                                            jax.random.fold_in(key, step))
            step += 1
            if step % 10 == 0:
                jax.block_until_ready(metrics)
                ed = time.time()
                t_int = ed - st
                eta = int((total_steps - step) * (ed - glob_st) / step)
                eta = str(datetime.timedelta(seconds=eta))
                logger.info(
                    "epoch:{epoch} step:{step}/{total} "
                    "loss_total:{lt:.4f} loss_in:{li:.4f} "
                    "loss_ssim:{ls:.4f} loss_grad:{lg:.4f} "
                    "time:{t:.4f} eta:{eta}".format(
                        epoch=epoch, step=step, total=total_steps,
                        lt=float(metrics["loss_total"]),
                        li=float(metrics["loss_in"]),
                        ls=float(metrics["loss_ssim"]),
                        lg=float(metrics["loss_grad"]),
                        t=t_int, eta=eta))
                st = ed
                if "scan_sat_margin" in metrics:
                    margin = float(metrics["scan_sat_margin"])
                    from fusionmamba_tpu.ops.scan_guard import (
                        SATURATION_CLIP, saturation_action)
                    act = saturation_action(margin, cfg.scan_impl,
                                            args.auto_exact)
                    if act == "switch":
                        # one-time fallback to the magnitude-exact scan
                        # tier: same math, ~9% slower step, never saturates
                        # (VERDICT r3 #4 auto-switch; the 200-step
                        # trajectory evidence shows the margin drifting
                        # 59 -> 5800 under training)
                        logger.warning(
                            f"scan saturation margin {margin:.1f} >= clip "
                            f"({SATURATION_CLIP}); switching to the exact "
                            "scan tier (impl=auto_exact, one recompile)")
                        import dataclasses as _dc
                        cfg = _dc.replace(cfg, scan_impl="auto_exact")
                        model = VSSMFusion(cfg)
                        train_step = make_fusion_train_step(
                            model,
                            compute_dtype=resolve_compute_dtype(
                                args.precision),
                            scan_guard=args.scan_guard)
                    elif act == "warn_exceed":
                        logger.warning(
                            f"scan saturation margin {margin:.1f} EXCEEDS "
                            f"the cumsum rescale clip ({SATURATION_CLIP}): "
                            "the default scan is saturating decay weights; "
                            "set FM_SCAN_ALGO=doubling (exact for any "
                            "magnitude) and restart")
                    elif act == "warn_near":
                        logger.warning(
                            f"scan saturation margin {margin:.1f} is within "
                            f"10% of the clip ({SATURATION_CLIP}); the "
                            "auto-exact fallback arms at the clip")
    save_checkpoint(ckpt_path, jax.device_get(state.params))
    logger.info(f"saved {ckpt_path}")


def main():
    args = parse_args()
    from fusionmamba_tpu.utils import setup_logger
    logger = setup_logger()
    datasets = (["acod", "mfnet", "pst900"] if args.dataset == "all"
                else [args.dataset])
    for ds in datasets:
        logger.info(f"=== training fusion on {ds} ===")
        train_fusion(args, ds, logger)


if __name__ == "__main__":
    main()
