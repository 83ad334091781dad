"""Throughput vs batch size for the full fusion train step.

The reference is locked to batch 6 by GPU memory (`train.py:111-118`); on
TPU the pairs/sec metric is free to use the throughput-optimal batch, so
sweep and report. HBM ceiling: the assoc path OOMs at batch 6 already; the
Pallas path's activations scale ~1.1 GB/sample (bench_step_bisect: 5.4 G
temp at batch 6).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from fusionmamba_tpu.config import full_config
from fusionmamba_tpu.models import VSSMFusion
from fusionmamba_tpu.train import (
    TrainState, make_fusion_optimizer, make_fusion_train_step)

SIZE = 256


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--batches", type=int, nargs="+", default=[6, 12, 24, 48])
    args = ap.parse_args()

    cfg = full_config(remat=args.remat)
    model = VSSMFusion(cfg)
    rng = np.random.default_rng(0)
    x1_init = jnp.asarray(rng.uniform(0, 1, (1, SIZE, SIZE, 1)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1_init, x1_init)
    key = jax.random.PRNGKey(1)

    for batch in args.batches:
        x1 = jnp.asarray(rng.uniform(0, 1, (batch, SIZE, SIZE, 1)),
                         jnp.float32)
        x2 = jnp.asarray(rng.uniform(0, 1, (batch, SIZE, SIZE, 1)),
                         jnp.float32)
        state = TrainState.create(
            apply_fn=model.apply, params=jax.tree.map(jnp.copy,
                                                      variables["params"]),
            tx=make_fusion_optimizer(1e-4))
        step = make_fusion_train_step(model)
        try:
            state, m = step(state, x1, x2, key)
            fetch(m)
            iters = 10
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = step(state, x1, x2, jax.random.fold_in(key, i))
            fetch(m)
            dt = (time.perf_counter() - t0) / iters
            print(f"batch {batch:3d}: {dt*1e3:8.1f} ms/step "
                  f"({batch/dt:7.1f} pairs/s)", flush=True)
        except Exception as e:
            print(f"batch {batch:3d}: failed ({type(e).__name__})", flush=True)
            break
        del state


if __name__ == "__main__":
    main()
