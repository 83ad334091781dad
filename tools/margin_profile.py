"""Per-scan saturation-margin TRIP DISTRIBUTION over a real training run.

The r4 trajectory evidence tracked only the MAX margin (59 -> 5800 over 200
steps); the steady-state throughput question is *how many* of the ~40 scan
calls actually cross the +-60 clip, because scan_impl="adaptive" pays the
doubling repair per CALL. This runs N on-device training steps (full model,
b24 bf16, synthetic data, the train CLI's optimizer + lr semantics) with
the guard collecting the PER-SCAN margin vector, and prints the
distribution at checkpoints -- the evidence that positions the realistic
steady state between bench.py's `value` (no calls tripped) and
`steady_state_pairs_s` (all calls tripped).

Usage: python tools/margin_profile.py [--steps 200] [--batch 24]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--report_every", type=int, default=25)
    args = ap.parse_args()

    from fusionmamba_tpu.config import full_config
    from fusionmamba_tpu.models import VSSMFusion
    from fusionmamba_tpu.ops.scan_guard import SATURATION_CLIP
    from fusionmamba_tpu.train.loop import (TrainState,
                                            make_fusion_optimizer,
                                            make_fusion_train_step,
                                            reference_fusion_lr,
                                            set_learning_rate)

    cfg = full_config()          # shipped defaults: scan_impl="adaptive"
    model = VSSMFusion(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (args.batch, 256, 256, 1)),
                     jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (args.batch, 256, 256, 1)),
                     jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1[:1], x2[:1])
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=make_fusion_optimizer(1e-4))
    state = set_learning_rate(state, reference_fusion_lr(1))
    step = make_fusion_train_step(model, compute_dtype=jnp.bfloat16,
                                  scan_guard="vector")

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.steps):
        state, m = step(state, x1, x2, jax.random.fold_in(key, i))
        if (i + 1) % args.report_every == 0 or i == 0:
            vec = np.asarray(m["scan_sat_margins_vec"], np.float32)
            tripped = int((vec >= SATURATION_CLIP).sum())
            near = int((vec >= 0.9 * SATURATION_CLIP).sum()) - tripped
            print(f"step {i+1:4d}  loss={float(m['loss_total']):8.4f}  "
                  f"margins: n={vec.size} max={vec.max():9.2f} "
                  f"p90={np.percentile(vec, 90):8.2f} "
                  f"median={np.median(vec):7.2f}  tripped={tripped} "
                  f"near={near}  ({time.time()-t0:5.0f}s)", flush=True)
    vec = np.asarray(m["scan_sat_margins_vec"], np.float32)
    order = np.argsort(-vec)
    print("final per-scan margins (desc, scan index in trace order):")
    for idx in order:
        flag = ("TRIPPED" if vec[idx] >= SATURATION_CLIP else
                ("near" if vec[idx] >= 0.9 * SATURATION_CLIP else ""))
        print(f"  scan[{idx:2d}] = {vec[idx]:9.2f} {flag}")


if __name__ == "__main__":
    main()
