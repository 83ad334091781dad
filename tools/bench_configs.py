"""Sweep (batch, remat, dtype) configs for the fusion train step.

Each config: init, compile step, then time `iters` async-chained dispatched
steps (single final scalar fetch). Run in background; one process so the
compile cache and TPU stay warm.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

from fusionmamba_tpu.config import full_config
from fusionmamba_tpu.models import VSSMFusion
from fusionmamba_tpu.train import (
    TrainState, make_fusion_optimizer, make_fusion_train_step)

SIZE = 256
ITERS = 10

CONFIGS = [
    # (batch, remat, dtype)
    (12, False, "bf16"),
    (24, False, "bf16"),
    (16, False, "bf16"),
]


def run_cfg(batch, remat, dtype):
    cfg = full_config(remat=remat)
    model = VSSMFusion(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (batch, SIZE, SIZE, 1)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (batch, SIZE, SIZE, 1)), jnp.float32)
    t0 = time.time()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1[:1], x2[:1])
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=make_fusion_optimizer(1e-4))
    compute = jnp.float32 if dtype == "fp32" else jnp.bfloat16
    step = make_fusion_train_step(model, compute_dtype=compute)
    key = jax.random.PRNGKey(1)
    state, m = step(state, x1, x2, key)
    l0 = float(jnp.asarray(m["loss_total"]))
    state, m = step(state, x1, x2, key)
    float(jnp.asarray(m["loss_total"]))
    print(f"  compile+warm {time.time()-t0:.0f}s loss={l0:.2f}", flush=True)

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, m = step(state, x1, x2, jax.random.fold_in(key, i))
    lf = float(jnp.asarray(m["loss_total"]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"batch={batch} remat={remat} {dtype}: {dt*1e3:7.1f} ms/step "
          f"({batch/dt:7.1f} pairs/s) loss={lf:.2f}", flush=True)
    del state


def main():
    for batch, remat, dtype in CONFIGS:
        print(f"--- batch={batch} remat={remat} dtype={dtype}", flush=True)
        try:
            run_cfg(batch, remat, dtype)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
