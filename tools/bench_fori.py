"""Diagnose the fori_loop train-step regression.

A single dispatch of N chained steps should cost ~N x device step time, but
the fori_loop variant measured ~4x the dispatched per-step time. Compare
per-step wall time for n in {1, 2, 5, 20}, report the compiler memory
analysis for each, and test a scan-based variant that keeps the metrics out
of the carry.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from fusionmamba_tpu.config import full_config
from fusionmamba_tpu.models import VSSMFusion
from fusionmamba_tpu.train import (
    TrainState, make_fusion_optimizer, make_fusion_train_step)

BATCH = 6
SIZE = 256


def fetch(x):
    return float(jnp.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])


def main():
    cfg = full_config()
    model = VSSMFusion(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 1)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 1)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1[:1], x2[:1])
    raw_step = make_fusion_train_step(model, jit=False)
    key = jax.random.PRNGKey(1)

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0,))
    def run_n(state, x1, x2, key, n):
        def body(i, st):
            st2, _ = raw_step(st, x1, x2, jax.random.fold_in(key, i))
            return st2
        return jax.lax.fori_loop(0, n, body, state)

    for n in (1, 2, 5, 20):
        state = TrainState.create(
            apply_fn=model.apply,
            params=jax.tree.map(jnp.copy, variables["params"]),
            tx=make_fusion_optimizer(1e-4))
        try:
            lowered = run_n.lower(state, x1, x2, key, n)
            compiled = lowered.compile()
            try:
                m = compiled.memory_analysis()
                print(f"n={n}: temp={m.temp_size_in_bytes/2**30:.2f}G "
                      f"args={m.argument_size_in_bytes/2**30:.2f}G",
                      flush=True)
            except Exception as e:
                print(f"n={n}: memory_analysis unavailable "
                      f"({type(e).__name__})", flush=True)
        except Exception as e:
            print(f"n={n}: lower/compile failed {type(e).__name__}: {e}",
                  flush=True)
            continue
        state = run_n(state, x1, x2, key, n)
        fetch(state.params)
        t0 = time.perf_counter()
        state = run_n(state, x1, x2, jax.random.fold_in(key, 9), n)
        fetch(state.params)
        dt = time.perf_counter() - t0
        print(f"n={n}: {dt:.3f}s total, {dt/n*1e3:.1f} ms/step "
              f"({BATCH*n/dt:.1f} pairs/s)", flush=True)
        del state


if __name__ == "__main__":
    main()
