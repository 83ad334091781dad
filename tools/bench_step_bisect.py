"""Bisect the full-train-step overhead: the model grad alone runs ~112 ms
and the loss grad ~13 ms (bench_bwd_ablate / bench_model_parts), yet the
full train step runs ~250 ms. Time the chain

  a) grad of the REAL loss (clip + Fusionloss), deterministic (no dropout)
  b) a + stochastic depth active (deterministic=False + dropout rng)
  c) b + Adam update via optax (no donation)
  d) the production train step (donated state)

and print the compiler's memory analysis where available -- the suspect is
XLA remat kicking in once optimizer state joins the live set.
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
from fusionmamba_tpu.losses import fusion_loss
from fusionmamba_tpu.models import VSSMFusion
from fusionmamba_tpu.train import (
    TrainState, make_fusion_optimizer, make_fusion_train_step)

BATCH = 6
SIZE = 256


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(fn, *args, iters=10):
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def report_mem(jitted, *args, label=""):
    try:
        m = jitted.lower(*args).compile().memory_analysis()
        print(f"  [{label}] temp={m.temp_size_in_bytes/2**30:.2f}G "
              f"args={m.argument_size_in_bytes/2**30:.2f}G "
              f"out={m.output_size_in_bytes/2**30:.2f}G", flush=True)
    except Exception as e:  # tunnel may not expose analysis
        print(f"  [{label}] memory_analysis unavailable: {type(e).__name__}",
              flush=True)


def main():
    cfg = full_config()
    model = VSSMFusion(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 1)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 1)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1[:1], x2[:1])
    params = variables["params"]
    key = jax.random.PRNGKey(1)

    def real_loss(p, det, rngs):
        gen = model.apply({"params": p}, x1, x2, deterministic=det,
                          rngs=rngs)
        gen = jnp.clip(gen, 0.0, 1.0)
        return fusion_loss(x1, x2, gen).total

    ga = jax.jit(jax.grad(lambda p: real_loss(p, True, None)))
    t = timed(ga, params)
    print(f"a) grad, deterministic:        {t*1e3:7.1f} ms", flush=True)
    report_mem(ga, params, label="a")

    gb = jax.jit(jax.grad(
        lambda p, k: real_loss(p, False, {"dropout": k})))
    t = timed(gb, params, key)
    print(f"b) grad, droppath active:      {t*1e3:7.1f} ms", flush=True)
    report_mem(gb, params, key, label="b")

    tx = make_fusion_optimizer(1e-4)
    opt_state0 = tx.init(params)

    @jax.jit
    def step_c(p, os_, k):
        g = jax.grad(lambda q: real_loss(q, False, {"dropout": k}))(p)
        updates, os2 = tx.update(g, os_, p)
        import optax
        return optax.apply_updates(p, updates), os2

    def run_c(p, os_, k):
        p2, os2 = step_c(p, os_, k)
        return p2

    fetch(step_c(params, opt_state0, key))
    t0 = time.perf_counter()
    p, os_ = params, opt_state0
    for i in range(10):
        p, os_ = step_c(p, os_, jax.random.fold_in(key, i))
    fetch(p)
    t = (time.perf_counter() - t0) / 10
    print(f"c) grad + adam (no donation):  {t*1e3:7.1f} ms", flush=True)
    report_mem(step_c, params, opt_state0, key, label="c")

    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_fusion_optimizer(1e-4))
    train_step = make_fusion_train_step(model)
    state, m = train_step(state, x1, x2, key)
    fetch(m)
    t0 = time.perf_counter()
    for i in range(10):
        state, m = train_step(state, x1, x2, jax.random.fold_in(key, i))
    fetch(m)
    t = (time.perf_counter() - t0) / 10
    print(f"d) production train step:      {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
