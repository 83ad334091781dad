"""Decompose the train-step time: forward-only, forward+loss, full step,
and the loss alone -- to locate the bottleneck before optimizing.
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
    """Force completion: block_until_ready can return early through the
    tunnel, so pull an actual value."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(fn, *args, iters=10):
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = full_config()
    model = VSSMFusion(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 1)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 1)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1[:1], x2[:1])

    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
    t_fwd = timed(fwd, variables, x1, x2)
    print(f"forward only (fp32):   {t_fwd*1e3:8.1f} ms "
          f"({BATCH/t_fwd:6.1f} pairs/s)")

    from fusionmamba_tpu.train.loop import cast_compute
    fwd16 = jax.jit(lambda v, a, b: model.apply(
        cast_compute(v, jnp.bfloat16), a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16)))
    t_fwd16 = timed(fwd16, variables, x1, x2)
    print(f"forward only (bf16):   {t_fwd16*1e3:8.1f} ms "
          f"({BATCH/t_fwd16:6.1f} pairs/s)")

    loss_only = jax.jit(lambda a, b, g: fusion_loss(a, b, g).total)
    gen = fwd(variables, x1, x2)
    t_loss = timed(loss_only, x1, x2, jnp.clip(gen, 0, 1))
    print(f"loss only:             {t_loss*1e3:8.1f} ms")

    grad_loss = jax.jit(jax.grad(
        lambda g, a, b: fusion_loss(a, b, jnp.clip(g, 0, 1)).total))
    t_lossg = timed(grad_loss, gen, x1, x2)
    print(f"loss fwd+bwd:          {t_lossg*1e3:8.1f} ms")

    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=make_fusion_optimizer(1e-4))
    step = make_fusion_train_step(model)
    key = jax.random.PRNGKey(1)
    state, m = step(state, x1, x2, key)
    fetch(m)
    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        state, m = step(state, x1, x2, jax.random.fold_in(key, i))
    fetch(m)
    t_step = (time.perf_counter() - t0) / iters
    print(f"full train step:       {t_step*1e3:8.1f} ms "
          f"({BATCH/t_step:6.1f} pairs/s)")
    print(f"=> backward+opt overhead vs fwd: {t_step/t_fwd:.2f}x")


if __name__ == "__main__":
    main()
