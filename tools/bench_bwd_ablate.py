"""Isolate the backward-pass bottleneck: time jax.grad of a model-only
scalar loss under ablations of (scan impl, dwconv impl, precision).

The full train step runs ~6x the forward (bench_model_parts.py), far above
the expected 2-2.5x -- one of the custom-VJP kernels or a layout-op adjoint
is pathological in the backward. Each combo compiles the full model once
(minutes through the tunnel; cached afterwards).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

import fusionmamba_tpu.nn.ss2d as ss2d_mod
from fusionmamba_tpu.config import full_config
from fusionmamba_tpu.models import VSSMFusion
from fusionmamba_tpu.ops.dwconv_pallas import depthwise_conv3x3
from fusionmamba_tpu.train.loop import cast_compute

BATCH = 6
SIZE = 256


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(fn, *args, iters=5):
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def run(scan_impl: str, dwconv_impl: str, dtype, variables, x1, x2):
    cfg = full_config(scan_impl=scan_impl)
    model = VSSMFusion(cfg)
    orig = ss2d_mod.depthwise_conv3x3
    ss2d_mod.depthwise_conv3x3 = (
        lambda x, w, b=None: depthwise_conv3x3(x, w, b, impl=dwconv_impl))
    try:
        def loss(v, a, b):
            out = model.apply(cast_compute(v, dtype), a.astype(dtype),
                              b.astype(dtype))
            return jnp.mean(out.astype(jnp.float32) ** 2)

        gfn = jax.jit(jax.grad(loss))
        t_bwd = timed(gfn, variables, x1, x2)
        ffn = jax.jit(loss)
        t_fwd = timed(ffn, variables, x1, x2)
    finally:
        ss2d_mod.depthwise_conv3x3 = orig
    name = f"scan={scan_impl:7s} dwconv={dwconv_impl:6s} {jnp.dtype(dtype).name}"
    print(f"{name}: fwd {t_fwd*1e3:7.1f} ms   fwd+bwd {t_bwd*1e3:7.1f} ms "
          f"  ratio {t_bwd/t_fwd:4.1f}x", flush=True)


def main():
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 1)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 1)), jnp.float32)
    cfg = full_config()
    model = VSSMFusion(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1[:1], x2[:1])

    combos = [
        ("pallas", "pallas", jnp.float32),
        ("bypass", "pallas", jnp.float32),   # no scan math
        ("pallas", "xla", jnp.float32),      # XLA depthwise conv
        ("bypass", "xla", jnp.float32),      # neither custom kernel
        ("assoc", "xla", jnp.float32),       # XLA-only everything
        ("pallas", "pallas", jnp.bfloat16),
    ]
    for scan_impl, dwconv_impl, dtype in combos:
        run(scan_impl, dwconv_impl, dtype, variables, x1, x2)


if __name__ == "__main__":
    main()
