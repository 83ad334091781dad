"""Fused-MLP kernel micro-bench at the model's per-stage shapes (b24 bf16,
trunk batch 48), chained fwd+bwd, vs the plain XLA Dense-GELU-Dense form.

Usage: python tools/bench_mlp.py [--budgets 262144,524288,1048576]
Each budget runs in-process (the env var is read at import in mlp_pallas,
so we set the module global directly).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (M, C, H) per stage at 256^2, trunk batch 48 (= 2 images x b24)
STAGES = [(48 * 64 * 64, 96, 384), (48 * 32 * 32, 192, 768),
          (48 * 16 * 16, 384, 1536), (48 * 8 * 8, 768, 3072)]


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timed_chained(fn, args, reps=8, iters=5):
    @jax.jit
    def many(*a):
        acc = jnp.float32(0.0)
        x = a[0]
        for _ in range(reps):
            out = fn(x + acc.astype(x.dtype) * 0, *a[1:])
            acc = jnp.mean(out).astype(jnp.float32)
        return acc
    fetch(many(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = many(*args)
    fetch(out)
    return (time.perf_counter() - t0) / (iters * reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets", default="524288")
    ap.add_argument("--plain", action="store_true")
    args = ap.parse_args()

    from fusionmamba_tpu.ops import mlp_pallas

    def plain(x, w1, b1, w2, b2):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return h @ w2 + b2

    for M, C, H in STAGES:
        rng = np.random.default_rng(C)
        x = jnp.asarray(rng.standard_normal((M, C)), jnp.bfloat16)
        w1 = jnp.asarray(0.05 * rng.standard_normal((C, H)), jnp.bfloat16)
        b1 = jnp.asarray(0.05 * rng.standard_normal((H,)), jnp.bfloat16)
        w2 = jnp.asarray(0.05 * rng.standard_normal((H, C)), jnp.bfloat16)
        b2 = jnp.asarray(0.05 * rng.standard_normal((C,)), jnp.bfloat16)
        a = (x, w1, b1, w2, b2)
        line = f"M={M:7d} C={C:4d} H={H:4d}"
        if args.plain:
            gp = lambda *aa: jax.grad(lambda *b: jnp.sum(
                plain(*b).astype(jnp.float32)), argnums=(0, 1, 3))(*aa)[0]
            line += f"  plain fwd={timed_chained(plain, a)*1e3:7.3f}ms"
            line += f" fwdbwd={timed_chained(gp, a)*1e3:7.3f}ms"
        for budget in (int(b) for b in args.budgets.split(",")):
            mlp_pallas._ROW_BUDGET = budget
            fused = lambda *aa: mlp_pallas.fused_mlp(*aa)
            gf = lambda *aa: jax.grad(lambda *b: jnp.sum(
                mlp_pallas.fused_mlp(*b).astype(jnp.float32)),
                argnums=(0, 1, 3))(*aa)[0]
            line += (f"  [{budget//1024}K] fwd="
                     f"{timed_chained(fused, a)*1e3:7.3f}ms"
                     f" fwdbwd={timed_chained(gf, a)*1e3:7.3f}ms")
        print(line, flush=True)


if __name__ == "__main__":
    main()
