"""Ablate the forward pass to locate the hot component: full model forward
with scan_impl in {pallas, bypass}, plus single-module timings.
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


def main():
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 1)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 1)), jnp.float32)

    for impl in ("pallas", "bypass", "assoc"):
        cfg = full_config(scan_impl=impl)
        model = VSSMFusion(cfg)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1[:1],
                                        x2[:1])
        fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
        t = timed(fwd, variables, x1, x2)
        print(f"forward impl={impl:7s}: {t*1e3:8.1f} ms "
              f"({BATCH/t:6.1f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
