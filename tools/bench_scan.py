"""Selective-scan kernel micro-benchmark: pallas vs associative_scan on the
real model shapes (stage L/D pairs of the 256^2 fusion model), fwd and
fwd+bwd. Also cross-checks numerics between the two implementations on
device. Use to choose the default impl and tune block sizes.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from fusionmamba_tpu.ops import selective_scan

# (L, D) per stage at 256^2 input with stride-2 efficient scan; D = 2*dims
STAGES = [(1024, 192), (256, 384), (64, 768), (16, 1536)]
BATCH = 6
K = 4
N = 16


_DTYPE = jnp.float32
_BATCH_OVR = None
# prologue-fusion mode: dt is passed LOW-RANK (B, K, L, R) with the model's
# R = d_model/16 = D/32 and the dt_projs weight goes through
# dt_lowrank_weight (scan_pallas.py kernel-internal expansion)
_LOWRANK_W = None


# dt_bias regime: "randn" (historic default; softplus(~N(0,1)) deltas put
# the saturation margin at ~110 > the 60 clip, i.e. the DRIFTED-training
# regime) or "init" (the reference model's softplus_inv([1e-3, 0.1]) bias,
# margin ~8 -- the regime impl="adaptive" rides its fast branch in)
_DTBIAS = "randn"


def make_args(L, D, seed=0, lowrank=False):
    global _LOWRANK_W
    rng = np.random.default_rng(seed)
    b = _BATCH_OVR or BATCH
    u = jnp.asarray(rng.standard_normal((b, K, L, D)), _DTYPE)
    if lowrank:
        R = max(D // 32, 1)
        dt = jnp.asarray(0.1 * rng.standard_normal((b, K, L, R)), _DTYPE)
        _LOWRANK_W = jnp.asarray(
            0.3 * rng.standard_normal((K, D, R)), _DTYPE)
    else:
        dt = jnp.asarray(0.1 * rng.standard_normal((b, K, L, D)), _DTYPE)
        _LOWRANK_W = None
    A = -jnp.exp(jnp.asarray(rng.uniform(0, 1.5, (K, D, N)), jnp.float32))
    Bm = jnp.asarray(rng.standard_normal((b, K, L, N)), _DTYPE)
    Cm = jnp.asarray(rng.standard_normal((b, K, L, N)), _DTYPE)
    Dp = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    if _DTBIAS == "init":
        dtv = np.exp(rng.uniform(np.log(1e-3), np.log(0.1), (K, D)))
        bias = jnp.asarray(dtv + np.log(-np.expm1(-dtv)), jnp.float32)
    else:
        bias = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    return u, dt, A, Bm, Cm, Dp, bias


def fetch(out):
    """block_until_ready can return early through the axon tunnel; fetching
    a VALUE guarantees completion."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(fn, *args, iters=20):
    fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--chained", action="store_true",
                    help="dependency-chained in-program repeats (amortizes "
                         "the ~3 ms per-dispatch tunnel latency)")
    ap.add_argument("--impl", type=str, default="pallas")
    ap.add_argument("--stages", type=int, default=len(STAGES),
                    help="bench only the first N stage configs")
    ap.add_argument("--algos", action="store_true",
                    help="compare FM_SCAN_ALGO variants in subprocesses")
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--lowrank", action="store_true",
                    help="pass dt low-rank + projection weight (prologue "
                         "fusion; chained mode only)")
    ap.add_argument("--dtbias", default="randn", choices=["randn", "init"],
                    help="dt-bias regime (see _DTBIAS): 'init' keeps the "
                         "saturation margin under the clip, 'randn' is the "
                         "drifted regime")
    args = ap.parse_args()
    global _DTYPE, _BATCH_OVR, _DTBIAS
    if args.dtype == "bf16":
        _DTYPE = jnp.bfloat16
    _BATCH_OVR = args.batch
    _DTBIAS = args.dtbias
    if args.algos:
        compare_algos()
        return
    if args.chained:
        main_chained(impl=args.impl, bwd=args.bwd,
                     stages=STAGES[:args.stages],
                     lowrank=args.lowrank or
                     os.environ.get("FM_BENCH_LOWRANK") == "1")
        return

    for L, D in STAGES:
        inputs = make_args(L, D)
        results = {}
        outs = {}
        for impl in ("assoc", "pallas"):
            fwd = jax.jit(lambda *a, impl=impl: selective_scan(
                *a, delta_softplus=True, impl=impl))
            t = timed(fwd, *inputs, iters=args.iters)
            results[f"{impl}_fwd"] = t
            outs[impl] = fwd(*inputs)
            if args.bwd:
                grad = jax.jit(jax.grad(
                    lambda *a, impl=impl: jnp.sum(
                        selective_scan(*a, delta_softplus=True, impl=impl)),
                    argnums=(0, 1, 2, 3, 4, 5, 6)))
                t = timed(grad, *inputs, iters=args.iters)
                results[f"{impl}_fwdbwd"] = t
        diff = float(jnp.max(jnp.abs(outs["assoc"] - outs["pallas"])))
        elems = BATCH * K * L * D
        line = f"L={L:5d} D={D:5d} maxdiff={diff:.2e} "
        for k, v in results.items():
            line += f"{k}={v*1e3:8.3f}ms ({elems/v/1e9:6.2f} Gelem/s)  "
        print(line)




def timed_chained(make_fn, inputs, reps=8, iters=5):
    """Amortize per-dispatch tunnel latency (~3 ms) by chaining `reps`
    dependent scan calls inside ONE jitted program."""
    u, dt, A, Bm, Cm, Dp, bias = inputs

    @jax.jit
    def many(u, dt, A, Bm, Cm, Dp, bias):
        acc = jnp.float32(0.0)
        for _ in range(reps):
            out = make_fn(u + acc * 1e-20, dt, A, Bm, Cm, Dp, bias)
            acc = out if out.ndim == 0 else jnp.mean(out)
        return acc

    fetch(many(u, dt, A, Bm, Cm, Dp, bias))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = many(u, dt, A, Bm, Cm, Dp, bias)
    fetch(out)
    return (time.perf_counter() - t0) / (iters * reps)


def main_chained(impl="pallas", bwd=False, stages=STAGES, lowrank=False):
    for L, D in stages:
        inputs = make_args(L, D, lowrank=lowrank)
        W = _LOWRANK_W
        fwd_fn = lambda *a: selective_scan(*a, delta_softplus=True,
                                           impl=impl, dt_lowrank_weight=W)
        t_fwd = timed_chained(fwd_fn, inputs)
        line = f"L={L:5d} D={D:5d} fwd={t_fwd*1e3:7.3f}ms"
        if bwd:
            grad_fn = lambda *a: jax.grad(
                lambda *b: jnp.sum(selective_scan(
                    *b, delta_softplus=True, impl=impl,
                    dt_lowrank_weight=W)),
                argnums=(0, 1))(*a)[0].mean()
            t_bwd = timed_chained(grad_fn, inputs)
            line += f"  fwd+bwd={t_bwd*1e3:7.3f}ms"
        print(line, flush=True)




def compare_algos():
    """Run the chained pallas bench (hot two stages) under each FM_SCAN_ALGO
    in a subprocess (the env var is read at import)."""
    import subprocess
    here = os.path.abspath(__file__)
    for algo in ("cumsum", "cumsum_mm", "doubling"):
        env = dict(os.environ, FM_SCAN_ALGO=algo,
                   JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_comp")
        print(f"==== FM_SCAN_ALGO={algo}", flush=True)
        subprocess.run(
            [sys.executable, here, "--chained", "--bwd", "--stages", "2"],
            env=env)


if __name__ == "__main__":
    main()
