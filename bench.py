"""Benchmark: fused image pairs/sec/chip at 256^2 (full training step).

Comparable to the reference baseline recovered from its training logs:
~0.38 s/step at batch 6 => ~15.8 pairs/s on the authors' CUDA GPU
(BASELINE.md; `logs/Net-2025-07-29-21-32-57.log`). This measures the same
quantity: full fusion training step (forward + Fusionloss + backward + Adam
update) on the full-size model (depths [2,2,9,2]) at 256x256, batch 6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# The bench runs the LIBRARY DEFAULTS (scan_pallas.py: cumsum_mm / Q=32 /
# MM_PREC=default / GRAD_MM=default) -- no bench-only env overrides. One
# deliberate difference from the train.py CLI: the saturation-margin guard
# (train.py default ON, ~1-2% of a step) is off here, matching
# `--no_scan_guard`; set FM_BENCH_GUARD=1 to include it.

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_SEC = 15.8
# throughput-optimal config from tools/bench_batch_sweep.py (PERF.md): the
# reference is locked to batch 6 / fp32 by its GPU; the pairs/sec/chip metric
# is free to use the best batch and precision (bf16 activations, fp32 master
# params + fp32 math inside the scan/dwconv kernels; loss trajectory matches
# fp32 to 3 decimals over 12 steps)
BATCH = int(os.environ.get("FM_BENCH_BATCH", 24))
COMPUTE_DTYPE = os.environ.get("FM_BENCH_DTYPE", "bfloat16")
# chained dispatch, one value fetch at the end. 40 steps x 3 passes (was
# 20 x 2 through r3): the tunnel carries +-10-20% noise per pass and
# min-of-2x20 could not resolve a real -5% step win (VERDICT r3 weak #5);
# longer passes + one more sample tighten the min-estimator enough that
# BENCH_r*.json agrees with the device-profile deltas
STEPS = int(os.environ.get("FM_BENCH_STEPS", 40))
PASSES = int(os.environ.get("FM_BENCH_PASSES", 3))


def main():
    from fusionmamba_tpu.config import full_config, test_config
    from fusionmamba_tpu.models import VSSMFusion
    from fusionmamba_tpu.train.loop import (
        TrainState,
        make_fusion_optimizer,
        make_fusion_train_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = full_config(
            remat_light=os.environ.get("FM_BENCH_REMAT_LIGHT", "0") == "1",
            # A/B knob: FM_BENCH_SCAN_IMPL=pallas isolates the adaptive
            # dispatch's margin+cond cost from the kernel cost
            scan_impl=os.environ.get("FM_BENCH_SCAN_IMPL", "adaptive"))
        size = 256
        batch = BATCH
        steps = STEPS
        compute_dtype = jnp.dtype(COMPUTE_DTYPE)
    else:  # CPU smoke fallback so the script always emits a result line
        cfg = test_config(scan_impl="assoc")
        size = 32
        batch = 2
        steps = 2
        compute_dtype = jnp.float32

    model = VSSMFusion(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 1)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 1)), jnp.float32)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1[:1], x2[:1])
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_fusion_optimizer(1e-4))
    step = make_fusion_train_step(
        model, compute_dtype=compute_dtype,
        scan_guard=os.environ.get("FM_BENCH_GUARD") == "1")

    # Async chained dispatch: launch all steps back-to-back WITHOUT a
    # per-step sync, then fetch one metric value at the end. The donated
    # state dependency chains execution on device, dispatch overlaps
    # execution, and the single final fetch adds one tunnel round trip
    # amortized over `steps`. (A fori_loop single-dispatch variant measured
    # 4x SLOWER per step -- XLA loses buffer donation across the loop-body
    # carry and the whole train state double-buffers in HBM -- and per-step
    # synced timing adds a 30-130 ms tunnel round trip to every step.)
    key = jax.random.PRNGKey(1)
    # warmup / compile; on tunneled backends block_until_ready can return
    # early, so synchronize by fetching a VALUE
    state, m = step(state, x1, x2, key)
    float(jnp.asarray(m["loss_total"]))
    state, m = step(state, x1, x2, key)   # post-donation steady state
    float(jnp.asarray(m["loss_total"]))

    # timed passes: their agreement (or not) separates steady-state
    # throughput from tunnel/host jitter in the recorded JSON
    pass_ms = []
    for _ in range(PASSES if on_tpu else 2):
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, x1, x2, jax.random.fold_in(key, i))
        float(jnp.asarray(m["loss_total"]))
        pass_ms.append((time.perf_counter() - t0) * 1000.0 / steps)
    step_ms = min(pass_ms)
    pairs_per_sec = batch * 1000.0 / step_ms

    # STEADY-STATE arm (VERDICT r4 #2): real training drifts the saturation
    # margin past the cumsum rescale clip within ~20 steps
    # (bench_artifacts/trajectory/: 59 -> 5800 by step 200), after which the
    # default scan_impl="adaptive" flips the affected scan calls onto the
    # magnitude-exact doubling kernel ON DEVICE (ops/selective_scan.py) --
    # same jitted program, values-only change, no recompile. Measure that
    # operating point by driving EVERY dt_projs_bias far past the clip (the
    # all-calls-tripped WORST CASE; a real run trips a subset of layers and
    # lands between the two numbers).
    def _drift_bias(p):
        def walk(node, path=""):
            if isinstance(node, dict):
                return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
            if path.endswith("dt_projs_bias"):
                return jnp.full_like(node, 50.0)  # softplus(50)*|A| >> clip
            return node
        return walk(p)

    steady_pairs_per_sec = None
    if on_tpu:
        state = state.replace(params=_drift_bias(state.params))
        state, m = step(state, x1, x2, key)       # re-enter steady regime
        float(jnp.asarray(m["loss_total"]))
        sp_ms = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            for i in range(steps):
                state, m = step(state, x1, x2, jax.random.fold_in(key, i))
            float(jnp.asarray(m["loss_total"]))
            sp_ms.append((time.perf_counter() - t0) * 1000.0 / steps)
        steady_pairs_per_sec = batch * 1000.0 / min(sp_ms)

    # environment fingerprint: a 2x swing between sessions (BENCH_r01 26.97
    # vs builder-measured 65.4) was undiagnosable without knowing which
    # libtpu/runtime the driver's run actually hit
    dev = jax.devices()[0]
    try:
        from jax.extend import backend as _jexb
        platform_version = _jexb.get_backend().platform_version
    except Exception as e:  # fingerprint must never fail the bench
        platform_version = f"<unavailable: {e}>"
    fingerprint = {
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "device": getattr(dev, "device_kind", str(dev)),
        "platform_version": platform_version.replace("\n", "; ")[:200],
        "scan_algo": os.environ.get("FM_SCAN_ALGO", "<library default>"),
        "pass_ms": [round(p, 2) for p in pass_ms],
    }
    result = {
        "metric": f"fusion train pairs/sec/chip @256^2 (batch {batch}, "
                  f"{compute_dtype} activations, full model)"
                  if on_tpu else "CPU-smoke pairs/sec (not comparable)",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        "step_ms": round(step_ms, 2),
        "batch": batch,
        "env": fingerprint,
    }
    if steady_pairs_per_sec is not None:
        # drifted-margin worst case: every scan call on the exact doubling
        # kernel (see the steady-state comment above)
        result["steady_state_pairs_s"] = round(steady_pairs_per_sec, 3)
        result["steady_state_vs_baseline"] = round(
            steady_pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
