"""Benchmark: fused image pairs/sec/chip at 256^2 (training step, batch 6).

Comparable to the reference baseline recovered from its training logs:
~0.38 s/step at batch 6 => ~15.8 pairs/s on the authors' CUDA GPU
(BASELINE.md; `logs/Net-2025-07-29-21-32-57.log`). This measures the same
quantity: full fusion training step (forward + Fusionloss + backward + Adam
update) on the full-size model (depths [2,2,9,2]) at 256x256, batch 6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_SEC = 15.8
BATCH = 6
STEPS = 20  # all inside one dispatch (fori_loop) -- see run_n below


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
        cfg = full_config()
        size = 256
        batch = BATCH
        steps = STEPS
    else:  # CPU smoke fallback so the script always emits a result line
        cfg = test_config(scan_impl="assoc")
        size = 32
        batch = 2
        steps = 2

    model = VSSMFusion(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 1)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 1)), jnp.float32)

    import functools

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1[:1], x2[:1])
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_fusion_optimizer(1e-4))
    raw_step = make_fusion_train_step(model, jit=False)

    # run all measured steps inside ONE jitted fori_loop: a single device
    # dispatch, so the measurement is on-device throughput (pairs/sec/chip)
    # rather than per-step host->device dispatch latency, which through the
    # tunneled backend is large and highly variable (measured 124-250 ms for
    # the same 124 ms step across runs)
    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0,))
    def run_n(state, x1, x2, key, n):
        def body(i, st):
            st2, metrics = raw_step(st, x1, x2, jax.random.fold_in(key, i))
            return st2
        return jax.lax.fori_loop(0, n, body, state)

    key = jax.random.PRNGKey(1)
    # warmup / compile; NOTE: on tunneled backends block_until_ready can
    # return early, so synchronize by fetching a VALUE -- the chained state
    # dependency then guarantees every step finished
    state = run_n(state, x1, x2, key, steps)
    float(jax.tree_util.tree_leaves(state.params)[0].reshape(-1)[0])

    t0 = time.perf_counter()
    state = run_n(state, x1, x2, jax.random.fold_in(key, 7), steps)
    float(jax.tree_util.tree_leaves(state.params)[0].reshape(-1)[0])
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * steps / dt
    result = {
        "metric": "fusion train pairs/sec/chip @256^2 (batch 6, full model)"
                  if on_tpu else "CPU-smoke pairs/sec (not comparable)",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
