"""Training-trajectory evidence for the shipped operating point (VERDICT r2
item 8): N synthetic steps of the full fusion model under the library
default (bf16 activations + cumsum_mm scan) vs the exact fp32 `doubling`
scan, identical data/rng streams. Overlays the loss trajectories and gates
their divergence -- end-to-end de-risking of the cumsum envelope under
real weight updates (complementing ops/scan_guard.py's runtime margin).

Usage:
  python tools/train_trajectory.py [--steps 200] [--batch 12] [--out DIR]
    -> runs both arms in subprocesses (FM_SCAN_ALGO is read at import),
       writes JSON per arm, prints the divergence report.
  python tools/train_trajectory.py --arm <name> ... (internal)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = {
    # name: (env overrides, precision)
    "default_bf16": ({}, "bfloat16"),
    "doubling_fp32": ({"FM_SCAN_ALGO": "doubling"}, "float32"),
}


def run_arm(args) -> None:
    import jax

    if args.cpu:
        # pin BEFORE first backend use -- the axon sitecustomize otherwise
        # routes everything (incl. this validation tier) to the TPU tunnel
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fusionmamba_tpu.config import full_config, test_config
    from fusionmamba_tpu.data import SyntheticFusionDataset
    from fusionmamba_tpu.models import VSSMFusion
    from fusionmamba_tpu.train.loop import (
        TrainState, make_fusion_optimizer, make_fusion_train_step)

    # the axon tunnel registers the device as platform "axon"/"tpu"
    # depending on version -- anything that is not the pinned CPU tier
    # runs the full config on the accelerator
    on_tpu = jax.default_backend() != "cpu"
    cfg = full_config() if on_tpu else test_config(scan_impl="assoc")
    size = 256 if on_tpu else 32
    model = VSSMFusion(cfg)

    ds = SyntheticFusionDataset(length=args.batch * 8, size=(size, size),
                                seed=7)
    items = [ds[i] for i in range(len(ds))]

    x0 = jnp.zeros((1, size, size, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, x0)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=make_fusion_optimizer(1e-4))
    step = make_fusion_train_step(
        model, compute_dtype=jnp.dtype(args.precision), scan_guard=True)

    key = jax.random.PRNGKey(1)
    losses, margins = [], []
    for i in range(args.steps):
        idx = [(i * args.batch + j) % len(items) for j in range(args.batch)]
        vis = jnp.asarray(np.stack([items[k][0] for k in idx]))
        ir = jnp.asarray(np.stack([items[k][1] for k in idx]))
        state, m = step(state, vis, ir, jax.random.fold_in(key, i))
        losses.append(float(m["loss_total"]))
        margins.append(float(m["scan_sat_margin"]))
    out = {"arm": args.arm, "precision": args.precision,
           "scan_algo": os.environ.get("FM_SCAN_ALGO", "<default>"),
           "steps": args.steps, "batch": args.batch,
           "losses": losses, "margins": margins}
    path = os.path.join(args.out, f"trajectory_{args.arm}.json")
    os.makedirs(args.out, exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {path}: final loss {losses[-1]:.4f}, "
          f"max margin {max(margins):.2f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_artifacts", "trajectory"))
    ap.add_argument("--cpu", action="store_true",
                    help="validation tier: pin the CPU backend + tiny config")
    ap.add_argument("--arm", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--precision", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.arm:
        run_arm(args)
        return

    for name, (env, precision) in ARMS.items():
        full = dict(os.environ, **env)
        full.setdefault("JAX_COMPILATION_CACHE_DIR",
                        "/root/.cache/jax_comp")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", name,
             "--precision", precision, "--steps", str(args.steps),
             "--batch", str(args.batch), "--out", args.out]
            + (["--cpu"] if args.cpu else []),
            env=full, check=True)

    traj = {}
    for name in ARMS:
        with open(os.path.join(args.out, f"trajectory_{name}.json")) as f:
            traj[name] = json.load(f)
    a = traj["default_bf16"]["losses"]
    b = traj["doubling_fp32"]["losses"]

    def ema(xs, alpha=0.2):
        out, acc = [], xs[0]
        for x in xs:
            acc = alpha * x + (1 - alpha) * acc
            out.append(acc)
        return out

    ea, eb = ema(a), ema(b)
    rel = [abs(x - y) / max(abs(y), 1e-6) for x, y in zip(ea, eb)]
    tail = rel[len(rel) // 2:]
    print(json.dumps({
        "steps": len(a),
        "final_loss_default": a[-1], "final_loss_doubling": b[-1],
        "max_margin_default": max(traj["default_bf16"]["margins"]),
        "ema_rel_div_max": max(rel), "ema_rel_div_tail_max": max(tail),
        "gate_tail_rel_div_lt_5pct": max(tail) < 0.05,
    }, indent=2))


if __name__ == "__main__":
    main()
