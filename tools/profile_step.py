"""Profile the fusion train step on device and rank ops by total duration.

Captures a perfetto trace (jax.profiler, create_perfetto_link=False) of a few
train steps, then parses the trace.json.gz event stream and aggregates device
op durations by fusion/op name. This replaces eyeballing tensorboard (not
installed here) with a one-shot textual report.

Usage: python tools/profile_step.py [--batch 6] [--dtype fp32|bf16]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/fm-profile")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse_only", action="store_true",
                    help="re-aggregate an existing trace in --logdir "
                         "without touching the device")
    args = ap.parse_args()

    if not args.parse_only:
        from fusionmamba_tpu.config import full_config
        from fusionmamba_tpu.models import VSSMFusion
        from fusionmamba_tpu.train import (
            TrainState, make_fusion_optimizer, make_fusion_train_step)

        cfg = full_config()
        model = VSSMFusion(cfg)
        rng = np.random.default_rng(0)
        x1 = jnp.asarray(rng.uniform(0, 1, (args.batch, 256, 256, 1)),
                         jnp.float32)
        x2 = jnp.asarray(rng.uniform(0, 1, (args.batch, 256, 256, 1)),
                         jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1[:1], x2[:1])
        state = TrainState.create(apply_fn=model.apply,
                                  params=variables["params"],
                                  tx=make_fusion_optimizer(1e-4))
        compute = jnp.float32 if args.dtype == "fp32" else jnp.bfloat16
        step = make_fusion_train_step(model, compute_dtype=compute)
        key = jax.random.PRNGKey(1)

        # warm up / compile outside the trace
        state, m = step(state, x1, x2, key)
        fetch(m)

        os.system(f"rm -rf {args.logdir}")
        jax.profiler.start_trace(args.logdir, create_perfetto_trace=True)
        for i in range(args.steps):
            state, m = step(state, x1, x2, jax.random.fold_in(key, i))
        fetch(m)
        jax.profiler.stop_trace()

    traces = glob.glob(
        os.path.join(args.logdir, "**", "*.trace.json.gz"), recursive=True)
    if not traces:
        print("no perfetto trace found under", args.logdir)
        return
    path = max(traces, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    events = data["traceEvents"] if isinstance(data, dict) else data
    # device-side complete events: pick pids whose process name mentions TPU
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "Device" in n or "/device" in n}

    import re

    # Three aggregations, all from the events' args metadata (NOT the HLO
    # instruction name: XLA names every generic fusion `fusion.NNN`, and
    # collapsing those by prefix once hid 72 ms/step of MXU dots behind a
    # representative u32 key-fold op):
    #   1. hlo_category (XLA's own: loop fusion / convolution fusion / ...)
    #   2. tf_op leaf op kind (dot_general / custom-call / ...), fwd vs bwd
    #   3. model component: the module path from tf_op, truncated
    agg = defaultdict(lambda: [0.0, 0])       # exact instruction
    samples = {}
    by_cat = defaultdict(float)
    by_kind = defaultdict(lambda: [0.0, 0])
    by_mod = defaultdict(lambda: [0.0, 0])
    total = 0.0

    def _kind(tf_op: str, name: str, cat: str) -> str:
        leaf = tf_op.rstrip(":").rsplit("/", 1)[-1] if tf_op else name
        leaf = re.sub(r"\.\d+$", "", leaf)
        bwd = "transpose(" in tf_op or "rematted" in name
        return ("bwd:" if bwd else "fwd:") + (leaf or cat or "?")

    def _module(tf_op: str) -> str:
        if not tf_op:
            return "<no tf_op>"
        p = tf_op.rstrip(":")
        # strip jit()/jvp()/transpose() wrappers from each segment
        segs = [re.sub(r"^(jit|jvp|transpose|remat)\(|\)$", "", s)
                for s in p.split("/")]
        segs = [s for s in segs if s and not s.startswith("jit(")]
        # drop the leading jit(train_step)/VSSMFusion noise, keep the
        # informative middle (stage/block/submodule), drop the leaf op
        segs = [s for s in segs
                if s not in ("train_step", "VSSMFusion", "wrapped_fn")]
        return "/".join(segs[:4]) if len(segs) > 1 else (segs[0] if segs
                                                         else "<top>")

    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        # XLA op events live on "XLA Ops"-ish threads; steps/TraceMe on others
        if tname and ("Steps" in tname or "Framework" in tname):
            continue
        name = e.get("name", "?")
        if name.startswith("jit_"):  # whole-program envelope: not an op
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        a = e.get("args") or {}
        cat = a.get("hlo_category", "?")
        tf_op = a.get("tf_op", "")
        agg[name][0] += dur
        agg[name][1] += 1
        if name not in samples and a:
            samples[name] = a
        by_cat[cat] += dur
        k = _kind(tf_op, name, cat)
        by_kind[k][0] += dur
        by_kind[k][1] += 1
        m = _module(tf_op)
        by_mod[m][0] += dur
        by_mod[m][1] += 1
        total += dur

    print(f"trace: {path}")
    print(f"pids: { {p: pid_names.get(p, '') for p in device_pids} }")
    print(f"total device op time: {total:.1f} ms over {args.steps} steps "
          f"=> {total/args.steps:.1f} ms/step")
    print("-- hlo_category --")
    for c, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{dur/args.steps:9.2f}  {100*dur/total:5.1f}  {c}")
    print("-- op kind (tf_op leaf; fwd = primal, bwd = transpose) --")
    for c, (dur, cnt) in sorted(by_kind.items(), key=lambda kv: -kv[1][0])[
            :args.top]:
        print(f"{dur/args.steps:9.2f}  {100*dur/total:5.1f}  {cnt:6d}  {c}")
    print("-- model component (tf_op path) --")
    for c, (dur, cnt) in sorted(by_mod.items(), key=lambda kv: -kv[1][0])[
            :args.top]:
        print(f"{dur/args.steps:9.2f}  {100*dur/total:5.1f}  {cnt:6d}  {c}")
    print(f"-- top instructions --\n{'ms/step':>9}  {'%':>5}  {'calls':>6}  "
          "name")
    for name, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[
            :args.top]:
        meta = samples.get(name) or {}
        longn = str(meta.get("long_name", meta.get("hlo_op", "")))[:70]
        src = str(meta.get("tf_op", ""))[-70:]
        print(f"{dur/args.steps:9.2f}  {100*dur/total:5.1f}  {cnt:6d}  "
              f"{name[:28]}  {longn}  {src}")


if __name__ == "__main__":
    main()
