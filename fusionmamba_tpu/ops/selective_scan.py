"""Public selective-scan API with implementation dispatch.

`selective_scan(...)` is the single entry point the model layer uses; it
routes to one of three implementations:

  * "ref"    -- sequential `lax.scan` oracle (scan_ref.py)
  * "assoc"  -- `lax.associative_scan` pure-XLA path (scan_assoc.py)
  * "pallas" -- fused Pallas TPU kernel (scan_pallas.py)
  * "sp"     -- sequence-parallel over the ambient mesh's "model" axis
                (parallel/seq_scan.py; local scans use "auto"); for
                >=1k-resolution inputs where L justifies cross-chip scans
  * "auto"   -- pallas on TPU backends, assoc elsewhere
  * "adaptive" -- auto, plus a per-call on-device cond onto the
                magnitude-exact doubling kernel whenever the saturation
                margin crosses the rescale clip (exact at any magnitude,
                cumsum_mm speed while safe -- the training default)

Canonical layout (channels-last, TPU-native):
    u, delta : (B, K, L, D)   A: (K, D, N)   Bmat/Cmat: (B, K, L, N)
    D, delta_bias: (K, D)
K is the direction axis of the SS2D four-direction scan (K=1 for plain 1-D
Mamba use). This replaces the reference's (B, K*D, L) + grouped-B layout
(`models/cross.py:239-252`): folding K into an explicit axis instead of the
channel dim keeps every block MXU/VPU aligned without grouped-B reshapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .scan_assoc import selective_scan_assoc
from .scan_pallas import selective_scan_pallas
from .scan_ref import selective_scan_ref

_IMPLS = ("auto", "auto_exact", "adaptive", "ref", "assoc", "pallas",
          "pallas_exact", "pallas_interpret", "sp", "bypass")


def _materialize_dt(delta, dt_lowrank_weight):
    """(B, K, L, R) @ (K, D, R) -> (B, K, L, D) full dt for the impls that
    take the expanded layout (ref/assoc/sp and the guard's margin)."""
    if dt_lowrank_weight is None:
        return delta
    return jnp.einsum("bklr,kdr->bkld", delta,
                      dt_lowrank_weight.astype(delta.dtype))


def _auto_dispatch(u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus,
                   return_last_state, dt_lowrank_weight=None,
                   algo=None):
    """Route per *lowering platform*, not per default backend: under the
    axon tunnel jax.default_backend() is always 'tpu' even when the
    computation targets a virtual CPU mesh (multichip dryrun), so the
    decision must be made inside the lowered program.

    The low-rank dt materialization for the non-Pallas branch happens
    INSIDE that branch, so TPU lowerings never emit it (platform_dependent
    drops the dead branch at lowering time)."""
    if return_last_state:  # pallas serves the no-last-state fast path only
        return selective_scan_assoc(
            u, _materialize_dt(delta, dt_lowrank_weight), A, Bmat, Cmat, D,
            delta_bias, delta_softplus, True)
    return jax.lax.platform_dependent(
        tpu=lambda: selective_scan_pallas(
            u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus, False,
            dt_lowrank_weight=dt_lowrank_weight, algo=algo),
        default=lambda: selective_scan_assoc(
            u, _materialize_dt(delta, dt_lowrank_weight), A, Bmat, Cmat, D,
            delta_bias, delta_softplus, False),
    )


def selective_scan(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    Bmat: jax.Array,
    Cmat: jax.Array,
    D: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    impl: str = "auto",
    dt_lowrank_weight: jax.Array | None = None,
):
    """dt_lowrank_weight (K, D, R): prologue fusion. When given, `delta` is
    the LOW-RANK (B, K, L, R) dt_proj input (the reference's x_proj dt
    slice, `models/cross.py:305-310`) and the expansion to (B, K, L, D)
    happens INSIDE the Pallas kernel on the MXU -- the full dt tensor never
    round-trips through HBM on the TPU path (MambaInnerFn-scope fusion,
    `selective_scan_interface.py:161-358`). Non-Pallas impls materialize
    it with one einsum and behave identically."""
    if impl not in _IMPLS:
        raise ValueError(f"impl must be one of {_IMPLS}, got {impl!r}")
    if impl not in ("bypass", "adaptive"):
        # zero-cost unless a collect_saturation_margins() context is active
        # (train steps use it to detect cumsum-clip saturation,
        # scan_guard.py). With the guard on, the low-rank path pays one
        # einsum materialization of dt -- the documented ~1-2% guard cost.
        # "adaptive" records below instead: its TPU kernel emits the margin
        # for free, so the guard costs ~nothing there.
        from .scan_guard import is_collecting, maybe_record
        if is_collecting():
            maybe_record(_materialize_dt(delta, dt_lowrank_weight), A,
                         delta_bias, delta_softplus)
    if impl == "auto":
        return _auto_dispatch(u, delta, A, Bmat, Cmat, D, delta_bias,
                              delta_softplus, return_last_state,
                              dt_lowrank_weight)
    if impl == "auto_exact":
        # like "auto" but magnitude-exact on every platform: doubling-scan
        # pallas on TPU, associative_scan elsewhere (both exact for any
        # input magnitudes). The saturation-guard auto-fallback target.
        return _auto_dispatch(u, delta, A, Bmat, Cmat, D, delta_bias,
                              delta_softplus, return_last_state,
                              dt_lowrank_weight, algo="doubling")
    if impl == "adaptive":
        # magnitude-exact at cumsum_mm speed: RUN-THEN-REPAIR. The fast
        # kernel emits its own per-cell saturation margin (the quantity the
        # rescale clips, computed in-kernel on the unexpanded width -- the
        # low-rank dt never materializes through HBM for it) and ONE
        # on-device cond re-runs the call through the magnitude-exact
        # doubling kernel only when the margin crossed the clip; the
        # backward conds on the saved decision and runs exactly one kernel.
        # No retrace, no host sync. A training run whose margin drifts past
        # the clip (bench_artifacts/trajectory/: 59 -> 5800 in 200 steps)
        # flips only the affected layers onto the doubling kernel.
        # (An in-kernel per-grid-cell variant was built and measured
        # slower -- see scan_pallas.py "adaptive_cell".)
        if return_last_state:
            return selective_scan_assoc(
                u, _materialize_dt(delta, dt_lowrank_weight), A, Bmat, Cmat,
                D, delta_bias, delta_softplus, True)
        from .scan_guard import is_collecting, maybe_record_value
        from .scan_pallas import (saturation_margin,
                                  selective_scan_pallas_adaptive)
        collecting = is_collecting()

        def _tpu():
            return selective_scan_pallas_adaptive(
                u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus,
                dt_lowrank_weight=dt_lowrank_weight, return_margin=True)

        def _default():
            dt_m = _materialize_dt(delta, dt_lowrank_weight)
            out = selective_scan_assoc(u, dt_m, A, Bmat, Cmat, D,
                                       delta_bias, delta_softplus, False)
            # assoc is magnitude-exact; the margin here is telemetry only
            # (what a switch to the cumsum default WOULD see). DCE'd when
            # no collector consumes it.
            return out, saturation_margin(dt_m, A, delta_bias,
                                          delta_softplus)

        out, margin = jax.lax.platform_dependent(tpu=_tpu, default=_default)
        if collecting:
            maybe_record_value(margin)
        return out
    if impl == "ref":
        return selective_scan_ref(
            u, _materialize_dt(delta, dt_lowrank_weight), A, Bmat, Cmat, D,
            delta_bias, delta_softplus, return_last_state)
    if impl == "assoc":
        return selective_scan_assoc(
            u, _materialize_dt(delta, dt_lowrank_weight), A, Bmat, Cmat, D,
            delta_bias, delta_softplus, return_last_state)
    if impl == "sp":
        if return_last_state:
            raise NotImplementedError(
                "impl='sp' does not expose the last state (the carry is an "
                "internal cross-chip exchange); use 'assoc'/'ref'")
        # lazy import: parallel.seq_scan imports this module
        from ..parallel.seq_scan import selective_scan_seq_parallel
        return selective_scan_seq_parallel(
            u, _materialize_dt(delta, dt_lowrank_weight), A, Bmat, Cmat, D,
            delta_bias, delta_softplus=delta_softplus, batch_axis="data")
    if impl == "bypass":
        # timing-ablation stub: correct shapes, no scan math (NOT a model)
        out = u * 1.0001 + 0.0001 * jnp.sum(Bmat * Cmat, axis=-1,
                                            keepdims=True)
        if return_last_state:
            N = A.shape[-1]
            return out, jnp.zeros(u.shape[:2] + (u.shape[3], N), u.dtype)
        return out
    if impl == "pallas_exact":
        # magnitude-exact tier: the pure-VPU doubling scan (~9% slower at
        # step level than the cumsum_mm default) -- the auto-fallback
        # target when training drifts past the saturation envelope
        # (scan_guard margin >= SATURATION_CLIP; see train.py)
        return selective_scan_pallas(
            u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus,
            return_last_state, dt_lowrank_weight=dt_lowrank_weight,
            algo="doubling")
    if impl == "pallas_interpret":
        return selective_scan_pallas(
            u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus,
            return_last_state, interpret=True,
            dt_lowrank_weight=dt_lowrank_weight)
    return selective_scan_pallas(
        u, delta, A, Bmat, Cmat, D, delta_bias, delta_softplus,
        return_last_state, dt_lowrank_weight=dt_lowrank_weight)
