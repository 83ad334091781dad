"""Trace-time saturation-margin collection for the selective scan.

The library-default scan algorithm ("cumsum_mm", `scan_pallas.py`) is exact
only while |A| * group-sum(delta) stays inside the +-SATURATION_CLIP rescale clip (72 by default, FM_SCAN_CLIP); that
holds at the reference init but is NOT guaranteed under training. This
module lets a train step observe the margin of every scan it traces without
threading a flag through the whole module tree:

    with collect_saturation_margins() as margins:
        out = model.apply(...)
    metric = jnp.max(jnp.stack(margins))

`selective_scan` records a margin into the active collector at TRACE time
(a plain Python check -- zero cost when no collector is active, including
in every jitted program traced outside the context). The recorded values
are tracers of the enclosing trace, so they flow into the step's metrics
like any other intermediate.
"""
from __future__ import annotations

import contextlib
from typing import List, Optional

import jax
import jax.numpy as jnp

from .scan_pallas import SATURATION_CLIP, saturation_margin

_ACTIVE: Optional[List[jax.Array]] = None


@contextlib.contextmanager
def collect_saturation_margins():
    """Collect the saturation margin of every `selective_scan` traced in
    the body. Yields the (initially empty) list; nesting restores the
    outer collector on exit."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = []
    try:
        yield _ACTIVE
    finally:
        _ACTIVE = prev


def is_collecting() -> bool:
    """True while a collect_saturation_margins() context is active (lets
    callers skip building the margin's inputs -- e.g. materializing a
    low-rank dt -- when nobody is listening)."""
    return _ACTIVE is not None


def maybe_record(delta, A, delta_bias, delta_softplus) -> None:
    """Called by `selective_scan` on its raw inputs; no-op (and no traced
    ops) unless a collector is active."""
    if _ACTIVE is not None:
        _ACTIVE.append(
            saturation_margin(delta, A, delta_bias, delta_softplus))


def maybe_record_value(margin) -> None:
    """Record an already-computed scalar margin (the adaptive TPU path gets
    it for free as a kernel output -- no dt materialization)."""
    if _ACTIVE is not None:
        _ACTIVE.append(jnp.asarray(margin, jnp.float32))


def reduce_margins(margins: List[jax.Array]) -> jax.Array:
    """Max over collected margins (0.0 when none were recorded)."""
    if not margins:
        return jnp.float32(0.0)
    return jnp.max(jnp.stack(margins))


def saturation_action(margin: float, scan_impl: str,
                      auto_exact: bool) -> Optional[str]:
    """Decision table for a logged saturation margin (shared by the
    training CLIs; unit-tested so the two loops cannot drift):

      "switch"      -- rebuild the step on impl="auto_exact" (margin
                       crossed the clip, auto-fallback armed, and the
                       model is on the switchable "auto" impl)
      "warn_exceed" -- margin crossed the clip but no auto-switch applies
                       (explicit impl or --no_auto_exact): tell the user
                       to restart on an exact algorithm
      "warn_near"   -- within 10% of the clip
      None          -- nothing to do (incl. already on ANY magnitude-exact
                       tier -- adaptive/auto_exact/pallas_exact/ref/assoc,
                       or a cumsum-family impl forced onto the doubling
                       algorithm via FM_SCAN_ALGO -- where the margin is
                       moot; ADVICE r4). "adaptive" self-corrects per call
                       (selective_scan.py) -- the margin metric stays
                       useful telemetry but needs no action.
    """
    if scan_impl in ("adaptive", "auto_exact", "pallas_exact", "ref",
                     "assoc"):
        return None
    from .scan_pallas import _algo
    if _algo() == "doubling":
        # pallas/auto/sp dispatch into the Pallas kernel, whose intra-chunk
        # algorithm is the magnitude-exact doubling scan here
        return None
    if margin >= SATURATION_CLIP:
        if auto_exact and scan_impl == "auto":
            return "switch"
        return "warn_exceed"
    if margin >= 0.9 * SATURATION_CLIP:
        return "warn_near"
    return None


__all__ = [
    "SATURATION_CLIP",
    "collect_saturation_margins",
    "is_collecting",
    "maybe_record",
    "maybe_record_value",
    "reduce_margins",
    "saturation_action",
    "saturation_margin",
]
