"""FLOPs / parameter accounting (reference component #36:
`flops_selective_scan_ref` einsum-path FLOP model,
`models/vmamba_Fusion_efficross.py:33-148`, and thop-based
`cal_params_flops`, `utils.py:449-458`).

JAX-native: the analytic selective-scan FLOP model, plus exact whole-model
cost via `jax.jit(...).lower().cost_analysis()` (XLA's own accounting --
stronger than thop's module walk since it sees the fused graph).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np


def flops_selective_scan(B: int, L: int, D: int, N: int, with_D: bool = True,
                         with_z: bool = False) -> int:
    """Analytic FLOPs of one selective scan, einsum-path accounting like the
    reference model: deltaA (B L D N), deltaB_u (B L D N), the L-step
    recurrence (2 madds per element), and the C contraction."""
    flops = 0
    flops += 2 * B * L * D * N          # deltaA = exp(delta * A) (mul only)
    flops += 3 * B * L * D * N          # deltaB_u = delta * B * u
    flops += 2 * B * L * D * N          # h = a*h + b
    flops += 2 * B * L * D * N          # y = <C, h>
    if with_D:
        flops += 2 * B * D * L
    if with_z:
        flops += 2 * B * D * L
    return flops


def count_params(params: Any) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params)
               if hasattr(x, "shape"))


def xla_cost(fn: Callable, *args, **kwargs) -> dict:
    """Exact XLA cost analysis of the jitted fn at these avals."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return dict(analysis) if analysis else {}


def model_cost_report(model, variables, *example_inputs) -> dict:
    """Params + XLA-level FLOPs/bytes for a forward pass."""
    params = variables.get("params", variables)
    n_params = count_params(params)

    def fwd(v, *xs):
        return model.apply(v, *xs)

    cost = xla_cost(fwd, variables, *example_inputs)
    return {
        "params": n_params,
        "flops": cost.get("flops", float("nan")),
        "bytes_accessed": cost.get("bytes accessed", float("nan")),
    }
