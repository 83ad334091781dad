"""Selective scan via `jax.lax.associative_scan` (pure-XLA fast path).

The recurrence h_l = a_l * h_{l-1} + b_l is a monoid over pairs
(a, b) with composition (a1, b1) ∘ (a2, b2) = (a1*a2, a2*b1 + b2),
mirroring the float2/float4 `SSMScanOp` of the reference CUDA kernel
(`selective_scan/selective_scan_common.h:108-130`). XLA lowers the
log-depth combine to fused VPU ops; this path serves as the fallback
wherever the Pallas kernel is unavailable and as an A/B baseline for it.

Memory note: materializes (B, K, L, D, N) float32 intermediates, so it
trades HBM traffic for simplicity; the Pallas kernel avoids that.
Layouts are identical to `scan_ref.selective_scan_ref`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, a2 * b1 + b2


def selective_scan_assoc(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    Bmat: jax.Array,
    Cmat: jax.Array,
    D: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
):
    in_dtype = u.dtype
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    A = A.astype(jnp.float32)
    Bmat = Bmat.astype(jnp.float32)
    Cmat = Cmat.astype(jnp.float32)

    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)

    # a: (B, K, L, D, N), b: (B, K, L, D, N)
    a = jnp.exp(delta[..., None] * A[None, :, None, :, :])
    b = (delta * u)[..., None] * Bmat[..., None, :]

    _, h = jax.lax.associative_scan(_combine, (a, b), axis=2)
    out = jnp.einsum("bkldn,bkln->bkld", h, Cmat)
    if D is not None:
        out = out + u * D.astype(jnp.float32)[None, :, None, :]
    out = out.astype(in_dtype)
    if return_last_state:
        return out, h[:, :, -1]
    return out
