"""Sequential selective-scan reference (the correctness oracle).

Implements the SSM recurrence
    h_l = exp(dt_l * A) * h_{l-1} + dt_l * B_l * u_l
    y_l = <C_l, h_l> + D * u_l
with optional delta bias and softplus, matching the semantics of the
reference CUDA extension's golden model
(`mamba_ssm/ops/selective_scan_interface.py:92-158` in the reference repo),
but in a TPU-native channels-last layout:

    u, delta : (B, K, L, D)   -- time on the sublane axis, channels on lanes
    A        : (K, D, N)
    Bmat, Cmat : (B, K, L, N) -- one B/C group per direction k
    D, delta_bias : (K, D)

All math is float32 (the reference forces fp32 into its kernel,
`models/cross.py:239-245`). This file is pure `jax.lax.scan` — slow but
exact; it is the oracle every faster implementation is tested against.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def selective_scan_ref(
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
    """Sequential scan over L. Shapes documented in the module docstring."""
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

    batch, K, L, dim = u.shape
    N = A.shape[-1]

    # scan over time: move L to the leading axis
    u_t = jnp.moveaxis(u, 2, 0)          # (L, B, K, D)
    delta_t = jnp.moveaxis(delta, 2, 0)  # (L, B, K, D)
    B_t = jnp.moveaxis(Bmat, 2, 0)       # (L, B, K, N)
    C_t = jnp.moveaxis(Cmat, 2, 0)       # (L, B, K, N)

    h0 = jnp.zeros((batch, K, dim, N), jnp.float32)

    def step(h, inputs):
        u_l, dt_l, b_l, c_l = inputs
        # a = exp(dt * A): (B, K, D, N)
        a = jnp.exp(dt_l[..., None] * A[None])
        # b = dt * u * B: (B, K, D, N)
        b = (dt_l * u_l)[..., None] * b_l[:, :, None, :]
        h = a * h + b
        y = jnp.einsum("bkdn,bkn->bkd", h, c_l)
        return h, y

    h_last, ys = jax.lax.scan(step, h0, (u_t, delta_t, B_t, C_t))
    out = jnp.moveaxis(ys, 0, 2)  # (B, K, L, D)
    if D is not None:
        out = out + u * D.astype(jnp.float32)[None, :, None, :]
    out = out.astype(in_dtype)
    if return_last_state:
        return out, h_last
    return out
