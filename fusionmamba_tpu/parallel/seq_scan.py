"""Sequence-parallel selective scan over a mesh axis (shard_map).

The reference has no distributed execution at all; its CUDA kernel chunks
sequences at 2048 with carry states in shared memory
(`selective_scan/selective_scan.cpp:447`, `selective_scan_fwd_kernel.cuh:236-254`).
This module lifts that chunk-and-carry seam one level up, onto the device
mesh (SURVEY.md §5.7): each chip scans its own L-shard locally (any
single-chip impl), then the per-chip carries -- a (B, K, D, N) last-state
and the chip's total decay product -- are exchanged over ICI and combined
with the same (a, b) monoid, and each chip applies an exact local
correction:

    x_l = x_loc_l + exp(A * cumsum(delta)_l) * h_in
    y_l = y_loc_l + C_l . (exp(A * cumsum(delta)_l) * h_in)

The correction underflows gracefully for the model's always-negative A
(decay-only); no rescale clipping is involved, so this is exact for the
same input class as the local scan.

Layouts match `ops/selective_scan.py`: u/delta (B, K, L, D), A (K, D, N),
Bmat/Cmat (B, K, L, N), D/delta_bias (K, D). L must be divisible by the
mesh axis size.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.selective_scan import selective_scan


def _effective_delta(delta, delta_bias, delta_softplus):
    d = delta.astype(jnp.float32)
    if delta_bias is not None:
        d = d + delta_bias.astype(jnp.float32)[None, :, None, :]
    if delta_softplus:
        d = jax.nn.softplus(d)
    return d


def selective_scan_seq_parallel(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    Bmat: jax.Array,
    Cmat: jax.Array,
    D: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = False,
    *,
    mesh: Mesh | None = None,
    axis: str = "model",
    batch_axis: str | None = None,
    impl: str = "auto",
):
    """Run the selective scan with L sharded over `mesh[axis]`.

    Returns y (B, K, L, D) sharded the same way. Differentiable (the body
    is plain jax; shard_map transposes the collectives automatically).

    mesh=None resolves the ambient mesh (`jax.sharding.set_mesh`), which is
    how the model layer reaches this path: `scan_impl="sp"` on SS2D routes
    here through `ops.selective_scan` without threading a Mesh through the
    module tree. `batch_axis` additionally shards B (data parallelism) when
    it divides the batch; collectives still ride only `axis`.
    """
    if mesh is None:
        mesh = jax.sharding.get_mesh()
        if mesh.empty:
            raise ValueError(
                "impl='sp' needs a mesh: pass mesh=... or set the ambient "
                "mesh with jax.sharding.set_mesh(make_mesh(...))")
    if axis not in mesh.shape:
        raise ValueError(f"mesh {tuple(mesh.shape)} has no axis {axis!r}")
    n_shards = mesh.shape[axis]
    L = u.shape[2]
    assert L % n_shards == 0, (L, n_shards)

    b_ax = (batch_axis if batch_axis and batch_axis in mesh.shape
            and u.shape[0] % mesh.shape[batch_axis] == 0 else None)
    lspec = P(b_ax, None, axis, None)
    rep = P()

    def body(u_s, dt_s, A_r, B_s, C_s, D_r, bias_r):
        D_in = None if D is None else D_r
        bias_in = None if delta_bias is None else bias_r
        # local zero-init scan + the shard's outgoing state
        y_loc, last_loc = selective_scan(
            u_s, dt_s, A_r, B_s, C_s, D_in, bias_in,
            delta_softplus=delta_softplus, return_last_state=True,
            impl=impl)                           # (B,K,l,D), (B,K,D,N)

        # shard decay product and per-position decay prefix
        deff = _effective_delta(dt_s, bias_in, delta_softplus)
        tcum = jnp.cumsum(deff, axis=2)          # (B, K, l, D)
        a_prod = jnp.exp(                        # (B, K, D, N)
            A_r[None] * tcum[:, :, -1, :, None])

        # exchange carries over ICI: every chip sees all shard carries
        # (tiny: 2 * B*K*D*N floats), then combines the monoid locally
        idx = jax.lax.axis_index(axis)
        all_last = jax.lax.all_gather(last_loc, axis)   # (S, B,K,D,N)
        all_prod = jax.lax.all_gather(a_prod, axis)
        S = all_last.shape[0]

        def step(h, t):
            h_next = all_prod[t] * h + all_last[t]
            return h_next, h

        # h_in for shard s = state after shards 0..s-1 (exclusive scan)
        _, h_hist = jax.lax.scan(step, jnp.zeros_like(last_loc),
                                 jnp.arange(S))
        h_in = h_hist[idx]                       # (B, K, D, N)

        # exact local correction: x_l += exp(A * tcum_l) * h_in
        pchain = jnp.exp(A_r[None, :, None] * tcum[..., None])  # (B,K,l,D,N)
        corr = jnp.einsum("bkln,bkldn->bkld",
                          C_s.astype(jnp.float32), pchain * h_in[:, :, None])
        return (y_loc.astype(jnp.float32) + corr).astype(u_s.dtype)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(lspec, lspec, rep, lspec, lspec, rep, rep),
        out_specs=lspec,
        # the body creates fresh zero carries (scan h0) that are unvarying
        # over the axis; skip the varying-manual-axes bookkeeping
        check_vma=False,
    )
    zeros = jnp.zeros(A.shape[:2], jnp.float32)   # (K, D) placeholder
    return fn(u, delta, A, Bmat, Cmat,
              D if D is not None else zeros,
              delta_bias if delta_bias is not None else zeros)


def shard_l(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """Sharding for (B, K, L, D)/(B, K, L, N) operands with L on `axis`."""
    return NamedSharding(mesh, P(None, None, axis, None))
