"""Fused Pallas TPU kernel for the selective scan (forward + backward).

TPU-native re-design of the reference CUDA extension
(`selective_scan/selective_scan_fwd_kernel.cuh`, `selective_scan_bwd_kernel.cuh`):

* the CUDA kernel assigns one thread-block per (batch, dim) row and runs a CUB
  `BlockScan` over time with a chunk-and-carry structure (chunk 2048,
  `selective_scan.cpp:447`). Here the grid is (B, K, D-blocks, L-chunks) with
  the L axis innermost, the inter-chunk carry lives in a VMEM scratch that
  persists across sequential grid steps, and the intra-chunk scan is a
  Hillis-Steele doubling scan vectorized over (L on sublanes, D on lanes).
* the CUDA backward uses a custom `BlockReverseScan` plus atomicAdds for
  dA/dD/ddelta_bias (`selective_scan_bwd_kernel.cuh:26-72`). TPUs have no
  atomics, so the backward kernel re-associates those reductions into
  per-(batch, k) partials accumulated in the resident output block while the
  L grid axis iterates, then XLA sums the small partials outside the kernel.
* forward saves only the per-chunk incoming states (the `x` tensor of the
  CUDA ABI, `selective_scan.cpp:307-313`); the backward recomputes intra-chunk
  states from them, exactly the CUDA recompute strategy.

Layouts (channels-last, time on sublanes, channels on lanes):
    u, delta : (B, K, L, D)
    A        : (K, D, N)   (transposed to (K, N, D) before entering the kernel)
    Bmat/Cmat: (B, K, L, N)
    D, delta_bias : (K, D)
All math float32.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class _BlockCfg(NamedTuple):
    d_blk: int
    l_chunk: int
    n_dblk: int
    n_lchunk: int


def _largest_divisor_leq(n: int, cap: int, prefer_multiple: int = 128) -> int:
    best = 1
    for cand in range(min(n, cap), 0, -1):
        if n % cand == 0:
            if cand % prefer_multiple == 0:
                return cand
            if best == 1:
                best = cand
    return best


def _pick_blocks(L: int, D: int, d_cap: int = 256,
                 l_cap: int = 256) -> _BlockCfg:
    """Forward and backward MUST agree on l_chunk (the backward consumes the
    forward's per-chunk carries), and the backward keeps ~3x more live
    (L_CHUNK, D_BLK) buffers (recomputed states, adjoint scan, gradient
    accumulators) -- l_cap 256 keeps its scoped-VMEM stack under the 16 MB
    limit at D_BLK 256."""
    d_blk = _largest_divisor_leq(D, d_cap)
    l_chunk = _largest_divisor_leq(L, l_cap, prefer_multiple=8)
    return _BlockCfg(d_blk, l_chunk, D // d_blk, L // l_chunk)


def _shift_down(x: jax.Array, s: int, fill: float) -> jax.Array:
    """Shift rows (time axis 0) down by s; top s rows become `fill`."""
    L = x.shape[0]
    if s >= L:
        return jnp.full_like(x, fill)
    pad = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[: L - s]], axis=0)


def _shift_up(x: jax.Array, s: int, fill: float) -> jax.Array:
    """Shift rows (time axis 0) up by s; bottom s rows become `fill`."""
    L = x.shape[0]
    if s >= L:
        return jnp.full_like(x, fill)
    pad = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[s:], pad], axis=0)


def _doubling_scan(a: jax.Array, b: jax.Array):
    """Inclusive scan of x_l = a_l x_{l-1} + b_l with x_{-1}=0 along axis 0.

    Returns (a_cum, x): a_cum_l = prod_{i<=l} a_i (used to inject the incoming
    carry), x the zero-init scan. Log-depth Hillis-Steele over the SSM monoid
    (a1,b1)*(a2,b2) = (a1*a2, a2*b1+b2)
    (reference: `selective_scan/selective_scan_common.h:108-130`).
    """
    L = a.shape[0]
    s = 1
    while s < L:
        a_sh = _shift_down(a, s, 1.0)
        b_sh = _shift_down(b, s, 0.0)
        b = b + a * b_sh
        a = a * a_sh
        s *= 2
    return a, b


def _doubling_scan_rev(a_next: jax.Array, b: jax.Array):
    """Reverse inclusive scan r_l = b_l + a_next_l * r_{l+1}, r_L = 0, along
    axis 0 -- the adjoint recurrence. Shift-UP doubling (Mosaic cannot lower
    lax.rev, so no flips): the composed operator over (l, l+s] satisfies
    X <- X + A * up(X), A <- A * up(A).

    Returns (a_cum_rev, r): a_cum_rev_l = prod_{i=l..L-1} a_next_i (the
    coefficient for injecting the right-side carry), r the zero-init scan.
    """
    L = a_next.shape[0]
    s = 1
    while s < L:
        a_sh = _shift_up(a_next, s, 1.0)
        b_sh = _shift_up(b, s, 0.0)
        b = b + a_next * b_sh
        a_next = a_next * a_sh
        s *= 2
    return a_next, b


# ----------------------------------------------------------------------------
# Forward kernel
# ----------------------------------------------------------------------------

def _fwd_kernel(
    u_ref, dt_ref, At_ref, B_ref, C_ref, D_ref, bias_ref,
    out_ref, hsave_ref,
    h_carry,
    *, N: int, delta_softplus: bool, has_D: bool, has_bias: bool,
):
    l_idx = pl.program_id(3)

    @pl.when(l_idx == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    delta = dt_ref[0, 0]                       # (L_CHUNK, D_BLK)
    if has_bias:
        delta = delta + bias_ref[0]            # (1, D_BLK) broadcast
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    u = u_ref[0, 0]
    du = delta * u

    # save the incoming carry for the backward recompute
    hsave_ref[0, 0, 0] = h_carry[:]

    if has_D:
        y = u * D_ref[0]
    else:
        y = jnp.zeros_like(u)

    At = At_ref[0]                             # (N, D_BLK)
    Bc = B_ref[0, 0]                           # (L_CHUNK, N)
    Cc = C_ref[0, 0]                           # (L_CHUNK, N)

    # N is unrolled: Mosaic does not lower dynamic_slice on values, and the
    # per-n column slices of B/C are static lane slices when unrolled
    new_carry = []
    for n in range(N):
        a = jnp.exp(delta * At[n:n + 1, :])    # (L_CHUNK, D_BLK)
        b = du * Bc[:, n:n + 1]
        a_cum, x = _doubling_scan(a, b)
        x = x + a_cum * h_carry[n:n + 1, :]
        y = y + Cc[:, n:n + 1] * x
        new_carry.append(x[-1:, :])
    h_carry[:] = jnp.concatenate(new_carry, axis=0)
    out_ref[0, 0] = y


def _fwd_pallas(u, delta, At, Bmat, Cmat, Dp, bias, delta_softplus, cfg,
                interpret):
    batch, K, L, dim = u.shape
    N = At.shape[1]
    has_D = Dp is not None
    has_bias = bias is not None

    grid = (batch, K, cfg.n_dblk, cfg.n_lchunk)

    def _bkld(b, k, d, l):
        return (b, k, l, d)

    in_specs = [
        pl.BlockSpec((1, 1, cfg.l_chunk, cfg.d_blk), _bkld, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cfg.l_chunk, cfg.d_blk), _bkld, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, cfg.d_blk), lambda b, k, d, l: (k, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cfg.l_chunk, N), lambda b, k, d, l: (b, k, l, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cfg.l_chunk, N), lambda b, k, d, l: (b, k, l, 0),
                     memory_space=pltpu.VMEM),
        # D / bias carry a singleton row axis so the block's trailing two
        # dims satisfy the Mosaic (8, 128)-or-full-dim constraint
        pl.BlockSpec((1, 1, cfg.d_blk), lambda b, k, d, l: (k, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cfg.d_blk), lambda b, k, d, l: (k, 0, d),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, 1, cfg.l_chunk, cfg.d_blk), _bkld, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, N, cfg.d_blk),
                     lambda b, k, d, l: (b, k, l, 0, d), memory_space=pltpu.VMEM),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((batch, K, L, dim), jnp.float32),
        jax.ShapeDtypeStruct((batch, K, cfg.n_lchunk, N, dim), jnp.float32),
    )

    Dp_in = (Dp if has_D else jnp.zeros((K, dim), jnp.float32))[:, None, :]
    bias_in = (bias if has_bias
               else jnp.zeros((K, dim), jnp.float32))[:, None, :]

    kernel = functools.partial(
        _fwd_kernel, N=N, delta_softplus=delta_softplus,
        has_D=has_D, has_bias=has_bias,
    )
    out, hsave = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((N, cfg.d_blk), jnp.float32)],
        interpret=interpret,
    )(u, delta, At, Bmat, Cmat, Dp_in, bias_in)
    return out, hsave


# ----------------------------------------------------------------------------
# Backward kernel
# ----------------------------------------------------------------------------

def _bwd_kernel(
    u_ref, dt_ref, At_ref, B_ref, C_ref, D_ref, bias_ref, hsave_ref, dy_ref,
    du_ref, ddt_ref, dA_ref, dB_ref, dC_ref, dD_ref, dbias_ref,
    g_carry,
    *, N: int, delta_softplus: bool, has_D: bool, has_bias: bool,
):
    l_idx = pl.program_id(3)
    is_first_step = l_idx == 0  # maps to the LAST chunk (grid runs L reversed)

    @pl.when(is_first_step)
    def _():
        g_carry[:] = jnp.zeros_like(g_carry)
        dA_ref[0, 0] = jnp.zeros_like(dA_ref[0, 0])
        dD_ref[0, 0] = jnp.zeros_like(dD_ref[0, 0])
        dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    delta_raw = dt_ref[0, 0]
    if has_bias:
        delta_raw = delta_raw + bias_ref[0]
    if delta_softplus:
        delta = jax.nn.softplus(delta_raw)
    else:
        delta = delta_raw
    u = u_ref[0, 0]
    dy = dy_ref[0, 0]
    du_t = delta * u

    At = At_ref[0]                             # (N, D_BLK)
    Bc = B_ref[0, 0]                           # (L_CHUNK, N)
    Cc = C_ref[0, 0]                           # (L_CHUNK, N)
    h0s = hsave_ref[0, 0, 0]                   # (N, D_BLK)

    if has_D:
        du_acc = dy * D_ref[0]
        dD_ref[0, 0] += jnp.sum(dy * u, axis=0, keepdims=True)
    else:
        du_acc = jnp.zeros_like(u)
    ddelta = jnp.zeros_like(delta)
    dA_rows, dB_cols, dC_cols, new_g_carry = [], [], [], []

    # N unrolled (see forward kernel note)
    for n in range(N):
        An = At[n:n + 1, :]                    # (1, D_BLK)
        Bn = Bc[:, n:n + 1]                    # (L_CHUNK, 1)
        Cn = Cc[:, n:n + 1]
        a = jnp.exp(delta * An)                # (L_CHUNK, D_BLK)
        b = du_t * Bn
        # recompute forward states within the chunk from the saved carry
        h0 = h0s[n:n + 1, :]                   # (1, D_BLK)
        a_cum, x = _doubling_scan(a, b)
        x = x + a_cum * h0                     # h_l for l in chunk
        x_prev = jnp.concatenate([h0, x[:-1]], axis=0)  # h_{l-1}

        # adjoint reverse scan: g_l = C_l*dy_l + a_{l+1} g_{l+1}; the carry
        # from the chunk to the right already includes its leading a factor.
        src = Cn * dy
        a_next = jnp.concatenate([a[1:], jnp.ones_like(a[:1])], axis=0)
        acr, g = _doubling_scan_rev(a_next, src)
        g = g + acr * g_carry[n:n + 1, :]      # acr_l = prod_{i>l} a_i

        da = g * x_prev                        # dL/da_l
        ddelta = ddelta + da * An * a + g * u * Bn
        du_acc = du_acc + g * delta * Bn
        dA_rows.append(jnp.sum(da * delta * a, axis=0, keepdims=True))
        dB_cols.append(jnp.sum(g * du_t, axis=1, keepdims=True))
        dC_cols.append(jnp.sum(x * dy, axis=1, keepdims=True))
        new_g_carry.append(a[:1, :] * g[:1, :])

    g_carry[:] = jnp.concatenate(new_g_carry, axis=0)
    dA_ref[0, 0] += jnp.concatenate(dA_rows, axis=0)       # (N, D_BLK)
    dB_acc = jnp.concatenate(dB_cols, axis=1)              # (L_CHUNK, N)
    dC_acc = jnp.concatenate(dC_cols, axis=1)

    if delta_softplus:
        ddelta = ddelta * jax.nn.sigmoid(delta_raw)
    if has_bias:
        dbias_ref[0, 0] += jnp.sum(ddelta, axis=0, keepdims=True)
    du_ref[0, 0] = du_acc
    ddt_ref[0, 0] = ddelta
    dB_ref[0, 0, 0] = dB_acc                               # (L_CHUNK, N)
    dC_ref[0, 0, 0] = dC_acc


def _bwd_pallas(res, dy, *, delta_softplus, cfg, interpret):
    (u, delta, At, Bmat, Cmat, Dp, bias, hsave) = res
    batch, K, L, dim = u.shape
    N = At.shape[1]
    has_D = Dp is not None
    has_bias = bias is not None

    grid = (batch, K, cfg.n_dblk, cfg.n_lchunk)

    def _rl(l):
        return cfg.n_lchunk - 1 - l

    def _bkld(b, k, d, l):
        return (b, k, _rl(l), d)

    in_specs = [
        pl.BlockSpec((1, 1, cfg.l_chunk, cfg.d_blk), _bkld, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cfg.l_chunk, cfg.d_blk), _bkld, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, cfg.d_blk), lambda b, k, d, l: (k, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cfg.l_chunk, N), lambda b, k, d, l: (b, k, _rl(l), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cfg.l_chunk, N), lambda b, k, d, l: (b, k, _rl(l), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cfg.d_blk), lambda b, k, d, l: (k, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cfg.d_blk), lambda b, k, d, l: (k, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, N, cfg.d_blk),
                     lambda b, k, d, l: (b, k, _rl(l), 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cfg.l_chunk, cfg.d_blk), _bkld, memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, 1, cfg.l_chunk, cfg.d_blk), _bkld, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cfg.l_chunk, cfg.d_blk), _bkld, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, N, cfg.d_blk), lambda b, k, d, l: (b, k, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, cfg.l_chunk, N),
                     lambda b, k, d, l: (b, k, d, _rl(l), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, cfg.l_chunk, N),
                     lambda b, k, d, l: (b, k, d, _rl(l), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, cfg.d_blk), lambda b, k, d, l: (b, k, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, cfg.d_blk), lambda b, k, d, l: (b, k, 0, d),
                     memory_space=pltpu.VMEM),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((batch, K, L, dim), jnp.float32),
        jax.ShapeDtypeStruct((batch, K, L, dim), jnp.float32),
        jax.ShapeDtypeStruct((batch, K, N, dim), jnp.float32),
        jax.ShapeDtypeStruct((batch, K, cfg.n_dblk, L, N), jnp.float32),
        jax.ShapeDtypeStruct((batch, K, cfg.n_dblk, L, N), jnp.float32),
        jax.ShapeDtypeStruct((batch, K, 1, dim), jnp.float32),
        jax.ShapeDtypeStruct((batch, K, 1, dim), jnp.float32),
    )

    Dp_in = (Dp if has_D else jnp.zeros((K, dim), jnp.float32))[:, None, :]
    bias_in = (bias if has_bias
               else jnp.zeros((K, dim), jnp.float32))[:, None, :]

    kernel = functools.partial(
        _bwd_kernel, N=N, delta_softplus=delta_softplus,
        has_D=has_D, has_bias=has_bias,
    )
    du, ddt, dA_p, dB_p, dC_p, dD_p, dbias_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((N, cfg.d_blk), jnp.float32)],
        interpret=interpret,
    )(u, delta, At, Bmat, Cmat, Dp_in, bias_in, hsave, dy)

    dAt = jnp.sum(dA_p, axis=0)                      # (K, N, dim)
    dA = jnp.swapaxes(dAt, 1, 2)                     # (K, dim, N)
    dB = jnp.sum(dB_p, axis=2)                       # (B, K, L, N)
    dC = jnp.sum(dC_p, axis=2)
    dD = jnp.sum(dD_p, axis=0)[:, 0] if has_D else None       # (K, dim)
    dbias = jnp.sum(dbias_p, axis=0)[:, 0] if has_bias else None
    return du, ddt, dA, dB, dC, dD, dbias


# ----------------------------------------------------------------------------
# custom_vjp wrapper
# ----------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _scan_pallas_core(u, delta, A, Bmat, Cmat, Dp, bias,
                      delta_softplus, interpret):
    At = jnp.swapaxes(A, 1, 2)
    out, _ = _fwd_pallas(
        u, delta, At, Bmat, Cmat, Dp, bias, delta_softplus,
        _pick_blocks(u.shape[2], u.shape[3]), interpret,
    )
    return out


def _core_fwd(u, delta, A, Bmat, Cmat, Dp, bias, delta_softplus, interpret):
    cfg = _pick_blocks(u.shape[2], u.shape[3])
    At = jnp.swapaxes(A, 1, 2)
    out, hsave = _fwd_pallas(
        u, delta, At, Bmat, Cmat, Dp, bias, delta_softplus, cfg, interpret)
    return out, (u, delta, At, Bmat, Cmat, Dp, bias, hsave)


def _core_bwd(delta_softplus, interpret, res, dy):
    cfg = _pick_blocks(res[0].shape[2], res[0].shape[3])
    return _bwd_pallas(
        res, dy, delta_softplus=delta_softplus, cfg=cfg, interpret=interpret)


_scan_pallas_core.defvjp(_core_fwd, _core_bwd)


def selective_scan_pallas(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    Bmat: jax.Array,
    Cmat: jax.Array,
    D: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    interpret: bool = False,
):
    if return_last_state:
        raise NotImplementedError(
            "return_last_state is served by the ref/assoc implementations")
    in_dtype = u.dtype
    out = _scan_pallas_core(
        u.astype(jnp.float32), delta.astype(jnp.float32),
        A.astype(jnp.float32), Bmat.astype(jnp.float32),
        Cmat.astype(jnp.float32),
        None if D is None else D.astype(jnp.float32),
        None if delta_bias is None else delta_bias.astype(jnp.float32),
        delta_softplus, interpret,
    )
    return out.astype(in_dtype)
