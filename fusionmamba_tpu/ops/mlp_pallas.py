"""Fused 2-layer GELU MLP Pallas kernel (fwd + bwd).

TPU-native fusion of the reference's `Mlp` (`models/cross.py:770-788`,
fc1 C->4C, exact GELU, fc2 4C->C). The profile at b24 bf16 (r5,
bench_artifacts/r5/) put the unfused MLP at 37.6 ms/step -- the single
largest non-scan slice -- dominated by HBM round-trips of the 4C-wide
hidden activations: XLA's fc1 forward writes h (4C) to HBM, the fc2
forward reads it, and the backward reads it twice more (fc2 wgrad, fc1
dgrad through GELU').

Here the hidden NEVER exists in HBM:
  * forward: per row-tile, h = gelu(x @ W1 + b1) stays in VMEM and feeds
    the fc2 dot immediately -- HBM traffic is x in + y out (~2C/row vs
    ~10C/row unfused);
  * backward: h is RECOMPUTED in-kernel from x (one extra MXU dot -- the
    classic remat trade, but scoped to one kernel so the recompute
    overlaps the cotangent dots), then dx / dW1 / dW2 / db1 / db2 all come
    out of one pass over (x, dy). Weight grads accumulate fp32 into
    resident output blocks across the sequential row-tile grid (TPUs have
    no atomics; same pattern as the scan kernel's dA).

All dots run bf16 x bf16 -> fp32 accumulate (the operating point's dtype;
identical rounding class to the XLA path it replaces). GELU is the exact
erf form, computed in fp32 -- strictly tighter than the unfused bf16
elementwise GELU.

The public entry takes flax-Dense-shaped params (kernel (in, out), bias
(out,)) so `nn.Mlp` can adopt it without any checkpoint change.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step, chosen so the fp32 hidden tile (R, H) stays ~2 MB:
# large C (deep stages) -> small R; shallow wide stages -> big R amortizes
# per-step overhead over more rows
_ROW_BUDGET = int(os.environ.get("FM_MLP_ROW_BUDGET", 512 * 1024))


def _pick_rows(M: int, H: int) -> int:
    r = max(_ROW_BUDGET // max(H, 1), 8)
    r = min(r, M, 2048)
    # largest multiple of 8 dividing into the padded M nicely; the caller
    # pads M up to a multiple of the returned R
    return max(r - r % 8, 8)


# erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7): Mosaic lowers
# neither lax.erf nor lax.erfc (jax.nn.gelu(approximate=False) uses erfc),
# and 1.5e-7 absolute on erf is ~50x below the bf16 I/O rounding and below
# the fp32-visible noise of the surrounding DEFAULT-precision dots.
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_ERF_P = 0.3275911


def _erf_fp32(x):
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + _ERF_P * ax)
    a1, a2, a3, a4, a5 = _ERF_A
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _gelu_fp32(x):
    x = x.astype(jnp.float32)
    return 0.5 * x * (1.0 + _erf_fp32(x * _SQRT_HALF))


def _gelu_and_dgelu_fp32(h):
    """(gelu(h), gelu'(h)) sharing ONE exp and ONE erf polynomial: the
    A-S erf term needs exp(-x^2) with x = h/sqrt(2), which IS the
    exp(-h^2/2) the gaussian pdf phi(h) needs -- evaluating them together
    almost halves the backward's transcendental slot count."""
    h = h.astype(jnp.float32)
    x = h * _SQRT_HALF
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + _ERF_P * ax)
    a1, a2, a3, a4, a5 = _ERF_A
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    e = jnp.exp(-ax * ax)                     # = exp(-h^2/2)
    erf = s * (1.0 - poly * e)
    Phi = 0.5 * (1.0 + erf)
    phi = e * _INV_SQRT_2PI
    return h * Phi, Phi + h * phi             # gelu, d gelu/dh


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    x = x_ref[:]
    h = _dot(x, w1_ref[:], ((1,), (0,))) + b1_ref[:]      # (R, H) fp32
    a = _gelu_fp32(h).astype(x.dtype)
    y = _dot(a, w2_ref[:], ((1,), (0,))) + b2_ref[:]      # (R, C) fp32
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:]
    dy = dy_ref[:]
    h = _dot(x, w1_ref[:], ((1,), (0,))) + b1_ref[:]      # (R, H) fp32
    a_f32, dg = _gelu_and_dgelu_fp32(h)
    a = a_f32.astype(x.dtype)
    # dL/da = dy @ W2^T -- contract the C axis of both (no transpose
    # materialization: dot_general contracts dim 1 of dy with dim 1 of W2)
    da = _dot(dy, w2_ref[:], ((1,), (1,)))                # (R, H) fp32
    g = (da * dg).astype(x.dtype)                         # dL/dh
    dx = _dot(g, w1_ref[:], ((1,), (1,)))                 # (R, C) fp32
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # weight/bias grads: fp32 accumulation across the row-tile grid
    dw1_ref[:] += _dot(x, g, ((0,), (0,)))                # (C, H)
    dw2_ref[:] += _dot(a, dy, ((0,), (0,)))               # (H, C)
    db1_ref[:] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    db2_ref[:] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)


def _pad_rows(x, R):
    M = x.shape[0]
    pad = (-M) % R
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, M


_VMEM = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)


def _fwd_pallas(x2d, w1, b1, w2, b2, interpret):
    M, C = x2d.shape
    H = w1.shape[1]
    R = _pick_rows(M, H)
    xp, M0 = _pad_rows(x2d, R)
    grid = (xp.shape[0] // R,)
    y = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            _VMEM((R, C), lambda i: (i, 0)),
            _VMEM((C, H), lambda i: (0, 0)),
            _VMEM((1, H), lambda i: (0, 0)),
            _VMEM((H, C), lambda i: (0, 0)),
            _VMEM((1, C), lambda i: (0, 0)),
        ],
        out_specs=_VMEM((R, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], C), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w1, b1[None], w2, b2[None])
    return y[:M0]


def _bwd_pallas(x2d, dy2d, w1, b1, w2, interpret):
    M, C = x2d.shape
    H = w1.shape[1]
    R = _pick_rows(M, H)
    xp, M0 = _pad_rows(x2d, R)
    dyp, _ = _pad_rows(dy2d, R)
    grid = (xp.shape[0] // R,)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            _VMEM((R, C), lambda i: (i, 0)),
            _VMEM((R, C), lambda i: (i, 0)),
            _VMEM((C, H), lambda i: (0, 0)),
            _VMEM((1, H), lambda i: (0, 0)),
            _VMEM((H, C), lambda i: (0, 0)),
        ],
        out_specs=(
            _VMEM((R, C), lambda i: (i, 0)),
            _VMEM((C, H), lambda i: (0, 0)),
            _VMEM((1, H), lambda i: (0, 0)),
            _VMEM((H, C), lambda i: (0, 0)),
            _VMEM((1, C), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((xp.shape[0], C), x2d.dtype),
            jax.ShapeDtypeStruct((C, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dyp, w1, b1[None], w2)
    return dx[:M0], dw1, db1[0], dw2, db2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _mlp_core(x2d, w1, b1, w2, b2, interpret):
    return _fwd_pallas(x2d, w1, b1, w2, b2, interpret)


def _mlp_core_fwd(x2d, w1, b1, w2, b2, interpret):
    y = _fwd_pallas(x2d, w1, b1, w2, b2, interpret)
    return y, (x2d, w1, b1, w2)


def _mlp_core_bwd(interpret, res, dy):
    x2d, w1, b1, w2 = res
    dx, dw1, db1, dw2, db2 = _bwd_pallas(x2d, dy, w1, b1, w2, interpret)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(w2.dtype))


_mlp_core.defvjp(_mlp_core_fwd, _mlp_core_bwd)


def fused_mlp(x, w1, b1, w2, b2, interpret: bool = False):
    """y = gelu_exact(x @ w1 + b1) @ w2 + b2 with the hidden kept in VMEM.

    x: (..., C); w1: (C, H); b1: (H,); w2: (H, C_out); b2: (C_out,)
    (flax nn.Dense param shapes). Differentiable in all five tensors.
    """
    lead = x.shape[:-1]
    C = x.shape[-1]
    x2d = x.reshape(-1, C)
    y = _mlp_core(x2d, w1, b1, w2, b2, interpret)
    return y.reshape(*lead, w2.shape[1])


__all__ = ["fused_mlp"]
