"""Depthwise 3x3 SAME conv as a Pallas TPU kernel (forward + custom VJP).

XLA lowers NHWC depthwise convolutions on TPU to a "convolution fusion" that
runs ~100x off VPU peak (measured 3.4 ms for a (6,64,64,192) activation --
the single hottest op in the fusion model's forward). The operation is just
nine shifted multiply-adds, which the VPU does at full width; this kernel
implements exactly that, with zero-fill shifts for SAME padding.

Used by SS2D/SS2DCross for their depthwise conv (`models/cross.py:492-500`,
shared cross-modal conv `:1212-1213`). Weight layout (3, 3, C) (= HWIO
(3, 3, 1, C) squeezed), optional bias (C,).

Backward: dx is the correlation with the flipped kernel (the same nine
shifted multiply-adds), dw[di,dj] = sum(dy * shift(x)), db = sum(dy);
dw/db are accumulated as per-batch-cell partials and reduced outside.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (H*W*C_blk) element budget per buffer (~6 live f32 buffers, 16MB VMEM)
_ELEM_BUDGET = 512 * 1024
_MAX_SPATIAL_ELEMS = 4 * 1024 * 1024  # beyond this fall back to XLA conv


def _largest_divisor_leq(n: int, cap: int, prefer_multiple: int = 128) -> int:
    best = 1
    for cand in range(min(n, cap), 0, -1):
        if n % cand == 0:
            if cand % prefer_multiple == 0:
                return cand
            if best == 1:
                best = cand
    return best


def _shift2d(x: jax.Array, di: int, dj: int) -> jax.Array:
    """shift so result[h, w] = x[h + di, w + dj], zero-filled (axes 1, 2
    of a (T, H, W, C) array)."""
    T, H, W, C = x.shape
    if di == 1:
        x = jnp.concatenate(
            [x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    elif di == -1:
        x = jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
    if dj == 1:
        x = jnp.concatenate(
            [x[:, :, 1:], jnp.zeros_like(x[:, :, :1])], axis=2)
    elif dj == -1:
        x = jnp.concatenate(
            [jnp.zeros_like(x[:, :, :1]), x[:, :, :-1]], axis=2)
    return x


def _conv9(x, w):
    """The nine shifted multiply-adds: x (T, H, W, C_BLK), w (1, 9, 1, C)."""
    acc = jnp.zeros_like(x)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            tap = w[:, (di + 1) * 3 + (dj + 1)]     # (1, 1, C_BLK)
            acc = acc + _shift2d(x, di, dj) * tap[:, None]
    return acc


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, *, has_bias: bool, act: str):
    # I/O may be bf16 (HBM-traffic halved); accumulate fp32 on the VPU
    x = x_ref[:].astype(jnp.float32)        # (T, H, W, C_BLK)
    acc = _conv9(x, w_ref[:])
    if has_bias:
        acc = acc + b_ref[:]
    if act == "silu":
        # epilogue activation (`models/cross.py:731,1214-1215` conv+SiLU):
        # written pre-activated, so no standalone XLA silu pass and no raw
        # conv output residual in HBM (the backward recomputes it)
        acc = jax.nn.silu(acc)
    out_ref[:] = acc.astype(out_ref.dtype)


def _bwd_kernel(x_ref, w_ref, b_ref, dy_ref, dx_ref, dw_ref, db_ref,
                *, has_bias: bool, act: str):
    """Merged backward: dx + dw + db in ONE pass over (x, w, dy) -- the
    previous two-kernel split read dy twice and launched twice. With
    act="silu" the raw conv output is recomputed here (9 fma passes)
    instead of living in HBM as a residual, and the silu chain rule is
    applied before the gradient taps.

    Grid is (C-blocks, B-tiles) with B innermost so the dw/db accumulator
    blocks are revisited consecutively."""
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[:].astype(jnp.float32)
    w = w_ref[:]
    dy = dy_ref[:].astype(jnp.float32)
    if act == "silu":
        raw = _conv9(x, w)
        if has_bias:
            raw = raw + b_ref[:]
        dy = dy * _dsilu(raw)
    dx = jnp.zeros_like(dy)
    dws = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            tap = w[:, (di + 1) * 3 + (dj + 1)]
            # y[h] += x[h+di]*w  =>  dx[h+di] += dy[h]*w: shift dy by -di,-dj
            dx = dx + _shift2d(dy, -di, -dj) * tap[:, None]
            dws.append(jnp.sum(_shift2d(x, di, dj) * dy, axis=(0, 1, 2),
                               keepdims=True)[:, :, 0, :])
    dx_ref[:] = dx.astype(dx_ref.dtype)
    dw_ref[:] += jnp.concatenate(dws, axis=1)   # (1, 9, C_BLK)
    db_ref[:] += jnp.sum(dy, axis=(0, 1, 2), keepdims=True)[:, :, 0, :]


def _pick(B: int, H: int, W: int, C: int):
    # lane constraint: c_blk must be a multiple of 128 or the whole C
    c_blk = C
    for cand in range(min(C, 256), 127, -1):
        if C % cand == 0 and cand % 128 == 0:
            c_blk = cand
            break
    t = 1
    for cand in range(B, 0, -1):
        if B % cand == 0 and cand * H * W * c_blk <= _ELEM_BUDGET:
            t = cand
            break
    return t, c_blk


def _fwd_pallas(x, w9, bias, act, interpret):
    B, H, W, C = x.shape
    T, c_blk = _pick(B, H, W, C)
    grid = (C // c_blk, B // T)
    has_bias = bias is not None
    zeros = jnp.zeros((1, 1, 1, C), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, has_bias=has_bias, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, H, W, c_blk), lambda c, b: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 1, c_blk), lambda c, b: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c_blk), lambda c, b: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, H, W, c_blk), lambda c, b: (b, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w9, bias if has_bias else zeros)
    return out


def _bwd_pallas(x, w9, bias, dy, act, interpret):
    B, H, W, C = x.shape
    T, c_blk = _pick(B, H, W, C)
    grid = (C // c_blk, B // T)
    has_bias = bias is not None
    blk = pl.BlockSpec((T, H, W, c_blk), lambda c, b: (b, 0, 0, c),
                       memory_space=pltpu.VMEM)
    zeros = jnp.zeros((1, 1, 1, C), jnp.float32)
    dx, dw_p, db_p = pl.pallas_call(
        functools.partial(_bwd_kernel, has_bias=has_bias, act=act),
        grid=grid,
        in_specs=[
            blk,
            pl.BlockSpec((1, 9, 1, c_blk), lambda c, b: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c_blk), lambda c, b: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            blk,
        ],
        out_specs=(
            blk,
            pl.BlockSpec((1, 9, c_blk), lambda c, b: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_blk), lambda c, b: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), dy.dtype),
            jax.ShapeDtypeStruct((1, 9, C), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w9, bias if has_bias else zeros, dy)
    return dx, dw_p[0], db_p[0, 0]


def _xla_dwconv(x, w, bias, act="none"):
    k = w[:, :, None, :]  # (3, 3, 1, C)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    if act == "silu":
        out = jax.nn.silu(out)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _dw_core(x, w9, bias, act, interpret):
    return _fwd_pallas(x, w9, bias, act, interpret)


def _dw_fwd(x, w9, bias, act, interpret):
    return (_fwd_pallas(x, w9, bias, act, interpret),
            (x, w9, bias))


def _dw_bwd(act, interpret, res, dy):
    x, w9, bias = res
    dx, dw9, db = _bwd_pallas(x, w9, bias, dy, act, interpret)
    C = dw9.shape[-1]
    return (dx, dw9.reshape(1, 9, 1, C),
            db.reshape(1, 1, 1, C) if bias is not None else None)


_dw_core.defvjp(_dw_fwd, _dw_bwd)


def depthwise_conv3x3(x: jax.Array, w: jax.Array,
                      bias: jax.Array | None = None,
                      impl: str = "auto",
                      interpret: bool = False,
                      act: str = "none") -> jax.Array:
    """x (B, H, W, C); w (3, 3, C); bias (C,) or None. SAME padding.

    act="silu" fuses the conv's SiLU epilogue into the kernel
    (`models/cross.py:731,1214-1215`): the activation costs no extra HBM
    pass and the raw conv output never becomes a backward residual (the
    merged backward kernel recomputes it from x in VMEM)."""
    if act not in ("none", "silu"):
        raise ValueError(f"unknown act {act!r}")
    B, H, W, C = x.shape

    def _pallas_path():
        in_dtype = x.dtype
        w9 = w.reshape(1, 9, 1, C).astype(jnp.float32)
        # x stays in its own dtype (bf16 I/O supported; kernels accumulate
        # fp32 internally), halving the kernel's HBM traffic under mixed
        # precision and avoiding the convert passes around the call
        out = _dw_core(
            x, w9,
            None if bias is None else bias.reshape(1, 1, 1, C).astype(
                jnp.float32),
            act, interpret)
        return out.astype(in_dtype)

    if impl == "auto":
        if interpret:
            return _pallas_path()
        if H * W * C > _MAX_SPATIAL_ELEMS:
            return _xla_dwconv(x, w, bias, act)
        # decide per lowering platform: under the axon tunnel the default
        # backend is always 'tpu' even for programs lowered onto a virtual
        # CPU mesh (multichip dryrun), where Pallas cannot lower
        return jax.lax.platform_dependent(
            tpu=_pallas_path,
            default=lambda: _xla_dwconv(x, w, bias, act))
    if impl == "xla":
        return _xla_dwconv(x, w, bias, act)
    return _pallas_path()
