"""Fused LayerNorm (+ optional gate multiply) as a Pallas TPU kernel.

TPU-native analog of the reference's fused Triton layernorm
(`mamba_ssm/ops/triton/layernorm.py:64-122,196-292`): the hot fusion-model
LayerNorms (block pre-norms, SS2D's `out_norm`, BiAttn's norm) sit on
(B, H, W, C) activations whose XLA lowering is a stats fusion plus a
normalize fusion -- two HBM reads of x and one write forward, and ~three
passes backward. This kernel keeps each row tile VMEM-resident and does
stats + normalize (+ the SS2D `y * z` gate, `models/cross.py:742`) in one
read/one write; the backward emits dx (+ dgate) in one pass and per-tile
dscale/dbias partials that XLA tree-reduces outside.

Numerics match `flax.linen.LayerNorm` (fp32 stats, fast-variance
E[x^2] - E[x]^2, default eps) so checkpoints and the golden parity tests
are unaffected; I/O may be bf16 (converted in VMEM, stats in fp32).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-tile element budget (~6 live (R_BLK, C) f32 buffers in the backward)
_ELEM_BUDGET = 512 * 1024


def _pick_rows(rows: int, C: int) -> int:
    cap = max(8, _ELEM_BUDGET // max(C, 1))
    best = 8
    for cand in range(min(rows, cap), 7, -1):
        if rows % cand == 0 and cand % 8 == 0:
            best = cand
            break
    return best if rows % best == 0 else rows


def _stats(x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    return mu, jax.lax.rsqrt(var + eps)


def _gate_value(g_raw, gate_act):
    """Activated gate value from the RAW gate input.

    "none"     -- caller pre-activated (legacy behavior).
    "silu"     -- SS2D's y * silu(z) gate (`models/cross.py:731,742`): the
                  silu runs here instead of as its own XLA pass over the
                  full (B, H, W, d_inner) activation.
    "silu_sum" -- SS2DCross's dual gate y*z1 + y*z2 with z1 = silu(raw),
                  z2 = silu(z1) (the reference's z2-reads-activated-z1
                  quirk, `models/cross.py:1207-1209,1225-1229`), folded as
                  y * (z1 + z2).
    """
    if gate_act == "silu":
        return jax.nn.silu(g_raw)
    if gate_act == "silu_sum":
        s1 = jax.nn.silu(g_raw)
        return s1 + jax.nn.silu(s1)
    return g_raw


def _gate_grad(g_raw, gate_act):
    """d(activated gate)/d(raw gate)."""
    def dsilu(x):
        s = jax.nn.sigmoid(x)
        return s * (1.0 + x * (1.0 - s))
    if gate_act == "silu":
        return dsilu(g_raw)
    if gate_act == "silu_sum":
        s1 = jax.nn.silu(g_raw)
        return (1.0 + dsilu(s1)) * dsilu(g_raw)
    return jnp.ones_like(g_raw)


def _ln_fwd_kernel(x_ref, s_ref, b_ref, g_ref, o_ref, *, eps, has_gate,
                   gate_act):
    x = x_ref[:].astype(jnp.float32)          # (R_BLK, C)
    mu, rs = _stats(x, eps)
    y = (x - mu) * rs * s_ref[:] + b_ref[:]
    if has_gate:
        y = y * _gate_value(g_ref[:].astype(jnp.float32), gate_act)
    o_ref[:] = y.astype(o_ref.dtype)


def _ln_bwd_kernel(x_ref, s_ref, b_ref, g_ref, dy_ref,
                   dx_ref, dg_ref, ds_ref, db_ref,
                   *, eps, has_gate, gate_act):
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    scale = s_ref[:]
    mu, rs = _stats(x, eps)
    xhat = (x - mu) * rs
    if has_gate:
        g_raw = g_ref[:].astype(jnp.float32)
        g = _gate_value(g_raw, gate_act)
        dg = dy * (xhat * scale + b_ref[:])
        if gate_act != "none":
            dg = dg * _gate_grad(g_raw, gate_act)
        dg_ref[:] = dg.astype(dg_ref.dtype)
        dy = dy * g
    else:
        dg_ref[:] = jnp.zeros_like(dg_ref)
    # partials are (G, 1, C) with block (1, 1, C): the last two block dims
    # must equal the array dims (Pallas TPU (8,128)-divisibility rule)
    ds_ref[0] = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[0] = jnp.sum(dy, axis=0, keepdims=True)
    w = dy * scale
    m1 = jnp.mean(w, axis=-1, keepdims=True)
    m2 = jnp.mean(w * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rs * (w - m1 - xhat * m2)).astype(dx_ref.dtype)


def _fwd_pallas(x2, scale, bias, gate2, eps, gate_act, interpret):
    rows, C = x2.shape
    r_blk = _pick_rows(rows, C)
    grid = (rows // r_blk,)
    has_gate = gate2 is not None
    row_spec = pl.BlockSpec((r_blk, C), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, C), lambda r: (0, 0),
                            memory_space=pltpu.VMEM)
    zeros = jnp.zeros((1, C), jnp.float32)
    return pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps, has_gate=has_gate,
                          gate_act=gate_act),
        grid=grid,
        in_specs=[row_spec, par_spec, par_spec,
                  row_spec if has_gate else par_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, C), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, scale.reshape(1, C).astype(jnp.float32),
      bias.reshape(1, C).astype(jnp.float32),
      gate2 if has_gate else zeros)


def _bwd_pallas(x2, scale, bias, gate2, dy2, eps, gate_act, interpret):
    rows, C = x2.shape
    r_blk = _pick_rows(rows, C)
    grid = (rows // r_blk,)
    has_gate = gate2 is not None
    row_spec = pl.BlockSpec((r_blk, C), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, C), lambda r: (0, 0),
                            memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((1, 1, C), lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM)
    zeros = jnp.zeros((1, C), jnp.float32)
    dx, dg, ds_p, db_p = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps, has_gate=has_gate,
                          gate_act=gate_act),
        grid=grid,
        in_specs=[row_spec, par_spec, par_spec,
                  row_spec if has_gate else par_spec, row_spec],
        out_specs=(row_spec, row_spec if has_gate else par_spec,
                   part_spec, part_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, C), dy2.dtype),
            jax.ShapeDtypeStruct((rows, C) if has_gate else (1, C),
                                 dy2.dtype),
            jax.ShapeDtypeStruct((rows // r_blk, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((rows // r_blk, 1, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, scale.reshape(1, C).astype(jnp.float32),
      bias.reshape(1, C).astype(jnp.float32),
      gate2 if has_gate else zeros, dy2)
    return dx, (dg if has_gate else None), ds_p.sum((0, 1)), db_p.sum((0, 1))


def _ln_ref(x, scale, bias, gate, eps, gate_act="none"):
    xf = x.astype(jnp.float32)
    mu, rs = _stats(xf, eps)
    y = (xf - mu) * rs * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if gate is not None:
        y = y * _gate_value(gate.astype(jnp.float32), gate_act)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ln_core(x2, scale, bias, gate2, eps, gate_act, interpret):
    return _fwd_pallas(x2, scale, bias, gate2, eps, gate_act, interpret)


def _ln_core_fwd(x2, scale, bias, gate2, eps, gate_act, interpret):
    out = _fwd_pallas(x2, scale, bias, gate2, eps, gate_act, interpret)
    return out, (x2, scale, bias, gate2)


def _ln_core_bwd(eps, gate_act, interpret, res, dy2):
    x2, scale, bias, gate2 = res
    dx, dg, ds, db = _bwd_pallas(x2, scale, bias, gate2, dy2, eps, gate_act,
                                 interpret)
    # cotangent dtypes MUST equal the primal dtypes: under mixed precision
    # scale/bias arrive bf16 and the XLA-fallback branch of
    # layer_norm_fused's platform_dependent produces bf16 param grads (the
    # astype(f32) transposes back), so a f32 ds/db here makes the two
    # branches' signatures diverge and stablehlo.case fails to verify
    return (dx.astype(x2.dtype),
            ds.reshape(scale.shape).astype(scale.dtype),
            db.reshape(bias.shape).astype(bias.dtype),
            None if dg is None else dg.astype(gate2.dtype))


_ln_core.defvjp(_ln_core_fwd, _ln_core_bwd)


# ----------------------------------------------------------------------------
# LN -> spatial-mean fusion (BiAttn's stats path)
# ----------------------------------------------------------------------------

def _lnm_fwd_kernel(x_ref, s_ref, b_ref, o_ref, *, eps, inv_rows):
    # o_ref block is (1, 8, C): row 0 carries the result, rows 1-7 are
    # sublane padding (Pallas requires the trailing-two block dims be
    # (8k, 128m) or equal to the array dims -- a (1, C) block is neither)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    x = x_ref[:].astype(jnp.float32)            # (1, R_BLK, C)
    mu, rs = _stats(x, eps)
    y = (x - mu) * rs * s_ref[:] + b_ref[:]
    o_ref[:, 0] += jnp.sum(y, axis=-2) * inv_rows  # (1, C)


def _lnm_bwd_kernel(x_ref, s_ref, w_ref, dx_ref, xs_ref, *, eps):
    """dx for m = mean_rows(LN(x)) given the PRE-SCALED per-batch cotangent
    w = dm * scale / rows (constant across rows): the standard LN backward
    with a row-constant dy. Also accumulates the per-batch xhat row sum
    (dscale's data term) in the same single pass over x."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        xs_ref[:] = jnp.zeros_like(xs_ref)

    x = x_ref[:].astype(jnp.float32)            # (1, R_BLK, C)
    w = w_ref[:]                                # (1, 1, C) fp32
    mu, rs = _stats(x, eps)
    xhat = (x - mu) * rs
    xs_ref[:, 0] += jnp.sum(xhat, axis=-2)
    m1 = jnp.mean(w, axis=-1, keepdims=True)    # scalar per batch row
    m2 = jnp.mean(w * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (rs * (w - m1 - xhat * m2)).astype(dx_ref.dtype)


def _lnm_specs(B, rows, C, r_blk):
    x_spec = pl.BlockSpec((1, r_blk, C), lambda b, r: (b, r, 0),
                          memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, C), lambda b, r: (0, 0),
                            memory_space=pltpu.VMEM)
    # (B, 8, C) array with row 0 live: a (1, C) block fails the
    # (8k, 128m)-or-equal trailing-dims rule
    out_spec = pl.BlockSpec((1, 8, C), lambda b, r: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    return x_spec, par_spec, out_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _lnm_core(x3, scale, bias, eps, interpret):
    B, rows, C = x3.shape
    r_blk = _pick_rows(rows, C)
    x_spec, par_spec, out_spec = _lnm_specs(B, rows, C, r_blk)
    out = pl.pallas_call(
        functools.partial(_lnm_fwd_kernel, eps=eps, inv_rows=1.0 / rows),
        grid=(B, rows // r_blk),
        in_specs=[x_spec, par_spec, par_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x3, scale.reshape(1, C).astype(jnp.float32),
      bias.reshape(1, C).astype(jnp.float32))
    return out[:, 0]


def _lnm_fwd(x3, scale, bias, eps, interpret):
    return _lnm_core(x3, scale, bias, eps, interpret), (x3, scale)


def _lnm_bwd(eps, interpret, res, dm):
    x3, scale = res
    B, rows, C = x3.shape
    r_blk = _pick_rows(rows, C)
    x_spec, par_spec, out_spec = _lnm_specs(B, rows, C, r_blk)
    w = (dm.astype(jnp.float32) * scale.astype(jnp.float32)[None]
         / rows)                                 # (B, C)
    w_spec = pl.BlockSpec((1, 1, C), lambda b, r: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    dx, xhat_sum = pl.pallas_call(
        functools.partial(_lnm_bwd_kernel, eps=eps),
        grid=(B, rows // r_blk),
        in_specs=[x_spec, par_spec, w_spec],
        out_specs=(x_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((B, rows, C), x3.dtype),
                   jax.ShapeDtypeStruct((B, 8, C), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x3, scale.reshape(1, C).astype(jnp.float32), w[:, None, :])
    xhat_sum = xhat_sum[:, 0]
    dscale = jnp.sum(dm.astype(jnp.float32) * xhat_sum, axis=0) / rows
    dbias = jnp.sum(dm.astype(jnp.float32), axis=0)
    return (dx, dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


_lnm_core.defvjp(_lnm_fwd, _lnm_bwd)


def _lnm_ref(x3, scale, bias, eps):
    y = _ln_ref(x3, scale, bias, None, eps)
    return jnp.mean(y.astype(jnp.float32), axis=-2)


def ln_spatial_mean(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    eps: float = 1e-5, interpret: bool = False,
                    impl: str = "auto") -> jax.Array:
    """mean over all leading-middle positions of LayerNorm(x): x (B, ..., C)
    -> (B, C) fp32. The full-width LN output never exists in HBM (it is
    reduced in VMEM as it is computed) -- BiAttn's stats path
    (`models/cross.py:756-760`), where LN(x) feeds ONLY the spatial mean.
    Backward reads x once (row-constant-cotangent LN backward) and never
    materializes the broadcast dy."""
    B = x.shape[0]
    C = x.shape[-1]
    rows = x.size // (B * C)
    x3 = x.reshape(B, rows, C)

    def _pallas_path():
        return _lnm_core(x3, scale, bias, eps, interpret)

    if impl == "xla":
        return _lnm_ref(x3, scale, bias, eps)
    if impl == "pallas" or interpret:
        return _pallas_path()
    if rows % 8 != 0:
        return _lnm_ref(x3, scale, bias, eps)
    return jax.lax.platform_dependent(
        tpu=_pallas_path,
        default=lambda: _lnm_ref(x3, scale, bias, eps))


def layer_norm_fused(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     gate: jax.Array | None = None, eps: float = 1e-6,
                     impl: str = "auto", interpret: bool = False,
                     gate_act: str = "none"):
    """LayerNorm over the last axis (+ optional elementwise gate multiply).

    x (..., C); scale/bias (C,); gate broadcastable to x or None.
    Matches flax.linen.LayerNorm numerics (fp32 fast-variance stats).
    gate_act: "none" | "silu" | "silu_sum" -- activation applied to the RAW
    gate inside the kernel (see _gate_value), replacing what would
    otherwise be a standalone full-width XLA elementwise pass.
    """
    if gate_act not in ("none", "silu", "silu_sum"):
        raise ValueError(f"unknown gate_act {gate_act!r}")
    C = x.shape[-1]
    rows = x.size // C
    x2 = x.reshape(rows, C)
    gate2 = None
    if gate is not None:
        gate2 = jnp.broadcast_to(gate, x.shape).reshape(rows, C).astype(
            x.dtype)

    def _pallas_path():
        return _ln_core(x2, scale, bias, gate2, eps, gate_act,
                        interpret).reshape(x.shape)

    if impl == "xla":
        return _ln_ref(x, scale, bias, gate, eps, gate_act)
    if impl == "pallas" or interpret:
        return _pallas_path()
    if rows % 8 != 0:
        return _ln_ref(x, scale, bias, gate, eps, gate_act)
    # under the axon tunnel the default backend is 'tpu' even for programs
    # lowered onto the virtual CPU mesh (multichip dryrun), where Pallas
    # cannot lower -- decide per lowering platform like dwconv_pallas
    return jax.lax.platform_dependent(
        tpu=_pallas_path,
        default=lambda: _ln_ref(x, scale, bias, gate, eps, gate_act))
