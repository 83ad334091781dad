"""Fused Pallas TPU kernel for the selective scan (forward + backward).

TPU-native re-design of the reference CUDA extension
(`selective_scan/selective_scan_fwd_kernel.cuh`, `selective_scan_bwd_kernel.cuh`):

* the CUDA kernel assigns one thread-block per (batch, dim) row and runs a CUB
  `BlockScan` over time with a chunk-and-carry structure (chunk 2048,
  `selective_scan.cpp:447`). Here the (batch, direction) axes are folded and
  *tiled* into each grid cell (T pairs per cell, budget-chosen) so the deep
  stages -- short sequences, wide channels -- amortize per-cell overhead; the
  grid is (BK-tiles, D-blocks, L-chunks) with L innermost and the inter-chunk
  carry in a VMEM scratch persisting across sequential grid steps.
* the state dim N is flattened into lanes (n-major within each D-block), so
  the intra-chunk work is ONE wide Hillis-Steele doubling scan over
  (T, L_CHUNK, N*D_BLK) instead of N narrow ones -- ~16x fewer vector-op
  issues at identical math. The carry is a single flat row (T, 1, N*D_BLK);
  expansion/reduction between (.., D_BLK) and (.., N*D_BLK) uses lane
  concatenates of fresh full-width values and static lane slices only
  (Mosaic rejects sublane concats of lane-offset slices and dynamic_slice
  on values).
* the CUDA backward uses a custom `BlockReverseScan` plus atomicAdds for
  dA/dD/ddelta_bias (`selective_scan_bwd_kernel.cuh:26-72`). TPUs have no
  atomics, so the backward accumulates dA/dD/dbias into resident output
  blocks while the L grid axis iterates and emits per-(bk, d-block) partials
  for dB/dC; XLA sums the small partials outside. The adjoint reverse scan
  is a shift-UP doubling scan (Mosaic cannot lower lax.rev).
* forward saves only the per-chunk incoming states (the `x` tensor of the
  CUDA ABI, `selective_scan.cpp:307-313`), in the flat-lane layout; the
  backward recomputes intra-chunk states from them. Forward and backward
  MUST agree on l_chunk (the carry contract); the BK tile T may differ.

Public layouts (channels-last):
    u, delta : (B, K, L, D)
    A        : (K, D, N)
    Bmat/Cmat: (B, K, L, N)
    D, delta_bias : (K, D)
All math float32.

Scope note: A (and all weights) are REAL-valued only. The reference CUDA
extension also compiles complex64-weight variants
(`selective_scan/selective_scan_bwd_fp32_complex.cu`, dispatch in
`selective_scan.cpp`), but no reference model config instantiates them; the
complex-A capability is intentionally out of scope here (see PARITY.md row 1).
"""
from __future__ import annotations

import contextlib
import contextvars
import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# time-axis shift strategy inside the doubling scans: "concat" builds
# (pad ++ slice); "roll" uses the hardware sublane rotate + an iota mask.
_SHIFT_IMPL = os.environ.get("FM_SCAN_SHIFT", "concat")

# intra-chunk scan algorithm: "doubling" = plain Hillis-Steele; "twolevel" =
# work-efficient within-8-rows scan (rank-4 concat shifts) + carry scan over
# row-groups; "twolevel_roll" = same but within-group shifts use the hardware
# sublane rotate + iota mask on the flat array. Although twolevel does ~2x
# fewer full-width VPU passes on paper, MEASURED on v5e it is ~30% SLOWER
# than plain doubling (chained micro-bench, L=1024/256 model stages: fwd+bwd
# 5.1/2.7 ms vs 3.9/1.9 ms) -- the rank-4 masked sub-tile shifts and the
# carry extract/inject relayouts cost more than the saved passes; the roll
# variant is slower still.
#
# "cumsum" = log-space separable rescan: because a = exp(delta*A) the running
# log-decay S = A (x) cumsum(delta) is SEPARABLE -- the cumsum runs on the
# UNEXPANDED (L, D) delta and only a single rescaled array
# Z = b * exp(-S) needs an expanded-width prefix sum (add monoid, one array,
# log2(Q) shift+add passes) instead of the (a,b) monoid doubling over two
# expanded arrays (16 shifts + 24 flops at L_chunk=256). exp(-S) is kept in
# fp32 range by rebasing S per Q=32-row group (worst-case |S| growth at the
# reference's dt/A init is 1.6/step -> 51 < the +-_CLIP clip) and combining
# groups with the overflow-free (a,b) monoid on 1/Q-size carry arrays.
# "adaptive_cell" = PER-GRID-CELL runtime selection between the two regimes:
# each (bk-tile, d-block, l-chunk) cell computes its own rescale margin
# max |A| * group-cumsum(delta) (one unexpanded-width multiply + reduce) and
# branches via an in-kernel lax.cond -- margin inside the +-_CLIP clip -> the
# fast cumsum_mm rescan (bit-identical to FM_SCAN_ALGO=cumsum_mm there),
# margin outside -> the magnitude-exact doubling scan for that cell only.
# Numerically validated at every magnitude (test_adaptive_algo_*), but
# MEASURED SLOW on v5e (r5, bench_artifacts/r5/adaptive_cell_bench.txt):
# the data-dependent scf.if costs 4.5x on the single-chunk stage (the
# vector-reduce predicate stalls the scalar core's run-ahead pipeline) and
# even a constant scalar predicate leaves +36..55%% on multi-chunk stages
# (the if-region breaks cross-grid-step DMA pipelining). Kept as an
# experiment record; the SHIPPED adaptive mechanism is per-CALL dispatch in
# selective_scan (impl="adaptive"): margin computed OUTSIDE the kernel, one
# XLA-level cond between the two compiled kernels -- zero in-kernel
# overhead when safe.
# DEFAULT: "cumsum_mm" -- the measured-best TPU operating point (the MXU
# triangular-dot rescan). "doubling" remains the exact pure-VPU fallback
# for arbitrary input magnitudes (FM_SCAN_ALGO=doubling).
_SCAN_ALGO = os.environ.get("FM_SCAN_ALGO", "cumsum_mm")

# Trace-time algorithm override (`force_scan_algo`). A ContextVar, not a
# module global: concurrent traces (threaded compiles, async-checkpoint
# machinery tracing mid-context) must each see their own override without
# clobbering the other's (ADVICE r4).
_SCAN_ALGO_OVERRIDE: "contextvars.ContextVar[str | None]" = \
    contextvars.ContextVar("fm_scan_algo_override", default=None)


def _algo() -> str:
    """The intra-chunk scan algorithm active for the current trace."""
    override = _SCAN_ALGO_OVERRIDE.get()
    return _SCAN_ALGO if override is None else override

# group size for the cumsum algorithms' rescale rebasing; must keep
# |A| * sum(delta) within a group below the +-_CLIP fp32 exp clip. At the
# reference model's init (|A| <= d_state = 16, worst-lane delta ~ 0.1,
# i.e. ~1.6/step worst case) q=32 bounds |S| by ~51 and q=16 by ~26;
# lanes that exceed the clip saturate their decay weights (bounded,
# documented deviation -- "doubling" remains the exact fallback).
_CUMSUM_Q = int(os.environ.get("FM_SCAN_CUMSUM_Q", 32))

# rescale clip: the exact-envelope boundary of the cumsum algorithms. Every
# exp argument in the rescale is a GROUP-relative log-decay in [-_CLIP, 0]
# (or its negation), so the largest factorized intermediate is
# |operand| * q * e^_CLIP and fp32 overflows at e^88.7. 72 leaves
# e^(88.7-72)/q ~ 5.6e5 of operand-magnitude headroom (activations and
# gradients are O(1e2) in practice) while widening the exact band well past
# the reference-init margins (51-58 at q=32) AND most of the trained-regime
# drift: 7 of the 12 scans that crossed 60 by step 200 sat at 61-72
# (bench_artifacts/r5/margin_trip_distribution_200steps.txt), i.e. they now
# stay on the fast cumsum_mm tier with zero repair cost. Raising the clip
# costs nothing at runtime -- it only changes where jnp.clip bites and
# where the adaptive repair (margin >= _CLIP) triggers. Beyond _CLIP the
# magnitude-exact doubling tier takes over (impl="adaptive").
_CLIP = float(os.environ.get("FM_SCAN_CLIP", 72.0))

# matmul mode for the cumsum_mm triangular dots. The triangular-ones matrix
# is EXACT in bf16, so the only rounding is on the scanned values:
#   "default" = one bf16 pass with fp32 accumulation. Prefix-sum terms are
#               rounded to bf16 (~2^-8), the same rounding the kernel's
#               bf16 I/O already applies to its inputs under mixed
#               precision; measured 4.8e-4 global rel error in the init
#               regime -- 60x inside the reference's own bf16 kernel
#               tolerance (rtol 3e-2, test_selective_scan.py:399-401),
#               and also inside the reference's fp32 tolerance (6e-4
#               rtol); the golden SSIM >= 0.999 parity gate passes under
#               it. This is the shipped default AND the bench operating
#               point (set FM_SCAN_MM_PREC=hilo for fp32-grade dots).
#   "hilo"    = two bf16 dots on a Veltkamp-split x = hi + lo (the split
#               uses plain float mul/add; a convert-based split is ELIDED
#               by XLA's excess-precision pass and integer-mask splits
#               crash this Mosaic's u32 lowering). Measured equal to
#               true-fp32 dots (3e-5 rel) at ~2/3 their cost; fp32-grade.
#   "highest" = true-fp32 multi-pass dots (slowest, exact baseline).
_MM_MODE = os.environ.get("FM_SCAN_MM_PREC", "default")
_MM_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
    "hilo": jax.lax.Precision.DEFAULT,
}[_MM_MODE]

# N-expansion / y-contraction strategy for the kernels' flat-lane layout:
#   "concat" = N lane-broadcast multiplies concatenated into the F-wide
#              array (and N broadcast-mul+adds for the y readout);
#   "mm"     = ride the MXU: B/C rows are expanded with ONE dot against the
#              exact block matrix E[n, n*d_blk+d] = 1 (single-1 rows, so
#              products are exact; bf16 inputs expand exactly, fp32 goes
#              through a Veltkamp hi/lo pair), the y readout contracts
#              sum_n C_n*x_n with the transposed block matrix, and the
#              D-tilings become plain block copies. Replaces the per-n
#              lane-broadcast sequences (a cross-lane splat each) with MXU
#              work that overlaps the VPU passes.
_EXPAND_MODE = os.environ.get("FM_SCAN_EXPAND", "concat")

# dB/dC gradient reductions in the backward kernel: "hilo"/"default"/
# "highest" route the contraction over the d_blk lanes through the MXU as a
# block-ones dot (one F-wide multiply + one (L,F)@(F,N) matmul) instead of N
# per-state cross-lane VPU reduce sequences (~log2(d_blk) F-wide passes
# each); "off" keeps the exact VPU reduces. Precision semantics match
# FM_SCAN_MM_PREC: hilo = Veltkamp-split bf16 pair (~3e-5 rel, fp32-grade),
# default = single bf16 pass (~2^-9 rel), highest = true-fp32 multi-pass.
# MEASURED (v5e, chained, L=1024/D=192 fwd+bwd): off 3.28 ms, default
# 3.18 ms (-3%), hilo 3.36 ms (+2%) -- Mosaic's native cross-lane reduce is
# cheaper than estimated. Shipped default = "default" (the measured-best
# bench operating point); FM_SCAN_GRAD_MM=off restores the exact VPU path.
_GRAD_MM_MODE = os.environ.get("FM_SCAN_GRAD_MM", "default")

# element budgets bounding the scoped VMEM stack; the dominant live buffers
# are (T, l_chunk, N*d_blk) f32 flats (~6 forward, ~12 backward; the
# pallas_call raises vmem_limit_bytes to 100 MB of the v5e's 128 MB).
# BWD default 512K (r4 sweep): lifts the deep-stage (L=16) backward to
# T=6 per cell (-3%), neutral elsewhere.
_FWD_ELEM_BUDGET = int(os.environ.get("FM_SCAN_FWD_BUDGET", 256 * 1024))
_BWD_ELEM_BUDGET = int(os.environ.get("FM_SCAN_BWD_BUDGET", 512 * 1024))

# cap on the intra-cell L chunk. Smaller chunks do fewer doubling passes per
# element (log2 l_chunk) at the cost of more sequential grid steps and one
# carry inject per chunk; 256 measured best on v5e (see tools/bench_scan.py)
_L_CAP = int(os.environ.get("FM_SCAN_LCAP", 256))

# TIMING-ONLY ablation flags for the backward kernel (comma-separated;
# produce WRONG gradients -- never set outside tools/bench_bwd_passes.py):
#   parts      P = Pinv = 1 (skip the S concat + exp + reciprocal)
#   recompute  skip the forward rescan (x/W from b directly)
#   rev        skip the reverse scan (g/G2 from src directly)
#   daa        daa = G2 (skip the shifted-W product)
#   loop       skip the per-n gB/daaA accumulation
#   graddots   skip the dB/dC/dA contractions (write zeros)
#   build      b/src from tiled du_t/dy (skip the B/C expansion muls)
_ABLATE = frozenset(
    f for f in os.environ.get("FM_SCAN_ABLATE", "").split(",") if f)

# how the cumsum algorithms produce Pinv = exp(-clip(S)): "exp" = a second
# exp pass (DEFAULT -- measured -4.4% on the stage-1 chained fwd+bwd, the
# fp32 divide is the single most expensive pass the ablation found),
# "div" = 1/P; the two are bit-different only in the last ulp (PERF.md).
# NOTE: the FM_SCAN_FUSE fused builds compute exp(-s) per-n directly and
# therefore always behave as "exp" regardless of this knob.
_PINV_MODE = os.environ.get("FM_SCAN_PINV", "exp")

# how the backward contracts gB = sum_n g_n*B_n / daaA = sum_n daa_n*A_n:
# "loop" = per-n slice + fma accumulation, "mm" = F-wide multiply against
# lane-broadcast expansions + exact block-ones MXU dots (see PERF.md)
_NLOOP_MODE = os.environ.get("FM_SCAN_NLOOP", "loop")

# daaA-only MXU variant: A is l-invariant, so daaA = daa @ M with
# M[n*d_blk+d', d] = A[d, n]*[d'==d] -- a block-diag matrix built ONCE per
# (bk, d) grid pair into VMEM scratch (bf16, ~2^-8 rounding on the dA/ddt
# A-term, same class as the shipped GRAD_MM default) and reused across
# l-chunks; replaces the loop's 2N d_blk-wide fma passes with one dot.
# MEASURED (r4 sweep, bench_artifacts/r4): LOSES +6..21% on every stage --
# the daa bf16 cast + M-scratch traffic + dot latency cost more than the
# fma passes saved, the same failure mode as NLOOP=mm/EXPAND=mm even with
# the expansion hoisted out of the l loop. Default stays "loop"; the knob
# remains for other-hardware experiments.
_DAA_MODE = os.environ.get("FM_SCAN_DAA", "loop")

# fused build x rescale for the cumsum algorithms: build the PRE-SCALED scan
# operands directly inside the per-n concats -- Z_n = du*B_n*exp(-s_n) and
# (backward) V_n = C_n*dy*exp(+s_n) with s_n = clip(trel*A_n) computed at
# d_blk width per operand -- so the expanded S, b, src (and, forward-only,
# Pinv) arrays are never materialized: ~3 fewer expanded-width VMEM
# round-trips per scan at identical elementwise flop count (the per-element
# exp/mul work just moves inside the concat operands).
# MEASURED (v5e, chained fwd+bwd, bf16 b24): a wash-to-loss on the long
# stages (L=1024: +2.7%, L=256: 0 -- Mosaic already keeps those chains
# fused and the extra per-n issue slots cost more than the saved arrays)
# but a clear WIN on the short-chunk deep stages where fixed per-array
# costs dominate (L=64: -6%, L=16: -15%). Default "auto" = fuse only when
# the chunk is short (l_chunk <= 64); FM_SCAN_FUSE=1/0 forces it.
_FUSE_MODE = os.environ.get("FM_SCAN_FUSE", "auto")
_FUSE_LMAX = int(os.environ.get("FM_SCAN_FUSE_LMAX", 64))
if _FUSE_MODE not in ("auto", "0", "1"):
    raise ValueError(
        f"FM_SCAN_FUSE must be 'auto', '0' or '1', got {_FUSE_MODE!r}")


def _fuse_on(l_chunk: int) -> bool:
    if _FUSE_MODE == "auto":
        return l_chunk <= _FUSE_LMAX
    return _FUSE_MODE == "1"

# TIMING-ONLY predicate override for the adaptive algorithm ("const" takes
# the fast branch via a scalar-core-resident always-true predicate --
# isolates the cost of the data-dependent VPU-reduce predicate from the
# scf.if region cost; produces WRONG results on saturating inputs)
_ADAPT_PRED = os.environ.get("FM_SCAN_ADAPT_PRED", "data")


def _adaptive_pred(margin):
    if _ADAPT_PRED == "const":
        return pl.program_id(2) < 2 ** 30
    return margin < _CLIP

# how the cumsum algorithms read one row per q-group (group-end decay
# products / sums): "slice" = a strided sublane extract (DEFAULT --
# measured -3.6% on the stage-1 chained fwd+bwd), "mask" = the where+sum
# reduction it replaces (a ~log2(q) sublane-rotate tree per use on the
# issue-bound VPU; kept selectable for lowering regressions)
_ROWSEL_MODE = os.environ.get("FM_SCAN_ROWSEL", "slice")


def _take_row(x4: jax.Array, row: int) -> jax.Array:
    """(T, G, q, F) -> (T, G, F): extract sublane `row` of every group."""
    if _ROWSEL_MODE == "slice":
        return x4[:, :, row, :]
    idx = jax.lax.broadcasted_iota(jnp.int32, x4.shape, 2)
    return jnp.sum(jnp.where(idx == row, x4, 0.0), axis=2)


#: public alias of the rescale clip for guard/reporting code
SATURATION_CLIP = _CLIP


@contextlib.contextmanager
def force_scan_algo(algo: str):
    """Trace-time override of the intra-chunk algorithm (kernel structure
    is decided while tracing, so wrapping a pallas call's TRACE in this
    context pins its algorithm). Used by `selective_scan(impl=
    "pallas_exact")` -- the saturation-guard auto-fallback path -- to force
    the magnitude-exact "doubling" scan regardless of FM_SCAN_ALGO."""
    token = _SCAN_ALGO_OVERRIDE.set(algo)
    try:
        yield
    finally:
        _SCAN_ALGO_OVERRIDE.reset(token)


def saturation_margin(delta: jax.Array, A: jax.Array,
                      delta_bias: jax.Array | None = None,
                      delta_softplus: bool = True) -> jax.Array:
    """Worst-case |S| the cumsum-family scans would see: the max over all
    (batch, k, position, channel) of `max_n |A[k,d,n]| * group-cumsum(delta)`
    with the same chunk/group partition `_pick_blocks`/`_cumsum_q` choose.

    The shipped default algorithm ("cumsum_mm") is EXACT only while this
    margin stays below `SATURATION_CLIP` (+-72 default, FM_SCAN_CLIP): beyond it, exp(S) clips and
    decay weights silently saturate (scan_pallas.py:76-85). True at the
    reference init (margin ~51 worst case) but not guaranteed under
    training -- this helper is the cheap runtime detector (it runs on the
    UNEXPANDED (B, K, L, D) delta, ~1/N of the kernel's expanded width).

    delta: (B, K, L, D) raw dt (pre-bias/softplus, as passed to
    `selective_scan`); A: (K, D, N); delta_bias: (K, D) or None.
    Returns a scalar fp32 margin. When the active algorithm has no rescale
    clip ("doubling"/"twolevel"), the margin is still the quantity a switch
    to the default WOULD see -- callers may ignore it in that case.
    """
    d = delta.astype(jnp.float32)
    if delta_bias is not None:
        d = d + delta_bias[None, :, None, :]
    if delta_softplus:
        d = jax.nn.softplus(d)
    B, K, L, D = d.shape
    l_chunk = _largest_divisor_leq(L, _L_CAP, prefer_multiple=8)
    q = min(_CUMSUM_Q, l_chunk)
    while q > 1 and l_chunk % q:
        q //= 2
    if q < 1:
        q = 1
    gc = jnp.cumsum(d.reshape(B, K, L // q, q, D), axis=3)
    amax = jnp.max(jnp.abs(A), axis=-1)            # (K, D)
    return jnp.max(gc * amax[None, :, None, None, :])


class _BlockCfg(NamedTuple):
    d_blk: int
    l_chunk: int
    t_fwd: int
    t_bwd: int
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


_D_CAP = int(os.environ.get("FM_SCAN_DCAP", 256))
_D_CAP_EXPLICIT = "FM_SCAN_DCAP" in os.environ


def _pick_blocks(L: int, D: int, BK: int, N: int = 16, d_cap: int | None = None,
                 l_cap: int | None = None) -> _BlockCfg:
    if d_cap is None:
        d_cap = _D_CAP
        # LONG-chunk stages amortize per-cell overheads, so widening the
        # d-block pays there: 384-lane blocks cut stage-2 (L=256, D=384)
        # fwd+bwd 6% by collapsing n_dblk 3->1 (fewer redundant lowrank-dt
        # dots + partials). Short-chunk stages REGRESS badly at 384
        # (L=64: +20%, L=16: +63% -- r4 sweep, bench_artifacts/r4) so the
        # widening is gated on the chunk length.
        if (not _D_CAP_EXPLICIT and D % 384 == 0
                and _largest_divisor_leq(L, _L_CAP, 8) >= 256):
            d_cap = 384
    if l_cap is None:
        l_cap = _L_CAP
    d_blk = _largest_divisor_leq(D, d_cap)
    l_chunk = _largest_divisor_leq(L, l_cap, prefer_multiple=8)
    cell = l_chunk * d_blk * N  # flat-lane width times chunk

    def pick_t(budget):
        t = 1
        for cand in range(BK, 0, -1):
            if BK % cand == 0 and cand * cell <= budget:
                t = cand
                break
        return t

    return _BlockCfg(d_blk, l_chunk, pick_t(_FWD_ELEM_BUDGET),
                     pick_t(_BWD_ELEM_BUDGET), D // d_blk, L // l_chunk)


def _shift_down(x: jax.Array, s: int, fill: float) -> jax.Array:
    """Shift rows (time axis -2) down by s; top s rows become `fill`."""
    L = x.shape[-2]
    if s >= L:
        return jnp.full_like(x, fill)
    if _SHIFT_IMPL == "roll":
        r = pltpu.roll(x, s, axis=x.ndim - 2)
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
        return jnp.where(idx >= s, r, jnp.float32(fill))
    pad = jnp.full(x.shape[:-2] + (s, x.shape[-1]), fill, x.dtype)
    return jnp.concatenate([pad, x[..., : L - s, :]], axis=-2)


def _shift_up(x: jax.Array, s: int, fill: float) -> jax.Array:
    """Shift rows (time axis -2) up by s; bottom s rows become `fill`."""
    L = x.shape[-2]
    if s >= L:
        return jnp.full_like(x, fill)
    if _SHIFT_IMPL == "roll":
        # pltpu.roll requires shift >= 0: up-shift by s == circular L - s
        r = pltpu.roll(x, L - s, axis=x.ndim - 2)
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
        return jnp.where(idx < L - s, r, jnp.float32(fill))
    pad = jnp.full(x.shape[:-2] + (s, x.shape[-1]), fill, x.dtype)
    return jnp.concatenate([x[..., s:, :], pad], axis=-2)


def _doubling_scan(a: jax.Array, b: jax.Array):
    """Inclusive scan of x_l = a_l x_{l-1} + b_l with x_{-1}=0 along axis -2.

    Returns (a_cum, x): a_cum_l = prod_{i<=l} a_i (used to inject the incoming
    carry), x the zero-init scan. Log-depth Hillis-Steele over the SSM monoid
    (a1,b1)*(a2,b2) = (a1*a2, a2*b1+b2)
    (reference: `selective_scan/selective_scan_common.h:108-130`).
    """
    L = a.shape[-2]
    s = 1
    while s < L:
        a_sh = _shift_down(a, s, 1.0)
        b_sh = _shift_down(b, s, 0.0)
        b = b + a * b_sh
        a = a * a_sh
        s *= 2
    return a, b


def _group_scan(a: jax.Array, b: jax.Array):
    """Two-level inclusive scan of x_l = a_l x_{l-1} + b_l (x_{-1}=0) along
    axis -2, returning (a_cum, x) like `_doubling_scan`.

    Level 1: 3 masked doubling steps compute the scan WITHIN each group of 8
    rows (one sublane tile). Level 2: the per-group carries (row 7 of each
    group, extracted with a mask+reduce, never a strided slice -- Mosaic) are
    scanned with log2(L/8) doubling steps on a (T, L/8, F) array 1/8 the
    size, then injected back with one fused multiply-add. Total full-width
    passes ~3.6 step-equivalents vs 8 for pure doubling at L=256.
    """
    T, L, F = a.shape
    if L % 8 != 0 or L <= 8 or _algo() == "doubling":
        return _doubling_scan(a, b)
    G = L // 8

    if _algo() == "twolevel_roll":
        # within-group steps on the FLAT (T, L, F) array: hardware sublane
        # rotate + iota%8 mask, avoiding rank-4 concats of sub-tile sublane
        # slices (which Mosaic lowers as relayout copies)
        row = jax.lax.broadcasted_iota(jnp.int32, (T, L, F), 1) % 8
        for s in (1, 2, 4):
            a_sh = pltpu.roll(a, s, axis=1)
            b_sh = pltpu.roll(b, s, axis=1)
            keep = row >= s
            b = b + a * jnp.where(keep, b_sh, 0.0)
            a = a * jnp.where(keep, a_sh, 1.0)
        a4 = a.reshape(T, G, 8, F)
        b4 = b.reshape(T, G, 8, F)
    else:
        a4 = a.reshape(T, G, 8, F)
        b4 = b.reshape(T, G, 8, F)
        # within-group masked doubling: shifts must not cross group
        # boundaries, which the rank-4 shape guarantees
        for s in (1, 2, 4):
            pad_a = jnp.ones(a4.shape[:2] + (s, F), a4.dtype)
            pad_b = jnp.zeros(b4.shape[:2] + (s, F), b4.dtype)
            a_sh = jnp.concatenate([pad_a, a4[:, :, : 8 - s, :]], axis=2)
            b_sh = jnp.concatenate([pad_b, b4[:, :, : 8 - s, :]], axis=2)
            b4 = b4 + a4 * b_sh
            a4 = a4 * a_sh

    # group carries: row 7 of each group via mask+reduce (one sublane pass)
    idx = jax.lax.broadcasted_iota(jnp.int32, (T, G, 8, F), 2)
    last = idx == 7
    ga = jnp.sum(jnp.where(last, a4, 0.0), axis=2)      # (T, G, F)
    gb = jnp.sum(jnp.where(last, b4, 0.0), axis=2)

    # level-2 scan over groups (1/8-size arrays)
    ga_cum, gx = _doubling_scan(ga, gb)                 # inclusive over G

    # exclusive versions: value entering each group from the groups before it
    prev_x = jnp.concatenate(
        [jnp.zeros((T, 1, F), gx.dtype), gx[:, : G - 1, :]], axis=1)
    prev_a = jnp.concatenate(
        [jnp.ones((T, 1, F), ga_cum.dtype), ga_cum[:, : G - 1, :]], axis=1)

    x4 = b4 + a4 * prev_x[:, :, None, :]
    a_cum4 = a4 * prev_a[:, :, None, :]
    return a_cum4.reshape(T, L, F), x4.reshape(T, L, F)


def _group_scan_rev(a_next: jax.Array, b: jax.Array):
    """Two-level reverse scan r_l = b_l + a_next_l r_{l+1} (r_L = 0) along
    axis -2, returning (a_cum_rev, r) like `_doubling_scan_rev`."""
    T, L, F = a_next.shape
    if L % 8 != 0 or L <= 8 or _algo() == "doubling":
        return _doubling_scan_rev(a_next, b)
    G = L // 8

    if _algo() == "twolevel_roll":
        a = a_next
        row = jax.lax.broadcasted_iota(jnp.int32, (T, L, F), 1) % 8
        for s in (1, 2, 4):
            a_sh = pltpu.roll(a, L - s, axis=1)   # up-shift by s (circular)
            b_sh = pltpu.roll(b, L - s, axis=1)
            keep = row < 8 - s
            b = b + a * jnp.where(keep, b_sh, 0.0)
            a = a * jnp.where(keep, a_sh, 1.0)
        a4 = a.reshape(T, G, 8, F)
        b4 = b.reshape(T, G, 8, F)
    else:
        a4 = a_next.reshape(T, G, 8, F)
        b4 = b.reshape(T, G, 8, F)
        for s in (1, 2, 4):
            pad_a = jnp.ones(a4.shape[:2] + (s, F), a4.dtype)
            pad_b = jnp.zeros(b4.shape[:2] + (s, F), b4.dtype)
            a_sh = jnp.concatenate([a4[:, :, s:, :], pad_a], axis=2)
            b_sh = jnp.concatenate([b4[:, :, s:, :], pad_b], axis=2)
            b4 = b4 + a4 * b_sh
            a4 = a4 * a_sh

    idx = jax.lax.broadcasted_iota(jnp.int32, (T, G, 8, F), 2)
    first = idx == 0
    ga = jnp.sum(jnp.where(first, a4, 0.0), axis=2)     # (T, G, F)
    gb = jnp.sum(jnp.where(first, b4, 0.0), axis=2)

    ga_cum, gr = _doubling_scan_rev(ga, gb)

    next_r = jnp.concatenate(
        [gr[:, 1:, :], jnp.zeros((T, 1, F), gr.dtype)], axis=1)
    next_a = jnp.concatenate(
        [ga_cum[:, 1:, :], jnp.ones((T, 1, F), ga_cum.dtype)], axis=1)

    r4 = b4 + a4 * next_r[:, :, None, :]
    a_cum4 = a4 * next_a[:, :, None, :]
    return a_cum4.reshape(T, L, F), r4.reshape(T, L, F)


def _cumsum_q(L: int) -> int | None:
    """Group size for the "cumsum" algorithms, or None to fall back."""
    if _algo() not in ("cumsum", "cumsum_mm", "adaptive_cell"):
        return None
    q = min(_CUMSUM_Q, L)
    while q > 1 and L % q:
        q //= 2
    return q if q >= 8 or q == L else None


def _cumsum_ax(x: jax.Array, q: int, up: bool = False) -> jax.Array:
    """Inclusive prefix (or suffix, up=True) sum along axis -2.

    "cumsum_mm": one (q, q) triangular-ones matmul per (bk-tile, group) --
    the prefix sum rides the MXU (fp32 via multi-pass bf16) and overlaps
    with the kernel's VPU elementwise work, instead of log2(q) shift+add
    VPU passes whose sub-tile concats Mosaic lowers as relayout copies.
    """
    if (_algo() in ("cumsum_mm", "adaptive_cell") and x.ndim == 4
            and x.shape[-2] >= 8):
        T, G, q_, F = x.shape
        # batch groups into one BLOCK-DIAGONAL triangular dot: a lone
        # (q, q) dot at q=32 drives only 32/128 of the MXU's M and K
        # dims; stacking `sub` groups into a (sub*q, sub*q) block-diag
        # mask (identical math -- zero blocks across groups) fills the
        # 128x128 systolic tile, ~4x fewer MXU cycles and 4x fewer
        # issues at q=32
        orig_shape = x.shape
        sub = max(1, 128 // q_)
        while sub > 1 and G % sub:
            sub //= 2
        M = sub * q_
        x = x.reshape(T, G // sub, M, F)
        row = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
        within = (row // q_) == (col // q_)
        tri = ((row <= col if up else row >= col) & within).astype(
            jnp.float32)
        T, G, q_, F = x.shape
        if _MM_MODE == "hilo":
            # IMPORTANT: the naive split hi = bf16(x); lo = x - f32(hi) is
            # ELIDED by XLA's excess-precision pass (lo folds to exactly 0,
            # silently degrading to one plain bf16 dot), and this Mosaic
            # version crashes on u32 bitcast masking. Use a Veltkamp split
            # instead: with c = x*(2^16+1), hi = c - (c - x) holds the top
            # 8 mantissa bits (exactly representable in bf16) and
            # lo = x - hi the rest -- plain float ops the compiler must
            # evaluate as written (float a-(a-b) is not simplifiable).
            c = x * jnp.float32(65537.0)
            hi_f32 = c - (c - x)
            hi = hi_f32.astype(jnp.bfloat16)
            lo = (x - hi_f32).astype(jnp.bfloat16)

        def dot(block):
            return jax.lax.dot(tri, block, precision=_MM_PRECISION,
                               preferred_element_type=jnp.float32)

        outs = []
        for t in range(T):
            gouts = []
            for g in range(G):
                if _MM_MODE == "hilo":
                    gouts.append(dot(hi[t, g]) + dot(lo[t, g]))
                else:
                    gouts.append(dot(x[t, g]))
            outs.append(gouts)
        return jnp.stack([jnp.stack(g) for g in outs]).reshape(orig_shape)
    s = 1
    shift = _shift_up if up else _shift_down
    while s < q:
        x = x + shift(x, s, 0.0)
        s *= 2
    return x


def _veltkamp_split_bf16(x: jax.Array):
    """Split fp32 x into bf16 (hi, lo) with hi+lo == x to ~3e-5 rel.

    Plain float mul/add Veltkamp split (c = x*(2^16+1); hi = c-(c-x)) --
    the convert-roundtrip form is elided by XLA's excess-precision pass
    (see _cumsum_ax)."""
    c = x * jnp.float32(65537.0)
    hi_f32 = c - (c - x)
    return hi_f32.astype(jnp.bfloat16), (x - hi_f32).astype(jnp.bfloat16)


def _grad_block_dot(prod: jax.Array, blockones: jax.Array) -> jax.Array:
    """(L, F) @ (F, N) gradient contraction at the configured precision."""
    if _GRAD_MM_MODE == "hilo":
        hi, lo = _veltkamp_split_bf16(prod)
        return (jax.lax.dot(hi, blockones,
                            preferred_element_type=jnp.float32)
                + jax.lax.dot(lo, blockones,
                              preferred_element_type=jnp.float32))
    prec = (jax.lax.Precision.HIGHEST if _GRAD_MM_MODE == "highest"
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot(prod, blockones.astype(prod.dtype), precision=prec,
                       preferred_element_type=jnp.float32)


def _grad_colsum_dot(prod: jax.Array) -> jax.Array:
    """sum over axis 0 of (L, F) as an MXU ones-row dot -> (1, F).

    Replaces a cross-sublane reduce tree (log2(L) sublane passes on the
    issue-bound VPU) with one matmul; the ones row is exact, so only the
    summand carries the _GRAD_MM_MODE-dependent dot rounding. The M=8 rows
    keep the dot on a full sublane tile; row 0 is the result."""
    L = prod.shape[0]
    if _GRAD_MM_MODE == "hilo":
        ones = jnp.ones((8, L), jnp.bfloat16)
        hi, lo = _veltkamp_split_bf16(prod)
        out = (jax.lax.dot(ones, hi, preferred_element_type=jnp.float32)
               + jax.lax.dot(ones, lo, preferred_element_type=jnp.float32))
    else:
        prec = (jax.lax.Precision.HIGHEST if _GRAD_MM_MODE == "highest"
                else jax.lax.Precision.DEFAULT)
        ones = jnp.ones((8, L), prod.dtype)
        out = jax.lax.dot(ones, prod, precision=prec,
                          preferred_element_type=jnp.float32)
    return out[0:1]


def _expand_nvals(v: jax.Array, d_blk: int) -> jax.Array:
    """(T, L, N) -> (T, L, N*d_blk) fp32 with out[..., n*d_blk+d] = v[..., n].

    MXU block-expansion dot against E[n, n*d_blk+d] = 1: every output
    element is a single product with an exact 1, so bf16 inputs expand
    EXACTLY; fp32 inputs go through a Veltkamp hi/lo pair (~3e-5 rel).
    Replaces N cross-lane broadcast splats per expanded array.
    """
    T, L, N = v.shape
    F = N * d_blk
    row = jax.lax.broadcasted_iota(jnp.int32, (N, F), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, F), 1)
    E = (row == col // d_blk).astype(jnp.bfloat16)

    def dot(m):
        return jax.lax.dot(m, E, preferred_element_type=jnp.float32)

    outs = []
    for t in range(T):
        if v.dtype == jnp.bfloat16:
            outs.append(dot(v[t]))
        else:
            hi, lo = _veltkamp_split_bf16(v[t].astype(jnp.float32))
            outs.append(dot(hi) + dot(lo))
    return jnp.stack(outs)


def _contract_nvals(v: jax.Array, N: int, d_blk: int) -> jax.Array:
    """(T, L, N*d_blk) -> (T, L, d_blk): out[..., d] = sum_n v[..., n*d_blk+d]
    via the transposed block matrix on the MXU (fp32 accumulation). The
    block matrix is exact in bf16; the summands' rounding follows
    FM_SCAN_MM_PREC ("default" = one bf16 pass, "hilo" = Veltkamp pair at
    fp32 grade, "highest" = true-fp32 dots).
    """
    T, L, F = v.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (F, d_blk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (F, d_blk), 1)
    R = (row % d_blk == col).astype(
        jnp.bfloat16 if _MM_MODE == "hilo" else jnp.float32)

    def dot1(m):
        if _MM_MODE == "hilo":
            hi, lo = _veltkamp_split_bf16(m)
            return (jax.lax.dot(hi, R, preferred_element_type=jnp.float32)
                    + jax.lax.dot(lo, R, preferred_element_type=jnp.float32))
        return jax.lax.dot(m, R, precision=_MM_PRECISION,
                           preferred_element_type=jnp.float32)

    return jnp.stack([dot1(v[t]) for t in range(T)])


def _tile_d(x: jax.Array, N: int) -> jax.Array:
    """(T, L, d_blk) -> (T, L, N*d_blk) by block repetition (plain copies)."""
    return jnp.concatenate([x] * N, axis=-1)


def _group_rel_cumsum(delta: jax.Array, q: int) -> jax.Array:
    """Group-relative inclusive cumsum of delta along L: (T, L, d_blk)."""
    T, L, d_blk = delta.shape
    G = L // q
    return _cumsum_ax(delta.reshape(T, G, q, d_blk), q).reshape(T, L, d_blk)


def _rescaled_group_parts(delta: jax.Array, At: jax.Array, q: int):
    """Shared prologue of the cumsum algorithm: per-group rescale factors.

    delta: (T, L, D_BLK) post-softplus, At: (T, N, D_BLK). Returns
    (P, Pinv) of shape (T, L, N*D_BLK): P_l = exp(S_l) with S the GROUP-
    relative log-decay cumsum, clipped to +-_CLIP so exp stays in fp32
    range. S = A (x) cumsum(delta) is computed on the unexpanded delta
    (1/N of the width) -- the separability win over materializing
    a = exp(delta*A) and scanning the (a, b) monoid.
    """
    T, L, d_blk = delta.shape
    N = At.shape[1]
    trel = _group_rel_cumsum(delta, q)
    S = jnp.concatenate(
        [trel * At[:, n:n + 1, :] for n in range(N)], axis=-1)
    Sc = jnp.clip(S, -_CLIP, _CLIP)
    P = jnp.exp(Sc)
    if "pinv" in _ABLATE:
        return P, P
    if _PINV_MODE == "exp":
        return P, jnp.exp(-Sc)
    return P, 1.0 / P


def _cumsum_scan(delta: jax.Array, At: jax.Array, b: jax.Array, q: int,
                 h0: jax.Array, parts=None, return_parts: bool = False,
                 ga: jax.Array | None = None,
                 Zpre: jax.Array | None = None):
    """Log-space inclusive scan of x_l = a_l x_{l-1} + b_l with
    a = exp(delta*A) and x_{-1} = h0 (the chunk carry, (T, 1, F)), along
    axis -2. Only ONE expanded array (Z = b * exp(-S)) is scanned, with a
    plain add-cumsum; groups of q rows are rescaled independently and
    combined with the overflow-free (a, b) monoid on 1/q-size carries.
    The carry is injected at GROUP level (a (T, G, F) fma) and the P-fold
    happens once -- vs the previous a_cum materialization + F-wide fma
    epilogue this saves three expanded-width VPU passes per chunk.
    `parts` lets a caller share one (P, Pinv) computation across scans.
    `Zpre` (FM_SCAN_FUSE) supplies the pre-scaled Z = b * exp(-S) directly
    (built fused per-n by the kernel), in which case `b` and parts[1] are
    not read -- the forward then never materializes Pinv.

    With return_parts=True also returns the PRE-RESCALE pieces the backward
    kernel's daa factorization needs: (x, W4, prev_x) where x = P4 * W4
    (W4 rank-4 (T, G, q, F)) and prev_x (T, G, F) is the state entering
    each group (h0 for group 0).
    """
    T, L, F = (b if Zpre is None else Zpre).shape
    G = L // q
    P, Pinv = parts or _rescaled_group_parts(delta, At, q)
    Z4 = (Zpre if Zpre is not None else b * Pinv).reshape(T, G, q, F)
    P4 = P.reshape(T, G, q, F)
    csum = _cumsum_ax(Z4, q)
    if G == 1:
        W4 = csum + h0[:, :, None, :]
        x = (P4 * W4).reshape(T, L, F)
        if return_parts:
            return x, W4, h0
        return x
    if ga is None:
        ga = _take_row(P4, q - 1)                        # group a-products
    # group-local end state = P_end * csum_end (the deferred P-fold)
    gx = ga * _take_row(csum, q - 1)
    gb = jnp.concatenate([gx[:, :1] + ga[:, :1] * h0, gx[:, 1:]], axis=1)
    _, gX = _doubling_scan(ga, gb)                       # over G (1/q size)
    prev_x = jnp.concatenate([h0, gX[:, : G - 1, :]], axis=1)
    W4 = csum + prev_x[:, :, None, :]
    x = (P4 * W4).reshape(T, L, F)
    if return_parts:
        return x, W4, prev_x
    return x


def _cumsum_scan_rev(delta: jax.Array, At: jax.Array, src: jax.Array,
                     q: int, gc: jax.Array, parts=None,
                     return_parts: bool = False,
                     ga: jax.Array | None = None,
                     Vpre: jax.Array | None = None):
    """Log-space reverse scan r_l = src_l + a_{l+1} r_{l+1}, seeded with
    r_L = gc (the carry from the chunk to the right, (T, 1, F), already
    multiplied by its leading a). Carry injection rides the group-level
    chain -- vs the previous a_cum_rev materialization + F-wide fma this
    saves four expanded-width VPU passes per chunk.

    With return_parts=True also returns G2 (rank-4 (T, G, q, F)) with
    r = Pinv4 * G2 -- the pre-rescale adjoint the backward's daa
    factorization consumes. `Vpre` (FM_SCAN_FUSE) supplies the pre-scaled
    src * P directly (built fused per-n by the kernel), in which case
    `src` is not read."""
    T, L, F = (src if Vpre is None else Vpre).shape
    G = L // q
    P, Pinv = parts or _rescaled_group_parts(delta, At, q)
    P4 = P.reshape(T, G, q, F)
    Pinv4 = Pinv.reshape(T, G, q, F)
    V4 = _cumsum_ax((Vpre if Vpre is not None else src * P).reshape(
        T, G, q, F), q, up=True)
    if ga is None:
        ga = _take_row(P4, q - 1)
    if G == 1:
        G2 = V4 + (ga * gc)[:, :, None, :]
        r = (Pinv4 * G2).reshape(T, L, F)
        if return_parts:
            return r, G2
        return r
    # carry entering group g at its end: C_g = u_{g+1} + ga_{g+1} C_{g+1}
    # with C_{G-1} = gc; u_g = sum_{s in g} exp(S_s) src_s is exactly row 0
    # of V4 (one row extract, avoids the P*Pinv rounding)
    u = _take_row(V4, 0)
    b_g = jnp.concatenate([u[:, 1:, :], gc], axis=1)
    a_next = jnp.concatenate([ga[:, 1:, :], jnp.ones((T, 1, F), ga.dtype)],
                             axis=1)
    _, C = _doubling_scan_rev(a_next, b_g)
    G2 = V4 + (ga * C)[:, :, None, :]
    r = (Pinv4 * G2).reshape(T, L, F)
    if return_parts:
        return r, G2
    return r


def _doubling_scan_rev(a_next: jax.Array, b: jax.Array):
    """Reverse inclusive scan r_l = b_l + a_next_l * r_{l+1}, r_L = 0, along
    axis -2 -- the adjoint recurrence, via shift-UP doubling (no lax.rev).

    Returns (a_cum_rev, r): a_cum_rev_l = prod_{i=l..L-1} a_next_i (the
    coefficient for injecting the right-side carry), r the zero-init scan.
    """
    L = a_next.shape[-2]
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

def _delta_raw_from_refs(dt_ref, Wt_ref, lowrank: bool) -> jax.Array:
    """(T, L_CHUNK, D_BLK) raw dt (pre-bias/softplus), fp32.

    lowrank=True is the MambaInnerFn-scope prologue fusion
    (`selective_scan_interface.py:161-358`): dt_ref holds the LOW-RANK
    (T, L_CHUNK, R) dt_proj input and Wt_ref the (T, R, D_BLK) slice of the
    dt projection; the expansion to D runs here on the MXU, so the full
    (B, K, L, D) dt tensor never exists in HBM. The dot overlaps the
    kernel's VPU passes; fp32 accumulation."""
    if not lowrank:
        return dt_ref[:].astype(jnp.float32)
    dtr = dt_ref[:]                            # (T, L_CHUNK, R)
    Wt = Wt_ref[:]                             # (T, R, D_BLK)
    # bf16 inputs take one MXU pass with fp32 accumulation -- numerically
    # identical to the XLA einsum this fusion replaces (bf16 operands under
    # mixed precision). fp32 inputs use HIGHEST (true-fp32 multi-pass):
    # Mosaic's DEFAULT f32 dot is bf16-grade, a silent precision regression
    # vs the einsum for fp32 workflows, and these dots are tiny (K = R
    # <= 48) so the extra passes are noise.
    prec = jax.lax.Precision.DEFAULT
    if dtr.dtype != Wt.dtype or dtr.dtype == jnp.float32:
        dtr = dtr.astype(jnp.float32)
        Wt = Wt.astype(jnp.float32)
        prec = jax.lax.Precision.HIGHEST
    return jnp.stack([
        jax.lax.dot(dtr[t], Wt[t], precision=prec,
                    preferred_element_type=jnp.float32)
        for t in range(dtr.shape[0])])


def _fwd_kernel(
    u_ref, dt_ref, Wt_ref, At_ref, B_ref, C_ref, D_ref, bias_ref,
    out_ref, hsave_ref,
    *rest,
    N: int, delta_softplus: bool, has_D: bool, has_bias: bool,
    lowrank: bool, emit_margin: bool = False,
):
    # emit_margin adds a third output BETWEEN hsave and the scratch: the
    # per-cell saturation margin (run-then-repair adaptive dispatch)
    if emit_margin:
        margin_ref, h_carry = rest
    else:
        (h_carry,) = rest
    l_idx = pl.program_id(2)

    @pl.when(l_idx == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    # I/O may be bf16; all math is fp32 (converts are VPU-local, free of
    # HBM cost -- the blocks are already resident in VMEM)
    delta = _delta_raw_from_refs(dt_ref, Wt_ref, lowrank)
    if has_bias:
        delta = delta + bias_ref[:]            # (T, 1, D_BLK)
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    u = u_ref[:].astype(jnp.float32)
    du = delta * u

    # save the incoming flat carry row for the backward recompute
    hsave_ref[:, 0, 0] = h_carry[:]
    h0 = h_carry[:]                            # (T, 1, N*D_BLK)

    At = At_ref[:]                             # (T, N, D_BLK)
    d_blk = delta.shape[-1]
    mm = _EXPAND_MODE == "mm"

    q = _cumsum_q(delta.shape[-2])

    if emit_margin:
        # the exact quantity the rescale clips: max |A_n| * group-cumsum of
        # delta. Post-softplus delta is >= 0, so the inclusive group cumsum
        # is monotone and its max is the LAST row of each group -- one row
        # extract per group instead of a full-volume reduce (the naive
        # max-over-(T,L,D) emission measured +0.18 ms/call on stage 1).
        # q=None shapes run the doubling scan (margin moot) -- emit 0.
        if q and delta_softplus:
            trel_m = _group_rel_cumsum(delta, q)
            Tm, Lm, dm = trel_m.shape
            gsum = _take_row(trel_m.reshape(Tm, Lm // q, q, dm), q - 1)
            mval = jnp.max(gsum * jnp.max(jnp.abs(At), axis=1,
                                          keepdims=True))
        elif q:
            trel_m = _group_rel_cumsum(delta, q)
            mval = jnp.max(jnp.abs(trel_m)
                           * jnp.max(jnp.abs(At), axis=1, keepdims=True))
        else:
            mval = jnp.float32(0.0)
        margin_ref[:] = jnp.full(margin_ref.shape, mval, jnp.float32)

    def _fused_cumsum_x(trel):
        # fused build x rescale: Z_n = du*B_n*exp(-s_n) and P_n = exp(s_n)
        # built per-n inside the concats -- S, b, Pinv never materialize
        # at expanded width (see _FUSE)
        Bc = B_ref[:].astype(jnp.float32)      # (T, L_CHUNK, N)
        Ps, Zs = [], []
        for n in range(N):
            s = jnp.clip(trel * At[:, n:n + 1, :], -_CLIP, _CLIP)
            Ps.append(jnp.exp(s))
            Zs.append(du * Bc[:, :, n:n + 1] * jnp.exp(-s))
        P = jnp.concatenate(Ps, axis=-1)
        return _cumsum_scan(delta, At, None, q, h0, parts=(P, None),
                            Zpre=jnp.concatenate(Zs, axis=-1))

    def _concat_b():
        Bc = B_ref[:].astype(jnp.float32)      # (T, L_CHUNK, N)
        return jnp.concatenate(
            [du * Bc[:, :, n:n + 1] for n in range(N)], axis=-1)

    def _doubling_x(b):
        a = jnp.exp(jnp.concatenate(
            [delta * At[:, n:n + 1, :] for n in range(N)], axis=-1))
        a_cum, x = _doubling_scan(a, b)        # (T, L_CHUNK, N*D_BLK)
        return x + a_cum * h0                  # inject flat carry row

    if _algo() == "adaptive_cell" and q and not mm and not _ABLATE:
        # per-cell regime selection (see the "adaptive" note at _SCAN_ALGO):
        # margin bounds every |S| the rescale would clip, on the UNEXPANDED
        # (T, L, D_BLK) width (one multiply + reduce)
        trel = _group_rel_cumsum(delta, q)
        margin = jnp.max(jnp.abs(trel)
                         * jnp.max(jnp.abs(At), axis=1, keepdims=True))
        if _fuse_on(delta.shape[-2]):
            x = jax.lax.cond(_adaptive_pred(margin),
                             lambda: _fused_cumsum_x(trel),
                             lambda: _doubling_x(_concat_b()))
        else:
            b = _concat_b()                    # shared by both branches
            x = jax.lax.cond(_adaptive_pred(margin),
                             lambda: _cumsum_scan(delta, At, b, q, h0),
                             lambda: _doubling_x(b))
        h_carry[:, 0:1, :] = x[:, -1:, :]
        _fwd_readout(u, x, C_ref, D_ref, out_ref, N, d_blk, mm, has_D)
        return
    # `not _ABLATE` mirrors the backward's gate: with ablation flags set the
    # fused path would dodge the stubbed stages and skew the measurement
    if q and _fuse_on(delta.shape[-2]) and not mm and not _ABLATE:
        x = _fused_cumsum_x(_group_rel_cumsum(delta, q))
        h_carry[:, 0:1, :] = x[:, -1:, :]
        _fwd_readout(u, x, C_ref, D_ref, out_ref, N, d_blk, mm, has_D)
        return
    if mm:
        b = _tile_d(du, N) * _expand_nvals(B_ref[:], d_blk)
    else:
        Bc = B_ref[:].astype(jnp.float32)      # (T, L_CHUNK, N)
        b = jnp.concatenate(
            [du * Bc[:, :, n:n + 1] for n in range(N)], axis=-1)
    if q:
        x = _cumsum_scan(delta, At, b, q, h0)
    else:
        a = jnp.exp(jnp.concatenate(
            [delta * At[:, n:n + 1, :] for n in range(N)], axis=-1))
        a_cum, x = _group_scan(a, b)           # (T, L_CHUNK, N*D_BLK)
        x = x + a_cum * h0                     # inject flat carry row
    h_carry[:, 0:1, :] = x[:, -1:, :]
    _fwd_readout(u, x, C_ref, D_ref, out_ref, N, d_blk, mm, has_D)


def _fwd_readout(u, x, C_ref, D_ref, out_ref, N, d_blk, mm, has_D):
    """y = u*D + sum_n C_n * x_n, written to out_ref."""
    if has_D:
        y = u * D_ref[:]
    else:
        y = jnp.zeros_like(u)
    if mm:
        y = y + _contract_nvals(_expand_nvals(C_ref[:], d_blk) * x, N, d_blk)
    else:
        Cc = C_ref[:].astype(jnp.float32)
        for n in range(N):
            sl = slice(n * d_blk, (n + 1) * d_blk)
            y = y + Cc[:, :, n:n + 1] * x[:, :, sl]
    out_ref[:] = y.astype(out_ref.dtype)


def _fwd_pallas(u, delta, Wt_bk, At_bk, Bmat, Cmat, Dp_bk, bias_bk,
                delta_softplus, cfg, interpret, emit_margin=False):
    """Inputs in BK-folded layouts: u/delta (BK, L, D), At_bk (BK, N, D),
    B/C (BK, L, N), Dp_bk/bias_bk (BK, 1, D).

    Lowrank mode (Wt_bk not None): delta is the LOW-RANK (BK, L, R) dt and
    Wt_bk its (BK, R, D) projection; the kernel expands it on the MXU.

    emit_margin=True additionally returns the per-grid-cell saturation
    margins (a (BK//T, n_dblk, n_lchunk, 1, 128) f32 array, every lane of a
    cell's block holding that cell's margin) -- consumed by the adaptive
    run-then-repair dispatch at ~zero cost vs the outside-kernel margin
    (which must materialize the low-rank dt through HBM)."""
    BK, L, dim = u.shape
    N = At_bk.shape[1]
    T = cfg.t_fwd
    flat = N * cfg.d_blk
    lowrank = Wt_bk is not None
    R = delta.shape[-1] if lowrank else None

    grid = (BK // T, cfg.n_dblk, cfg.n_lchunk)

    def _xld(bk, d, l):
        return (bk, l, d)

    dt_spec = (pl.BlockSpec((T, cfg.l_chunk, R),
                            lambda bk, d, l: (bk, l, 0),
                            memory_space=pltpu.VMEM) if lowrank else
               pl.BlockSpec((T, cfg.l_chunk, cfg.d_blk), _xld,
                            memory_space=pltpu.VMEM))
    wt_spec = (pl.BlockSpec((T, R, cfg.d_blk),
                            lambda bk, d, l: (bk, 0, d),
                            memory_space=pltpu.VMEM) if lowrank else
               pl.BlockSpec((T, 1, cfg.d_blk), lambda bk, d, l: (bk, 0, d),
                            memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((T, cfg.l_chunk, cfg.d_blk), _xld, memory_space=pltpu.VMEM),
        dt_spec,
        wt_spec,
        pl.BlockSpec((T, N, cfg.d_blk), lambda bk, d, l: (bk, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, cfg.l_chunk, N), lambda bk, d, l: (bk, l, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, cfg.l_chunk, N), lambda bk, d, l: (bk, l, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, cfg.d_blk), lambda bk, d, l: (bk, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, cfg.d_blk), lambda bk, d, l: (bk, 0, d),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((T, cfg.l_chunk, cfg.d_blk), _xld, memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, 1, 1, flat),
                     lambda bk, d, l: (bk, d, l, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((BK, L, dim), u.dtype),
        jax.ShapeDtypeStruct((BK, cfg.n_dblk, cfg.n_lchunk, 1, flat),
                             jnp.float32),
    ]
    if emit_margin:
        out_specs.append(
            pl.BlockSpec((T, 1, 1, 1, 128),
                         lambda bk, d, l: (bk, d, l, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((BK, cfg.n_dblk, cfg.n_lchunk, 1, 128),
                                 jnp.float32))

    kernel = functools.partial(
        _fwd_kernel, N=N, delta_softplus=delta_softplus,
        has_D=Dp_bk is not None, has_bias=bias_bk is not None,
        lowrank=lowrank, emit_margin=emit_margin,
    )
    zeros = jnp.zeros((BK, 1, dim), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((T, 1, flat), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u, delta,
      Wt_bk if lowrank else zeros,
      At_bk,
      Bmat, Cmat,
      Dp_bk if Dp_bk is not None else zeros,
      bias_bk if bias_bk is not None else zeros)
    return outs  # (out, hsave) or (out, hsave, margins)


# ----------------------------------------------------------------------------
# Backward kernel
# ----------------------------------------------------------------------------

def _bwd_kernel(
    u_ref, dt_ref, Wt_ref, At_ref, B_ref, C_ref, D_ref, bias_ref,
    hsave_ref, dy_ref,
    du_ref, ddt_ref, dW_ref, dA_ref, dB_ref, dC_ref, dD_ref, dbias_ref,
    g_carry, M_scratch=None,
    *, N: int, delta_softplus: bool, has_D: bool, has_bias: bool,
    lowrank: bool, daa_mm: bool = False,
):
    l_idx = pl.program_id(2)
    is_first_step = l_idx == 0  # maps to the LAST chunk (grid runs L reversed)

    @pl.when(is_first_step)
    def _():
        g_carry[:] = jnp.zeros_like(g_carry)
        dA_ref[:] = jnp.zeros_like(dA_ref)
        dD_ref[:] = jnp.zeros_like(dD_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        if lowrank:
            dW_ref[:] = jnp.zeros_like(dW_ref)
        if daa_mm:
            # hoisted block-diag daaA weight (see _DAA_MODE): built once
            # per (bk, d) pair, reused across the l-chunk iterations
            At_w = At_ref[:]                    # (T, N, D_BLK)
            db = At_w.shape[-1]
            eye = (jax.lax.broadcasted_iota(jnp.int32, (db, db), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (db, db), 1))
            for t in range(At_w.shape[0]):
                M_scratch[t] = jnp.concatenate(
                    [jnp.where(eye, At_w[t, n:n + 1, :], 0.0).astype(
                        jnp.bfloat16) for n in range(N)], axis=0)

    delta_raw = _delta_raw_from_refs(dt_ref, Wt_ref, lowrank)
    if has_bias:
        delta_raw = delta_raw + bias_ref[:]
    if delta_softplus:
        delta = jax.nn.softplus(delta_raw)
    else:
        delta = delta_raw
    u = u_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    du_t = delta * u

    At = At_ref[:]                             # (T, N, D_BLK)
    d_blk = delta.shape[-1]
    mm = _EXPAND_MODE == "mm"
    q = _cumsum_q(delta.shape[-2])
    fuse = bool(q) and _fuse_on(delta.shape[-2]) and not mm and not _ABLATE

    # recompute forward states within the chunk from the saved flat carry
    if mm:
        dut_t = _tile_d(du_t, N)
        dy_t = _tile_d(dy, N)
        b = dut_t * _expand_nvals(B_ref[:], d_blk)
        src = _expand_nvals(C_ref[:], d_blk) * dy_t
        Bc = B_ref[:].astype(jnp.float32)      # (T, L_CHUNK, N)
    else:
        dut_t = dy_t = None
        Bc = B_ref[:].astype(jnp.float32)
        Cc = C_ref[:].astype(jnp.float32)
        if fuse:
            b = src = None                     # built pre-scaled below
        elif "build" in _ABLATE:
            b = _tile_d(du_t, N)
            src = _tile_d(dy, N)
        else:
            b = jnp.concatenate(
                [du_t * Bc[:, :, n:n + 1] for n in range(N)], axis=-1)
            src = jnp.concatenate(
                [Cc[:, :, n:n + 1] * dy for n in range(N)], axis=-1)
    h0_flat = hsave_ref[:, 0, 0]               # (T, 1, N*D_BLK)
    gc = g_carry[:]                            # carry from chunk to right

    def _doubling_xgd(b_, src_):
        """Magnitude-exact (a, b) monoid recompute + adjoint for one cell."""
        a = jnp.exp(jnp.concatenate(
            [delta * At[:, n:n + 1, :] for n in range(N)], axis=-1))
        a_cum, x = _doubling_scan(a, b_)
        x = x + a_cum * h0_flat                # h_l for l in chunk
        single = a.shape[-2] == 1              # l_chunk == 1: the shifted
        # concats below would carry 0-sized operands (Mosaic rejects
        # 0-dim vectors; reachable since "adaptive" traces this branch
        # for EVERY shape, e.g. the tiny config's deepest stage)
        if single:
            a_next = jnp.ones_like(a)
            x_prev = h0_flat
        else:
            a_next = jnp.concatenate(
                [a[:, 1:, :], jnp.ones_like(a[:, :1, :])], axis=1)
            x_prev = jnp.concatenate([h0_flat, x[:, :-1, :]], axis=1)
        acr, g = _doubling_scan_rev(a_next, src_)
        g = g + acr * gc                       # acr_l = prod_{i>l} a_i
        gnew = a[:, :1, :] * g[:, :1, :]
        # exact daa = g * a * x_prev (see the cancellation note below)
        daa = g * x_prev * a
        return x, g, daa, gnew

    if _algo() == "adaptive_cell" and q and not mm and not _ABLATE:
        # per-cell regime selection, mirroring the forward's decision from
        # the same inputs (see the "adaptive" note at _SCAN_ALGO)
        trel = _group_rel_cumsum(delta, q)
        margin = jnp.max(jnp.abs(trel)
                         * jnp.max(jnp.abs(At), axis=1, keepdims=True))

        def _cumsum_xgd():
            if fuse:
                Ps, Pinvs, Zs, Vs = [], [], [], []
                for n in range(N):
                    s = jnp.clip(trel * At[:, n:n + 1, :], -_CLIP, _CLIP)
                    en = jnp.exp(s)
                    einv = jnp.exp(-s)
                    Ps.append(en)
                    Pinvs.append(einv)
                    Zs.append(du_t * Bc[:, :, n:n + 1] * einv)
                    Vs.append(Cc[:, :, n:n + 1] * dy * en)
                parts_ = (jnp.concatenate(Ps, axis=-1),
                          jnp.concatenate(Pinvs, axis=-1))
                Zp, Vp = (jnp.concatenate(Zs, axis=-1),
                          jnp.concatenate(Vs, axis=-1))
            else:
                parts_ = _rescaled_group_parts(delta, At, q)
                Zp = Vp = None
            Tq, Lq, Fq = parts_[0].shape
            Gq = Lq // q
            ga_sh = _take_row(parts_[0].reshape(Tq, Gq, q, Fq), q - 1)
            x, W4, prev_x = _cumsum_scan(delta, At, b, q, h0_flat, parts_,
                                         return_parts=True, ga=ga_sh,
                                         Zpre=Zp)
            g, G2 = _cumsum_scan_rev(delta, At, src, q, gc, parts_,
                                     return_parts=True, ga=ga_sh,
                                     Vpre=Vp)
            Tt, Gg, q_, Ff = G2.shape
            if q_ == 1:          # 0-sized W4 slice otherwise (Mosaic)
                Wsh = prev_x[:, :, None, :]
            else:
                Wsh = jnp.concatenate(
                    [prev_x[:, :, None, :], W4[:, :, : q_ - 1, :]], axis=2)
            daa = (G2 * Wsh).reshape(Tt, Gg * q_, Ff)
            return x, g, daa, G2[:, 0, 0:1, :]

        if fuse:
            def _exact_branch():
                b_ = jnp.concatenate(
                    [du_t * Bc[:, :, n:n + 1] for n in range(N)], axis=-1)
                src_ = jnp.concatenate(
                    [Cc[:, :, n:n + 1] * dy for n in range(N)], axis=-1)
                return _doubling_xgd(b_, src_)
        else:
            def _exact_branch():
                return _doubling_xgd(b, src)
        x, g, daa, gnew = jax.lax.cond(
            _adaptive_pred(margin), _cumsum_xgd, _exact_branch)
        g_carry[:, 0:1, :] = gnew
    elif q:
        Zpre = Vpre = None
        if fuse:
            # fused build x rescale (see _FUSE): per-n chains produce the
            # pre-scaled scan operands and both rescale parts in one go --
            # S, b, src never materialize at expanded width
            trel = _group_rel_cumsum(delta, q)
            Ps, Pinvs, Zs, Vs = [], [], [], []
            for n in range(N):
                s = jnp.clip(trel * At[:, n:n + 1, :], -_CLIP, _CLIP)
                en = jnp.exp(s)
                einv = jnp.exp(-s)
                Ps.append(en)
                Pinvs.append(einv)
                Zs.append(du_t * Bc[:, :, n:n + 1] * einv)
                Vs.append(Cc[:, :, n:n + 1] * dy * en)
            parts = (jnp.concatenate(Ps, axis=-1),
                     jnp.concatenate(Pinvs, axis=-1))
            Zpre = jnp.concatenate(Zs, axis=-1)
            Vpre = jnp.concatenate(Vs, axis=-1)
        else:
            parts = _rescaled_group_parts(delta, At, q)  # shared: both scans
        if "parts" in _ABLATE:
            parts = (jnp.ones_like(b), jnp.ones_like(b))
        # group decay products shared by the recompute and reverse scans
        Tq, Lq, Fq = parts[0].shape
        Gq = Lq // q
        P4s = parts[0].reshape(Tq, Gq, q, Fq)
        ga_sh = _take_row(P4s, q - 1)
        if "recompute" in _ABLATE:
            x = b
            W4 = b.reshape(Tq, Gq, q, Fq)
            prev_x = ga_sh
        else:
            x, W4, prev_x = _cumsum_scan(delta, At, b, q, h0_flat, parts,
                                         return_parts=True, ga=ga_sh,
                                         Zpre=Zpre)
        # adjoint reverse scan: g_l = C_l*dy_l + a_{l+1} g_{l+1}
        if "rev" in _ABLATE:
            g = src
            G2 = src.reshape(Tq, Gq, q, Fq)
        else:
            g, G2 = _cumsum_scan_rev(delta, At, src, q, gc, parts,
                                     return_parts=True, ga=ga_sh,
                                     Vpre=Vpre)
        # daa = g * a * x_prev with the group rescales cancelled
        # ALGEBRAICALLY: within a group a_l = P_l Pinv_{l-1},
        # x_{l-1} = P_{l-1} W_{l-1} and g_l = Pinv_l G2_l, so
        # daa_l = G2_l * W_{l-1} exactly -- no a materialization (saves a
        # shift+mul), no P*Pinv rounding, and no cancellation (a pure
        # product, unlike the rejected g*(x-b) shortcut). At group starts
        # W_{l-1} is the state entering the group (prev_x); at the chunk
        # head a_0 g_0 = G2_0 directly (P_0 = a_0), which also serves as
        # the outgoing gradient carry.
        Tt, Gg, q_, Ff = G2.shape
        if "daa" in _ABLATE:
            daa = G2.reshape(Tt, Gg * q_, Ff)
        elif q_ == 1:            # 0-sized W4 slice otherwise (Mosaic)
            daa = (G2 * prev_x[:, :, None, :]).reshape(Tt, Gg * q_, Ff)
        else:
            Wsh = jnp.concatenate(
                [prev_x[:, :, None, :], W4[:, :, : q_ - 1, :]], axis=2)
            daa = (G2 * Wsh).reshape(Tt, Gg * q_, Ff)
        g_carry[:, 0:1, :] = G2[:, 0, 0:1, :]
    else:
        a = jnp.exp(jnp.concatenate(
            [delta * At[:, n:n + 1, :] for n in range(N)], axis=-1))
        a_cum, x = _group_scan(a, b)
        x = x + a_cum * h0_flat                # h_l for l in chunk
        if a.shape[-2] == 1:                   # see _doubling_xgd's note
            a_next = jnp.ones_like(a)
            x_prev = h0_flat
        else:
            a_next = jnp.concatenate(
                [a[:, 1:, :], jnp.ones_like(a[:, :1, :])], axis=1)
            x_prev = jnp.concatenate([h0_flat, x[:, :-1, :]], axis=1)
        acr, g = _group_scan_rev(a_next, src)
        g = g + acr * gc                       # acr_l = prod_{i>l} a_i  # h_{l-1}
        g_carry[:, 0:1, :] = a[:, :1, :] * g[:, :1, :]
        # the backward needs the exact daa = g * a * x_prev -- the algebraic
        # shortcut g * (x - b) loses significance when |a*x_prev| << |b|
        # (catastrophic cancellation in the dA/ddelta accumulations)
        daa = g * x_prev * a                   # dL/da_l * a_l

    if has_D:
        du_acc = dy * D_ref[:]
        dD_ref[:] += jnp.sum(dy * u, axis=1, keepdims=True)
    else:
        du_acc = jnp.zeros_like(u)
    # per-state-n loop; all concatenates below take FRESH computed values --
    # Mosaic rejects concats whose operands are raw slices carrying a
    # sublane/lane offset ("result/input offset mismatch on non-concat
    # dimension"), which is also why ddelta's A term is computed per-n
    # instead of against a concatenated A row.
    # ddelta = sum_n daa_n*A_n + u * sum_n g_n*B_n and
    # du    += delta * sum_n g_n*B_n share the factor gB = sum_n g_n*B_n:
    # accumulating gB/daaA once and multiplying by u/delta OUTSIDE the loop
    # saves ~4N expanded-width VPU passes vs the naive per-n products.
    gB = jnp.zeros_like(u)          # sum_n g_n * B_n       (T, L, D_BLK)
    daaA = jnp.zeros_like(u)        # sum_n daa_n * A_n
    dA_parts, dB_parts, dC_parts = [], [], []
    # per-n graddot products built inside the SAME loop that slices g/daa
    # for gB/daaA: concat of FRESH multiplies (Mosaic-legal) replaces the
    # three F-wide _tile_d copies the MXU contractions used to consume
    prodA_parts, prodB_parts, prodC_parts = [], [], []
    grad_mm = _GRAD_MM_MODE != "off"
    # the hoisted-M daaA dot replaces the loop accumulation only where the
    # bf16-dot gradient policy is already in force (grad_mm) and the loop
    # actually runs
    daa_dot = (daa_mm and grad_mm and "loop" not in _ABLATE
               and _NLOOP_MODE != "mm")
    if "loop" in _ABLATE:
        gB = g[:, :, :d_blk]
        daaA = daa[:, :, :d_blk]
    elif _NLOOP_MODE == "mm" and grad_mm:
        # n-contractions on the MXU: one F-wide multiply against the
        # lane-broadcast B/A expansions + one exact block-ones dot each,
        # instead of N lane-offset slices of g/daa (relayout copies) with
        # 4N d_blk-wide VPU fma passes
        ones_u = jnp.ones_like(u)
        B_exp = jnp.concatenate(
            [ones_u * Bc[:, :, n:n + 1] for n in range(N)], axis=-1)
        A_exp = jnp.concatenate(
            [ones_u * At[:, n:n + 1, :] for n in range(N)], axis=-1)
        gB = _contract_nvals(g * B_exp, N, d_blk)
        daaA = _contract_nvals(daa * A_exp, N, d_blk)
    else:
        for n in range(N):
            sl = slice(n * d_blk, (n + 1) * d_blk)
            gn = g[:, :, sl]
            daan = daa[:, :, sl]
            gB = gB + gn * Bc[:, :, n:n + 1]
            if not daa_dot:
                daaA = daaA + daan * At[:, n:n + 1, :]
            if grad_mm:
                prodA_parts.append(daan * delta)
                prodB_parts.append(gn * du_t)
                prodC_parts.append(x[:, :, sl] * dy)
            else:
                dA_parts.append(
                    jnp.sum(daan * delta, axis=1, keepdims=True))
                dB_parts.append(jnp.sum(gn * du_t, axis=2, keepdims=True))
                dC_parts.append(
                    jnp.sum(x[:, :, sl] * dy, axis=2, keepdims=True))
    if daa_dot:
        daaA = jnp.stack([
            jax.lax.dot(daa[t].astype(jnp.bfloat16), M_scratch[t],
                        preferred_element_type=jnp.float32)
            for t in range(daa.shape[0])])
    ddelta = daaA + u * gB
    du_acc = du_acc + delta * gB
    if "graddots" in _ABLATE:
        dA_ref[:, :, 0] += daa[:, 0:1, :]
        dB_ref[:, 0] = g[:, :, 0:N]
        dC_ref[:, 0] = x[:, :, 0:N]
    elif grad_mm:
        # dA_{nd} = sum_l daa_{l,nd} * delta_{l,d}: the per-n products from
        # the loop above concatenated F-wide + an MXU ones-row column sum,
        # instead of N cross-sublane reduce trees (log2(L) sublane passes
        # each)
        if prodA_parts:
            prodA = jnp.concatenate(prodA_parts, axis=-1)
        else:  # NLOOP=mm path did not run the per-n loop
            prodA = daa * _tile_d(delta, N)
        dA_acc = jnp.stack(
            [_grad_colsum_dot(prodA[t])[0] for t in range(prodA.shape[0])])
        dA_ref[:, :, 0] += dA_acc[:, None]
    else:
        dA_ref[:, :, 0] += jnp.concatenate(dA_parts, axis=-1)
    if "graddots" in _ABLATE:
        pass  # dB/dC already written above
    elif grad_mm:
        # dB_{l,n} = sum_d g_{l,nd} du_{l,d} (and dC likewise with x, dy)
        # as ONE F-wide multiply + an MXU block-ones dot per BK-tile row,
        # instead of N cross-lane reduce sequences (~log2(d_blk) F-wide
        # VPU passes each). blockones[f, n] = 1 iff f // d_blk == n; it is
        # exact in bf16, so only the product term carries dot rounding
        # (mode-dependent -- see _GRAD_MM_MODE).
        T = g.shape[0]
        flatF = N * d_blk
        if prodB_parts:
            prodB = jnp.concatenate(prodB_parts, axis=-1)
            prodC = jnp.concatenate(prodC_parts, axis=-1)
        else:
            prodB = g * (dut_t if dut_t is not None
                         else jnp.concatenate([du_t] * N, axis=-1))
            prodC = x * (dy_t if dy_t is not None
                         else jnp.concatenate([dy] * N, axis=-1))
        fblk = jax.lax.broadcasted_iota(jnp.int32, (flatF, N), 0) // d_blk
        ncol = jax.lax.broadcasted_iota(jnp.int32, (flatF, N), 1)
        blockones = (fblk == ncol).astype(
            jnp.bfloat16 if _GRAD_MM_MODE == "hilo" else jnp.float32)
        dB_ref[:, 0] = jnp.stack(
            [_grad_block_dot(prodB[t], blockones) for t in range(T)])
        dC_ref[:, 0] = jnp.stack(
            [_grad_block_dot(prodC[t], blockones) for t in range(T)])
    else:
        dB_ref[:, 0] = jnp.concatenate(dB_parts, axis=-1)
        dC_ref[:, 0] = jnp.concatenate(dC_parts, axis=-1)

    if delta_softplus:
        ddelta = ddelta * jax.nn.sigmoid(delta_raw)
    if has_bias:
        dbias_ref[:] += jnp.sum(ddelta, axis=1, keepdims=True)
    du_ref[:] = du_acc.astype(du_ref.dtype)
    if lowrank:
        # chain ddelta back through the in-kernel dt expansion: the full
        # (B, K, L, D) ddelta never reaches HBM -- only the low-rank
        # d_dtr per-d-block partials and the dW accumulator do. fp32
        # workflows (ddt output dtype f32) get true-fp32 dots; the bf16
        # operating point keeps the single-pass default (its partials are
        # cast to bf16 on write anyway).
        bprec = (jax.lax.Precision.HIGHEST if ddt_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
        Wt = Wt_ref[:].astype(jnp.float32)     # (T, R, D_BLK)
        dtr = dt_ref[:].astype(jnp.float32)    # (T, L_CHUNK, R)
        ddtr = jnp.stack([
            jax.lax.dot_general(
                ddelta[t], Wt[t], (((1,), (1,)), ((), ())),
                precision=bprec, preferred_element_type=jnp.float32)
            for t in range(ddelta.shape[0])])  # (T, L_CHUNK, R)
        dWp = jnp.stack([
            jax.lax.dot_general(
                ddelta[t], dtr[t], (((0,), (0,)), ((), ())),
                precision=bprec, preferred_element_type=jnp.float32)
            for t in range(ddelta.shape[0])])  # (T, D_BLK, R)
        ddt_ref[:, 0] = ddtr.astype(ddt_ref.dtype)
        dW_ref[:] += dWp
    else:
        ddt_ref[:] = ddelta.astype(ddt_ref.dtype)


def _bwd_pallas(res, dy, *, delta_softplus, cfg, interpret):
    (u, delta, Wt_bk, At_bk, Bmat, Cmat, Dp_bk, bias_bk, hsave) = res
    BK, L, dim = u.shape
    N = At_bk.shape[1]
    T = cfg.t_bwd
    flat = N * cfg.d_blk
    has_D = Dp_bk is not None
    has_bias = bias_bk is not None
    lowrank = Wt_bk is not None
    R = delta.shape[-1] if lowrank else None

    grid = (BK // T, cfg.n_dblk, cfg.n_lchunk)

    def _rl(l):
        return cfg.n_lchunk - 1 - l

    def _xld(bk, d, l):
        return (bk, _rl(l), d)

    dt_spec = (pl.BlockSpec((T, cfg.l_chunk, R),
                            lambda bk, d, l: (bk, _rl(l), 0),
                            memory_space=pltpu.VMEM) if lowrank else
               pl.BlockSpec((T, cfg.l_chunk, cfg.d_blk), _xld,
                            memory_space=pltpu.VMEM))
    wt_spec = (pl.BlockSpec((T, R, cfg.d_blk),
                            lambda bk, d, l: (bk, 0, d),
                            memory_space=pltpu.VMEM) if lowrank else
               pl.BlockSpec((T, 1, cfg.d_blk), lambda bk, d, l: (bk, 0, d),
                            memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((T, cfg.l_chunk, cfg.d_blk), _xld, memory_space=pltpu.VMEM),
        dt_spec,
        wt_spec,
        pl.BlockSpec((T, N, cfg.d_blk), lambda bk, d, l: (bk, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, cfg.l_chunk, N), lambda bk, d, l: (bk, _rl(l), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, cfg.l_chunk, N), lambda bk, d, l: (bk, _rl(l), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, cfg.d_blk), lambda bk, d, l: (bk, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, cfg.d_blk), lambda bk, d, l: (bk, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, 1, 1, flat),
                     lambda bk, d, l: (bk, d, _rl(l), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, cfg.l_chunk, cfg.d_blk), _xld, memory_space=pltpu.VMEM),
    ]
    # ddt output: full (BK, L, D) normally; per-d-block LOW-RANK partials
    # (BK, n_dblk, L, R) in lowrank mode (summed over n_dblk outside). The
    # dW accumulator output only carries data in lowrank mode (the dummy
    # is never written -- discarded by the caller).
    ddt_spec = (pl.BlockSpec((T, 1, cfg.l_chunk, R),
                             lambda bk, d, l: (bk, d, _rl(l), 0),
                             memory_space=pltpu.VMEM) if lowrank else
                pl.BlockSpec((T, cfg.l_chunk, cfg.d_blk), _xld,
                             memory_space=pltpu.VMEM))
    # lowrank ddtr partials carry the ACTIVATION dtype (they are cast to it
    # right after the n_dblk sum anyway; bf16 halves the partial write +
    # the XLA reduce's read under mixed precision)
    ddt_shape = (jax.ShapeDtypeStruct((BK, cfg.n_dblk, L, R), u.dtype)
                 if lowrank else
                 jax.ShapeDtypeStruct((BK, L, dim), u.dtype))
    dw_spec = (pl.BlockSpec((T, cfg.d_blk, R),
                            lambda bk, d, l: (bk, d, 0),
                            memory_space=pltpu.VMEM) if lowrank else
               pl.BlockSpec((T, 1, cfg.d_blk),
                            lambda bk, d, l: (bk, 0, d),
                            memory_space=pltpu.VMEM))
    dw_shape = (jax.ShapeDtypeStruct((BK, dim, R), jnp.float32) if lowrank
                else jax.ShapeDtypeStruct((BK, 1, dim), jnp.float32))
    out_specs = (
        pl.BlockSpec((T, cfg.l_chunk, cfg.d_blk), _xld, memory_space=pltpu.VMEM),
        ddt_spec,
        dw_spec,
        pl.BlockSpec((T, 1, 1, flat), lambda bk, d, l: (bk, d, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, cfg.l_chunk, N),
                     lambda bk, d, l: (bk, d, _rl(l), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, cfg.l_chunk, N),
                     lambda bk, d, l: (bk, d, _rl(l), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, cfg.d_blk), lambda bk, d, l: (bk, 0, d),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1, cfg.d_blk), lambda bk, d, l: (bk, 0, d),
                     memory_space=pltpu.VMEM),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((BK, L, dim), u.dtype),
        ddt_shape,
        dw_shape,
        jax.ShapeDtypeStruct((BK, cfg.n_dblk, 1, flat), jnp.float32),
        jax.ShapeDtypeStruct((BK, cfg.n_dblk, L, N), jnp.float32),
        jax.ShapeDtypeStruct((BK, cfg.n_dblk, L, N), jnp.float32),
        jax.ShapeDtypeStruct((BK, 1, dim), jnp.float32),
        jax.ShapeDtypeStruct((BK, 1, dim), jnp.float32),
    )

    daa_mm = _DAA_MODE == "mm"
    kernel = functools.partial(
        _bwd_kernel, N=N, delta_softplus=delta_softplus,
        has_D=has_D, has_bias=has_bias, lowrank=lowrank, daa_mm=daa_mm,
    )
    scratch = [pltpu.VMEM((T, 1, flat), jnp.float32)]
    if daa_mm:
        scratch.append(pltpu.VMEM((T, flat, cfg.d_blk), jnp.bfloat16))
    zeros = jnp.zeros((BK, 1, dim), jnp.float32)
    du, ddt, dW_p, dA_p, dB_p, dC_p, dD_p, dbias_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u, delta,
      Wt_bk if lowrank else zeros,
      At_bk, Bmat, Cmat,
      Dp_bk if has_D else zeros,
      bias_bk if has_bias else zeros,
      hsave, dy)

    if lowrank:
        ddt = jnp.sum(ddt, axis=1)  # (BK, L, R): sum the d-block partials
    return du, ddt, (dW_p if lowrank else None), dA_p, \
        jnp.sum(dB_p, axis=1), jnp.sum(dC_p, axis=1), dD_p, dbias_p


# ----------------------------------------------------------------------------
# custom_vjp wrapper (public (B, K, ...) layouts; BK folding inside)
# ----------------------------------------------------------------------------

def _fold(u, delta, A, Bmat, Cmat, Dp, bias, Wlow=None):
    B, K, L, dim = u.shape
    BK = B * K
    u_f = u.reshape(BK, L, dim)
    dt_f = delta.reshape(BK, L, -1)  # (BK, L, D) or (BK, L, R) lowrank
    At = jnp.swapaxes(A, 1, 2)                         # (K, N, dim)
    At_bk = jnp.broadcast_to(At[None], (B,) + At.shape).reshape(
        BK, *At.shape[1:])
    B_f = Bmat.reshape(BK, L, -1)
    C_f = Cmat.reshape(BK, L, -1)
    Dp_bk = None
    bias_bk = None
    if Dp is not None:
        Dp_bk = jnp.broadcast_to(
            Dp[None, :, None, :], (B, K, 1, dim)).reshape(BK, 1, dim)
    if bias is not None:
        bias_bk = jnp.broadcast_to(
            bias[None, :, None, :], (B, K, 1, dim)).reshape(BK, 1, dim)
    Wt_bk = None
    if Wlow is not None:
        # keeps Wlow's dtype (the kernels convert to fp32 in VMEM) so the
        # dW cotangent dtype can match the primal under mixed precision
        Wt = jnp.swapaxes(Wlow, 1, 2)                  # (K, R, dim)
        Wt_bk = jnp.broadcast_to(Wt[None], (B,) + Wt.shape).reshape(
            BK, *Wt.shape[1:])
    return u_f, dt_f, Wt_bk, At_bk, B_f, C_f, Dp_bk, bias_bk


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _scan_pallas_core(u, delta, A, Bmat, Cmat, Dp, bias, Wlow,
                      delta_softplus, interpret, algo):
    out, _ = _core_fwd(u, delta, A, Bmat, Cmat, Dp, bias, Wlow,
                       delta_softplus, interpret, algo)
    return out


def _algo_ctx(algo):
    """Static per-call algorithm override (None = module default). Applied
    around BOTH kernel constructions -- the backward is traced lazily, so
    a caller-side context would cover only the forward."""
    return force_scan_algo(algo) if algo else contextlib.nullcontext()


def _core_fwd(u, delta, A, Bmat, Cmat, Dp, bias, Wlow, delta_softplus,
              interpret, algo):
    B, K, L, dim = u.shape
    N = A.shape[-1]
    with _algo_ctx(algo):
        cfg = _pick_blocks(L, dim, B * K, N)
        folded = _fold(u, delta, A, Bmat, Cmat, Dp, bias, Wlow)
        out, hsave = _fwd_pallas(*folded, delta_softplus, cfg, interpret)
    return out.reshape(B, K, L, dim), (folded, hsave, (B, K, L, dim))


def _core_bwd(delta_softplus, interpret, algo, res, dy):
    folded, hsave, (B, K, L, dim) = res
    lowrank = folded[2] is not None
    N = folded[3].shape[1]
    with _algo_ctx(algo):
        cfg = _pick_blocks(L, dim, B * K, N)
        du, ddt, dW_p, dA_p, dB, dC, dD_p, dbias_p = _bwd_pallas(
            folded + (hsave,), dy.reshape(B * K, L, dim),
            delta_softplus=delta_softplus, cfg=cfg, interpret=interpret)
    has_D = folded[6] is not None
    has_bias = folded[7] is not None
    du = du.reshape(B, K, L, dim)
    ddt = ddt.reshape(B, K, L, -1).astype(folded[1].dtype)
    # dA_p: (BK, n_dblk, 1, N*d_blk) flat n-major within each d-block
    dA = dA_p.reshape(B, K, cfg.n_dblk, N, cfg.d_blk).sum(axis=0)
    dA = dA.transpose(0, 1, 3, 2).reshape(K, dim, N)
    dB = dB.reshape(B, K, L, N).astype(folded[4].dtype)
    dC = dC.reshape(B, K, L, N).astype(folded[5].dtype)
    dD = dD_p.reshape(B, K, dim).sum(axis=0) if has_D else None
    dbias = dbias_p.reshape(B, K, dim).sum(axis=0) if has_bias else None
    dW = None
    if lowrank:
        # dW_p: (BK, dim, R) -> (K, dim, R) summed over batch; cotangent
        # dtype matches the primal weight (folded[2] kept Wlow's dtype)
        dW = dW_p.reshape(B, K, dim, -1).sum(axis=0).astype(folded[2].dtype)
    return (du, ddt, dA, dB, dC, dD, dbias, dW)


_scan_pallas_core.defvjp(
    lambda *a: _core_fwd(*a),
    _core_bwd,
)


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
    dt_lowrank_weight: jax.Array | None = None,
    algo: str | None = None,
):
    """dt_lowrank_weight (K, dim, R): when given, `delta` is the LOW-RANK
    (B, K, L, R) dt_proj input and the expansion delta = dtr @ W^T runs
    INSIDE the kernel on the MXU (prologue fusion a la MambaInnerFn,
    `selective_scan_interface.py:161-358`) -- the (B, K, L, dim) dt tensor
    never exists in HBM in either direction; the backward emits low-rank
    d_dtr and the dW_dt gradient directly.

    algo: per-call intra-chunk algorithm override (None = FM_SCAN_ALGO
    module default); "doubling" is the magnitude-exact tier the saturation
    auto-fallback selects."""
    if return_last_state:
        raise NotImplementedError(
            "return_last_state is served by the ref/assoc implementations")
    # u/delta/B/C keep their dtype (bf16 I/O halves the kernel's HBM
    # traffic; the kernels convert to fp32 in VMEM and do ALL math in fp32,
    # matching the reference's fp32-in-kernel policy, `models/cross.py:239`);
    # A/D/delta_bias are parameters and stay fp32
    in_dtype = u.dtype
    out = _scan_pallas_core(
        u, delta.astype(in_dtype),
        A.astype(jnp.float32), Bmat.astype(in_dtype),
        Cmat.astype(in_dtype),
        None if D is None else D.astype(jnp.float32),
        None if delta_bias is None else delta_bias.astype(jnp.float32),
        dt_lowrank_weight,
        delta_softplus, interpret, algo,
    )
    return out.astype(in_dtype)


# ----------------------------------------------------------------------------
# Adaptive run-then-repair wrapper (impl="adaptive" on the TPU path)
# ----------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _scan_adaptive_core(u, delta, A, Bmat, Cmat, Dp, bias, Wlow,
                        delta_softplus, interpret):
    out, margin, _ = _adaptive_fwd(u, delta, A, Bmat, Cmat, Dp, bias, Wlow,
                                   delta_softplus, interpret)
    return out, margin


def _adaptive_fwd(u, delta, A, Bmat, Cmat, Dp, bias, Wlow, delta_softplus,
                  interpret):
    """Run the FAST (library-default cumsum_mm) forward unconditionally with
    the per-cell margin emitted by the kernel itself (no HBM materialization
    of the low-rank dt), then repair: one on-device cond re-running ONLY the
    tripped case through the magnitude-exact doubling forward. The backward
    conds on the saved decision and runs exactly ONE kernel. Costs vs the
    plain fast path when safe: one in-kernel unexpanded-width margin pass +
    a tiny reduce + the cond boundary. When tripped: the wasted fast
    forward (~35% of a doubling fwd+bwd).
    """
    B, K, L, dim = u.shape
    N = A.shape[-1]
    cfg = _pick_blocks(L, dim, B * K, N)
    folded = _fold(u, delta, A, Bmat, Cmat, Dp, bias, Wlow)
    out_f, hsave_f, margins = _fwd_pallas(*folded, delta_softplus, cfg,
                                          interpret, emit_margin=True)
    margin = jnp.max(margins)
    safe = margin < _CLIP

    def _keep():
        return out_f, hsave_f

    def _repair():
        o, h = _fwd_pallas(*folded, delta_softplus, cfg, interpret)
        return o, h

    # the repair branch must trace its kernel under the doubling algorithm;
    # cfg is shape-only, so hsave layouts match across branches (a lax.cond
    # structural requirement)
    with force_scan_algo("doubling"):
        out, hsave = jax.lax.cond(safe, _keep, _repair)
    out = out.reshape(B, K, L, dim)
    return out, margin, (folded, hsave, safe, (B, K, L, dim))


def _adaptive_bwd(delta_softplus, interpret, res, cts):
    dy, _dmargin = cts            # the margin output is observational only
    folded, hsave, safe, dims = res
    core_res = (folded, hsave, dims)
    return jax.lax.cond(
        safe,
        lambda: _core_bwd(delta_softplus, interpret, None, core_res, dy),
        lambda: _core_bwd(delta_softplus, interpret, "doubling", core_res,
                          dy))


_scan_adaptive_core.defvjp(
    lambda *a: (lambda out, margin, res: ((out, margin), res))(
        *_adaptive_fwd(*a)),
    _adaptive_bwd,
)


def selective_scan_pallas_adaptive(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    Bmat: jax.Array,
    Cmat: jax.Array,
    D: jax.Array | None = None,
    delta_bias: jax.Array | None = None,
    delta_softplus: bool = False,
    interpret: bool = False,
    dt_lowrank_weight: jax.Array | None = None,
    return_margin: bool = False,
):
    """Magnitude-exact selective scan at cumsum_mm speed: the fast kernel
    emits its own saturation margin per grid cell, and a single on-device
    cond re-runs the call through the doubling kernel only when the margin
    crossed the rescale clip (see `_adaptive_fwd`). The shipped
    scan_impl="adaptive" TPU path.

    return_margin=True also returns the scalar margin (free -- a kernel
    output), which the dispatch feeds to the saturation-guard collector so
    guard-on training skips its own margin materialization."""
    in_dtype = u.dtype
    out, margin = _scan_adaptive_core(
        u, delta.astype(in_dtype),
        A.astype(jnp.float32), Bmat.astype(in_dtype),
        Cmat.astype(in_dtype),
        None if D is None else D.astype(jnp.float32),
        None if delta_bias is None else delta_bias.astype(jnp.float32),
        dt_lowrank_weight,
        delta_softplus, interpret,
    )
    out = out.astype(in_dtype)
    return (out, margin) if return_margin else out
