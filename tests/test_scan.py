"""Selective-scan correctness: all implementations vs a NumPy golden model.

Mirrors the reference kernel-test strategy
(`mamba_ssm/ops/test_selective_scan.py:373-505`): parametrized sweep over
dtype / seqlen / has_D / has_delta_bias / delta_softplus, checking forward
outputs and every input gradient against a double-precision golden scan.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fusionmamba_tpu.ops import (
    selective_scan_assoc,
    selective_scan_pallas,
    selective_scan_ref,
)


def golden_scan_np(u, delta, A, B, C, D=None, delta_bias=None,
                   delta_softplus=False):
    """float64 NumPy sequential scan. Layout (B, K, L, D) / (K, D, N)."""
    u = u.astype(np.float64)
    delta = delta.astype(np.float64)
    A = A.astype(np.float64)
    B = B.astype(np.float64)
    C = C.astype(np.float64)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(np.float64)[None, :, None, :]
    if delta_softplus:
        delta = np.logaddexp(0.0, delta)
    batch, K, L, dim = u.shape
    N = A.shape[-1]
    h = np.zeros((batch, K, dim, N))
    ys = np.zeros((batch, K, L, dim))
    for l in range(L):
        a = np.exp(delta[:, :, l, :, None] * A[None])
        b = (delta[:, :, l, :] * u[:, :, l, :])[..., None] * B[:, :, l, None, :]
        h = a * h + b
        ys[:, :, l, :] = np.einsum("bkdn,bkn->bkd", h, C[:, :, l, :])
    if D is not None:
        ys = ys + u * D.astype(np.float64)[None, :, None, :]
    return ys


def make_inputs(rng, batch=2, K=2, L=32, dim=8, N=4, has_D=True,
                has_bias=True):
    u = rng.standard_normal((batch, K, L, dim)).astype(np.float32)
    delta = (0.5 * rng.standard_normal((batch, K, L, dim))).astype(np.float32)
    # A mirrors -exp(A_log) of the model: negative, O(1..N)
    A = -np.exp(
        rng.uniform(0.0, 1.5, (K, dim, N))
    ).astype(np.float32)
    B = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    C = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    D = rng.standard_normal((K, dim)).astype(np.float32) if has_D else None
    bias = (
        rng.standard_normal((K, dim)).astype(np.float32) if has_bias else None
    )
    return u, delta, A, B, C, D, bias


IMPLS = {
    "ref": selective_scan_ref,
    "assoc": selective_scan_assoc,
    "pallas": lambda *a, **k: selective_scan_pallas(*a, interpret=True, **k),
}


@pytest.fixture(autouse=True)
def _pin_exact_scan_path(monkeypatch):
    """This module's golden tests feed ARBITRARY-magnitude inputs (A up to
    -e^1.5, unconstrained delta), outside the |A|*sum(delta) < 60 rescale
    envelope the shipped cumsum_mm default is specified for
    (scan_pallas.py: _CLIP). Pin the exact pure-VPU doubling path here;
    the shipped default is covered at its own documented tolerance, in its
    specified init regime, by test_cumsum_algo_matches_ref_in_init_regime
    (which overrides these attrs per-test)."""
    from fusionmamba_tpu.ops import scan_pallas as sp
    monkeypatch.setattr(sp, "_SCAN_ALGO", "doubling")
    monkeypatch.setattr(sp, "_GRAD_MM_MODE", "off")


@pytest.mark.parametrize("impl", list(IMPLS))
@pytest.mark.parametrize("L", [16, 33, 64])
@pytest.mark.parametrize("has_D,has_bias,softplus", [
    (True, True, True),
    (False, False, False),
    (True, False, True),
])
def test_forward_vs_golden(impl, L, has_D, has_bias, softplus):
    if impl == "pallas" and L % 8 != 0:
        pytest.skip("pallas path requires sublane-aligned L")
    rng = np.random.default_rng(0)
    u, delta, A, B, C, D, bias = make_inputs(
        rng, L=L, has_D=has_D, has_bias=has_bias)
    want = golden_scan_np(u, delta, A, B, C, D, bias, softplus)
    got = IMPLS[impl](
        jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), None if D is None else jnp.asarray(D),
        None if bias is None else jnp.asarray(bias), softplus)
    np.testing.assert_allclose(np.asarray(got), want, rtol=6e-4, atol=2e-3)


@pytest.mark.parametrize("impl", ["assoc", "pallas"])
def test_gradients_vs_ref(impl):
    """All input grads of the fast paths match autodiff of the oracle."""
    rng = np.random.default_rng(1)
    u, delta, A, B, C, D, bias = make_inputs(
        rng, batch=1, K=2, L=24, dim=8, N=4)
    args = tuple(
        jnp.asarray(x) for x in (u, delta, A, B, C, D, bias)
    )

    def loss_with(impl_fn):
        def loss(u, delta, A, B, C, D, bias):
            out = impl_fn(u, delta, A, B, C, D, bias, True)
            # non-uniform cotangent to exercise every grad path
            w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(
                out.shape)
            return jnp.sum(out * w)
        return loss

    grads_ref = jax.grad(loss_with(selective_scan_ref),
                         argnums=tuple(range(7)))(*args)
    grads_got = jax.grad(loss_with(IMPLS[impl]),
                         argnums=tuple(range(7)))(*args)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]
    for name, g_ref, g_got in zip(names, grads_ref, grads_got):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), rtol=1e-3, atol=1e-3,
            err_msg=f"gradient mismatch for {name}")


def test_multichunk_pallas_carry():
    """L larger than one chunk: forces the cross-chunk carry path."""
    rng = np.random.default_rng(2)
    u, delta, A, B, C, D, bias = make_inputs(rng, batch=1, K=1, L=64, dim=8,
                                             N=4)
    # shrink chunk by monkeypatching the block picker
    from fusionmamba_tpu.ops import scan_pallas as sp
    orig = sp._pick_blocks
    sp._pick_blocks = (
        lambda L, D, BK, N=16, d_cap=256, l_cap=16: orig(L, D, BK, N,
                                                         d_cap, 16))
    try:
        want = golden_scan_np(u, delta, A, B, C, D, bias, True)
        got = selective_scan_pallas(
            *(jnp.asarray(x) for x in (u, delta, A, B, C)),
            jnp.asarray(D), jnp.asarray(bias), True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=6e-4,
                                   atol=2e-3)

        def loss(*args):
            out = selective_scan_pallas(*args, delta_softplus=True,
                                        interpret=True)
            return jnp.sum(out * jnp.cos(
                jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape))

        def loss_ref(*args):
            out = selective_scan_ref(*args, delta_softplus=True)
            return jnp.sum(out * jnp.cos(
                jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape))

        args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))
        g_got = jax.grad(loss, argnums=tuple(range(7)))(*args)
        g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        for name, a, b in zip(
                ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"],
                g_got, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
                err_msg=f"multichunk gradient mismatch for {name}")
    finally:
        sp._pick_blocks = orig


def test_return_last_state():
    rng = np.random.default_rng(3)
    u, delta, A, B, C, D, bias = make_inputs(rng, L=16)
    out, h = selective_scan_ref(
        *(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias)),
        delta_softplus=True, return_last_state=True)
    out2, h2 = selective_scan_assoc(
        *(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias)),
        delta_softplus=True, return_last_state=True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h2), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("impl", ["assoc", "pallas"])
def test_bf16_io(impl):
    """bf16 activations I/O, fp32 internal math (the kernels convert in
    VMEM). Tolerances follow the reference's bf16 kernel test
    (`mamba_ssm/ops/test_selective_scan.py:399-401`: rtol 3e-2 / atol 5e-2).
    """
    rng = np.random.default_rng(3)
    u, delta, A, B, C, D, bias = make_inputs(rng, batch=1, K=2, L=32, dim=8,
                                             N=4)
    want = golden_scan_np(u, delta, A, B, C, D, bias, True)

    bf = jnp.bfloat16
    got = IMPLS[impl](
        jnp.asarray(u, bf), jnp.asarray(delta, bf), jnp.asarray(A),
        jnp.asarray(B, bf), jnp.asarray(C, bf), jnp.asarray(D),
        jnp.asarray(bias), True)
    assert got.dtype == bf
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=3e-2, atol=5e-2)

    def loss(u, delta, A, B, C, D, bias):
        out = IMPLS[impl](u, delta, A, B, C, D, bias, True)
        w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(
            out.shape).astype(out.dtype)
        return jnp.sum((out * w).astype(jnp.float32))

    def loss_ref(u, delta, A, B, C, D, bias):
        out = selective_scan_ref(u, delta, A, B, C, D, bias, True)
        w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(
            out.shape)
        return jnp.sum(out * w)

    args_bf = (jnp.asarray(u, bf), jnp.asarray(delta, bf), jnp.asarray(A),
               jnp.asarray(B, bf), jnp.asarray(C, bf), jnp.asarray(D),
               jnp.asarray(bias))
    args_f32 = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))
    g_bf = jax.grad(loss, argnums=tuple(range(7)))(*args_bf)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args_f32)
    for name, gb, gr in zip(["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"],
                            g_bf, g_ref):
        np.testing.assert_allclose(
            np.asarray(gb, np.float32), np.asarray(gr, np.float32),
            rtol=5e-2, atol=8e-2, err_msg=f"bf16 gradient mismatch {name}")


@pytest.mark.tpu
@pytest.mark.parametrize("algo,mm_mode,grad_mm,q,rtol,atol", [
    ("cumsum", "hilo", "off", 16, 6e-4, 2e-3),
    ("cumsum_mm", "hilo", "off", 32, 6e-4, 2e-3),  # fp32-grade Veltkamp dots
    ("cumsum_mm", "default", "default", 32, 3e-2, 5e-2),  # the SHIPPED
    # library default (scan_pallas.py module defaults) = bench operating
    # point; tolerances = the reference's own bf16 kernel tolerances
    # (`mamba_ssm/ops/test_selective_scan.py:399-401`)
])
def test_cumsum_algo_matches_ref_in_init_regime(monkeypatch, algo, mm_mode,
                                                grad_mm, q, rtol, atol):
    """The FM_SCAN_ALGO=cumsum{,_mm} log-space rescan (scan_pallas.py) is
    exact whenever |A| * sum(delta) stays within the +-60 rescale clip per
    _CUMSUM_Q rows -- which the reference model's init guarantees (S4D
    A in [-16, -1], dt = softplus of small pre-activations with bias in
    softplus_inv([0.001, 0.1]), `models/cross.py:542-583`).

    Runs the COMPILED kernel on the default backend (not interpret mode):
    the hilo/bf16 dot modes are only meaningful where the backend actually
    computes bf16 dots, and XLA rewrites (such as the excess-precision pass
    that elides a naive hi/lo split) only fire in compiled programs."""
    from fusionmamba_tpu.ops import scan_pallas as sp
    monkeypatch.setattr(sp, "_SCAN_ALGO", algo)
    monkeypatch.setattr(sp, "_MM_MODE", mm_mode)
    monkeypatch.setattr(sp, "_GRAD_MM_MODE", grad_mm)
    monkeypatch.setattr(sp, "_CUMSUM_Q", q)
    rng = np.random.default_rng(3)
    batch, K, L, dim, N = 1, 2, 64, 128, 16
    u = rng.standard_normal((batch, K, L, dim)).astype(np.float32)
    delta = (0.3 * rng.standard_normal((batch, K, L, dim))).astype(np.float32)
    A = -np.broadcast_to(np.arange(1.0, N + 1.0), (K, dim, N)).astype(
        np.float32).copy()
    B = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    C = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    D = rng.standard_normal((K, dim)).astype(np.float32)
    dtv = np.exp(rng.uniform(np.log(1e-3), np.log(0.1), (K, dim)))
    bias = (dtv + np.log(-np.expm1(-dtv))).astype(np.float32)  # softplus^-1
    args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))

    want = golden_scan_np(u, delta, A, B, C, D, bias, True)
    got = jax.jit(
        lambda *a: selective_scan_pallas(*a, delta_softplus=True))(*args)
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol, atol=atol)

    def loss_with(impl_fn):
        def loss(*a):
            out = impl_fn(*a, delta_softplus=True)
            w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(
                out.shape)
            return jnp.sum(out * w)
        return loss

    grads_ref = jax.grad(loss_with(selective_scan_ref),
                         argnums=tuple(range(7)))(*args)
    grads_got = jax.jit(jax.grad(loss_with(selective_scan_pallas),
                                 argnums=tuple(range(7))))(*args)
    gr = max(rtol, 1e-3)
    ga = max(atol, 1e-3)
    for name, g_ref, g_got in zip(
            ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"],
            grads_ref, grads_got):
        scale = np.maximum(np.abs(np.asarray(g_ref)).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(g_got) / scale, np.asarray(g_ref) / scale,
            rtol=gr, atol=ga, err_msg=f"gradient mismatch for {name}")


@pytest.mark.smoke
def test_lowrank_dt_prologue_fusion():
    """dt passed LOW-RANK (dtr, W) with the expansion fused into the kernel
    (prologue fusion): forward and ALL grads -- including ddtr and dW --
    match the materialized-dt oracle."""
    rng = np.random.default_rng(7)
    batch, K, L, dim, N, R = 1, 2, 32, 8, 4, 3
    u, _, A, B, C, D, bias = make_inputs(rng, batch=batch, K=K, L=L,
                                         dim=dim, N=N)
    dtr = (0.5 * rng.standard_normal((batch, K, L, R))).astype(np.float32)
    W = (0.4 * rng.standard_normal((K, dim, R))).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (u, dtr, A, B, C, D, bias, W))

    def cot(out):
        return jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(
            out.shape)

    def loss_low(u, dtr, A, B, C, D, bias, W):
        out = selective_scan_pallas(u, dtr, A, B, C, D, bias, True,
                                    interpret=True, dt_lowrank_weight=W)
        return jnp.sum(out * cot(out))

    def loss_mat(u, dtr, A, B, C, D, bias, W):
        delta = jnp.einsum("bklr,kdr->bkld", dtr, W)
        out = selective_scan_ref(u, delta, A, B, C, D, bias, True)
        return jnp.sum(out * cot(out))

    v_low, g_low = jax.value_and_grad(
        loss_low, argnums=tuple(range(8)))(*args)
    v_mat, g_mat = jax.value_and_grad(
        loss_mat, argnums=tuple(range(8)))(*args)
    np.testing.assert_allclose(float(v_low), float(v_mat), rtol=1e-4)
    for name, gl, gm in zip(
            ["du", "ddtr", "dA", "dB", "dC", "dD", "dbias", "dW"],
            g_low, g_mat):
        np.testing.assert_allclose(
            np.asarray(gl), np.asarray(gm), rtol=1e-3, atol=1e-3,
            err_msg=f"lowrank gradient mismatch for {name}")


def test_lowrank_dt_multichunk_and_dispatch():
    """Low-rank dt through the public dispatch (every impl) and across the
    multi-chunk carry path: all impls agree with the materialized ref."""
    from fusionmamba_tpu.ops import scan_pallas as sp
    from fusionmamba_tpu.ops.selective_scan import selective_scan

    rng = np.random.default_rng(8)
    batch, K, L, dim, N, R = 1, 1, 64, 8, 4, 3
    u, _, A, B, C, D, bias = make_inputs(rng, batch=batch, K=K, L=L,
                                         dim=dim, N=N)
    dtr = (0.5 * rng.standard_normal((batch, K, L, R))).astype(np.float32)
    W = (0.4 * rng.standard_normal((K, dim, R))).astype(np.float32)
    ja = tuple(jnp.asarray(x) for x in (u, dtr, A, B, C, D, bias))
    jW = jnp.asarray(W)

    delta = np.einsum("bklr,kdr->bkld", dtr, W)
    want = golden_scan_np(u, delta, A, B, C, D, bias, True)

    for impl in ("ref", "assoc"):
        got = selective_scan(*ja, delta_softplus=True, impl=impl,
                             dt_lowrank_weight=jW)
        np.testing.assert_allclose(np.asarray(got), want, rtol=6e-4,
                                   atol=2e-3, err_msg=impl)

    # pallas with a small l_chunk: the low-rank dot runs per chunk and the
    # carry still matches
    orig = sp._pick_blocks
    sp._pick_blocks = (
        lambda L, D, BK, N=16, d_cap=256, l_cap=16: orig(L, D, BK, N,
                                                         d_cap, 16))
    try:
        got = selective_scan_pallas(*ja, delta_softplus=True,
                                    interpret=True, dt_lowrank_weight=jW)
        np.testing.assert_allclose(np.asarray(got), want, rtol=6e-4,
                                   atol=2e-3)
    finally:
        sp._pick_blocks = orig


@pytest.mark.tpu
def test_lowrank_dt_compiled_matches_materialized():
    """COMPILED lowrank kernel at model-like widths vs the materialized-dt
    compiled kernel (identical algorithm/default config): the prologue
    fusion must not change the shipped kernel's numerics envelope."""
    rng = np.random.default_rng(9)
    batch, K, L, dim, N = 2, 4, 256, 192, 16
    R = 6
    u = rng.standard_normal((batch, K, L, dim)).astype(np.float32)
    dtr = (0.3 * rng.standard_normal((batch, K, L, R))).astype(np.float32)
    W = (0.3 * rng.standard_normal((K, dim, R))).astype(np.float32)
    A = -np.broadcast_to(np.arange(1.0, N + 1.0), (K, dim, N)).astype(
        np.float32).copy()
    B = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    C = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    D = rng.standard_normal((K, dim)).astype(np.float32)
    dtv = np.exp(rng.uniform(np.log(1e-3), np.log(0.1), (K, dim)))
    bias = (dtv + np.log(-np.expm1(-dtv))).astype(np.float32)

    ja = tuple(jnp.asarray(x) for x in (u, dtr, A, B, C, D, bias))
    jW = jnp.asarray(W)

    def low(u, dtr, A, B, C, D, bias):
        out = selective_scan_pallas(u, dtr, A, B, C, D, bias, True,
                                    dt_lowrank_weight=jW)
        w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(
            out.shape)
        return jnp.sum(out * w), out

    def mat(u, dtr, A, B, C, D, bias):
        delta = jnp.einsum("bklr,kdr->bkld", dtr, jW)
        out = selective_scan_pallas(u, delta, A, B, C, D, bias, True)
        w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(
            out.shape)
        return jnp.sum(out * w), out

    # pin fp32 dots: the materialized arm's einsum otherwise runs at the
    # TPU DEFAULT (bf16-grade) f32 precision and its noise -- not the
    # kernel's -- decides the comparison (the in-kernel lowrank expansion
    # uses true-fp32 HIGHEST for fp32 inputs); seen as a 10/393k
    # tolerance-edge flake in r5
    with jax.default_matmul_precision("float32"):
        (v_l, out_l), g_l = jax.jit(jax.value_and_grad(
            low, argnums=tuple(range(7)), has_aux=True))(*ja)
        (v_m, out_m), g_m = jax.jit(jax.value_and_grad(
            mat, argnums=tuple(range(7)), has_aux=True))(*ja)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_m),
                               rtol=2e-3, atol=2e-3)
    for name, gl, gm in zip(
            ["du", "ddtr", "dA", "dB", "dC", "dD", "dbias"], g_l, g_m):
        sc = np.maximum(np.abs(np.asarray(gm)).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(gl) / sc, np.asarray(gm) / sc, rtol=2e-3, atol=2e-3,
            err_msg=f"compiled lowrank grad mismatch {name}")


def test_daa_mm_backward_variant(monkeypatch):
    """FM_SCAN_DAA=mm (hoisted block-diag daaA dot): gradients match the
    oracle at the bf16-dot tolerance (active only under the grad_mm
    policy; exact mode falls back to the loop)."""
    from fusionmamba_tpu.ops import scan_pallas as sp
    # doubling: exact scan for these arbitrary-magnitude inputs (the
    # cumsum family would saturate its rescale clip here); the only
    # approximation under test is the daaA bf16 dot itself
    monkeypatch.setattr(sp, "_SCAN_ALGO", "doubling")
    monkeypatch.setattr(sp, "_GRAD_MM_MODE", "default")
    monkeypatch.setattr(sp, "_DAA_MODE", "mm")
    rng = np.random.default_rng(11)
    u, delta, A, B, C, D, bias = make_inputs(
        rng, batch=1, K=2, L=32, dim=8, N=4)
    args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))

    def loss_with(impl_fn):
        def loss(*a):
            out = impl_fn(*a, delta_softplus=True)
            w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(
                out.shape)
            return jnp.sum(out * w)
        return loss

    g_ref = jax.grad(loss_with(selective_scan_ref),
                     argnums=tuple(range(7)))(*args)
    g_got = jax.grad(loss_with(
        lambda *a, **k: selective_scan_pallas(*a, interpret=True, **k)),
        argnums=tuple(range(7)))(*args)
    for name, a, b in zip(
            ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"],
            g_got, g_ref):
        sc = np.maximum(np.abs(np.asarray(b)).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / sc, np.asarray(b) / sc, rtol=3e-2, atol=5e-3,
            err_msg=f"daa_mm grad mismatch {name}")


def test_pallas_exact_impl_overrides_saturating_default(monkeypatch):
    """impl="pallas_exact"/"auto_exact": per-call doubling override stays
    exact on inputs far OUTSIDE the cumsum rescale envelope (the
    saturation-guard auto-fallback path), fwd and grads, while the module
    default is left at the shipped cumsum_mm."""
    from fusionmamba_tpu.ops import scan_pallas as sp
    from fusionmamba_tpu.ops.selective_scan import selective_scan
    monkeypatch.setattr(sp, "_SCAN_ALGO", "cumsum_mm")

    rng = np.random.default_rng(13)
    batch, K, L, dim, N = 1, 1, 32, 8, 4
    u = rng.standard_normal((batch, K, L, dim)).astype(np.float32)
    # drifted regime: dt ~ 8 >> the +-60/32-row envelope (margin ~ 4000)
    delta = (8.0 + rng.standard_normal((batch, K, L, dim))).astype(
        np.float32)
    A = -np.exp(rng.uniform(0.5, 1.5, (K, dim, N))).astype(np.float32)
    B = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    C = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    D = rng.standard_normal((K, dim)).astype(np.float32)
    bias = rng.standard_normal((K, dim)).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))
    want = golden_scan_np(u, delta, A, B, C, D, bias, True)

    from fusionmamba_tpu.ops.scan_pallas import saturation_margin
    assert float(saturation_margin(args[1], args[2], args[6])) > 100.0

    got = selective_scan_pallas(*args, delta_softplus=True, interpret=True,
                                algo="doubling")
    np.testing.assert_allclose(np.asarray(got), want, rtol=6e-4, atol=2e-3)

    # the public dispatch routes auto_exact's CPU lowering through assoc
    got2 = selective_scan(*args, delta_softplus=True, impl="auto_exact")
    np.testing.assert_allclose(np.asarray(got2), want, rtol=6e-4,
                               atol=2e-3)

    def loss(*a):
        out = selective_scan_pallas(*a, delta_softplus=True,
                                    interpret=True, algo="doubling")
        return jnp.sum(out * jnp.cos(
            jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape))

    def loss_ref(*a):
        out = selective_scan_ref(*a, delta_softplus=True)
        return jnp.sum(out * jnp.cos(
            jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape))

    g = jax.grad(loss, argnums=(0, 1, 2))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for name, a, b in zip(["du", "ddelta", "dA"], g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
            err_msg=f"pallas_exact grad mismatch {name}")


@pytest.mark.smoke
@pytest.mark.parametrize("regime", ["safe", "saturating", "heterogeneous"])
def test_adaptive_algo_exact_any_magnitude(monkeypatch, regime):
    """FM_SCAN_ALGO=adaptive: per-grid-cell runtime branch between the fast
    cumsum_mm rescan (margin inside the +-60 clip) and the magnitude-exact
    doubling scan (outside). Must match the float64 golden at EVERY input
    magnitude -- including mixed cells, where some (batch, d-block) grid
    cells take each branch -- fwd and grads. This is the property that lets
    trained models (whose saturation margin drifts to thousands,
    bench_artifacts/trajectory/) keep the cumsum_mm operating point."""
    from fusionmamba_tpu.ops import scan_pallas as sp
    monkeypatch.setattr(sp, "_SCAN_ALGO", "adaptive_cell")
    monkeypatch.setattr(sp, "_GRAD_MM_MODE", "off")

    rng = np.random.default_rng(21)
    batch, K, L, dim, N = 2, 2, 64, 16, 4
    u = rng.standard_normal((batch, K, L, dim)).astype(np.float32)
    scale = {"safe": 0.1, "saturating": 40.0, "heterogeneous": 0.1}[regime]
    delta = (scale * np.abs(rng.standard_normal((batch, K, L, dim)))).astype(
        np.float32)
    if regime == "heterogeneous":
        delta[1] *= 500.0  # batch-1 cells saturate, batch-0 cells don't
    A = -np.exp(rng.uniform(0.0, 1.5, (K, dim, N))).astype(np.float32)
    B = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    C = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    D = rng.standard_normal((K, dim)).astype(np.float32)
    bias = rng.standard_normal((K, dim)).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))
    want = golden_scan_np(u, delta, A, B, C, D, bias, True)

    got = selective_scan_pallas(*args, delta_softplus=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=6e-4, atol=2e-3)

    def loss(*a):
        out = selective_scan_pallas(*a, delta_softplus=True, interpret=True)
        return jnp.sum(out * jnp.cos(
            jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape))

    def loss_ref(*a):
        out = selective_scan_ref(*a, delta_softplus=True)
        return jnp.sum(out * jnp.cos(
            jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape))

    g = jax.grad(loss, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"],
                          g, g_ref):
        sc = np.maximum(np.abs(np.asarray(b)).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / sc, np.asarray(b) / sc, rtol=1e-3, atol=1e-3,
            err_msg=f"adaptive grad mismatch {name} ({regime})")


@pytest.mark.tpu
def test_adaptive_algo_compiled_saturating(monkeypatch):
    """The adaptive per-cell lax.cond LOWERS AND RUNS on the real TPU
    (Mosaic cond legality is only checked by a real lowering) and stays
    exact on saturating inputs through the COMPILED fwd+bwd kernels."""
    from fusionmamba_tpu.ops import scan_pallas as sp
    monkeypatch.setattr(sp, "_SCAN_ALGO", "adaptive_cell")
    rng = np.random.default_rng(23)
    batch, K, L, dim, N = 1, 2, 64, 128, 16
    u = rng.standard_normal((batch, K, L, dim)).astype(np.float32)
    delta = (8.0 + rng.standard_normal((batch, K, L, dim))).astype(np.float32)
    delta[0, 0] *= 0.01  # direction 0 stays in the safe regime (mixed cells)
    A = -np.exp(rng.uniform(0.5, 1.5, (K, dim, N))).astype(np.float32)
    B = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    C = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    D = rng.standard_normal((K, dim)).astype(np.float32)
    bias = rng.standard_normal((K, dim)).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))
    want = golden_scan_np(u, delta, A, B, C, D, bias, True)

    got = jax.jit(
        lambda *a: selective_scan_pallas(*a, delta_softplus=True))(*args)
    np.testing.assert_allclose(np.asarray(got), want, rtol=6e-4, atol=2e-3)

    def loss(*a):
        out = selective_scan_pallas(*a, delta_softplus=True)
        return jnp.sum(out * jnp.cos(
            jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape))

    def loss_ref(*a):
        out = selective_scan_ref(*a, delta_softplus=True)
        return jnp.sum(out * jnp.cos(
            jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["du", "ddelta", "dA", "dB", "dC"], g, g_ref):
        sc = np.maximum(np.abs(np.asarray(b)).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / sc, np.asarray(b) / sc, rtol=3e-2, atol=5e-2,
            err_msg=f"compiled adaptive grad mismatch {name}")


@pytest.mark.tpu
def test_adaptive_impl_dispatch_on_device(monkeypatch):
    """impl="adaptive" (the per-CALL margin cond, selective_scan.py): on the
    real chip, safe inputs ride the cumsum_mm kernel and saturating inputs
    flip the SAME jitted program onto the doubling kernel -- no retrace --
    and both match the golden. This is the shipped steady-state mechanism
    (the in-kernel adaptive_cell variant is the measured-slow experiment)."""
    from fusionmamba_tpu.ops.selective_scan import selective_scan

    rng = np.random.default_rng(29)
    batch, K, L, dim, N = 1, 2, 64, 128, 16
    u = rng.standard_normal((batch, K, L, dim)).astype(np.float32)
    A = -np.exp(rng.uniform(0.5, 1.5, (K, dim, N))).astype(np.float32)
    B = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    C = rng.standard_normal((batch, K, L, N)).astype(np.float32)
    D = rng.standard_normal((K, dim)).astype(np.float32)
    bias = rng.standard_normal((K, dim)).astype(np.float32)

    fn = jax.jit(lambda *a: selective_scan(*a, delta_softplus=True,
                                           impl="adaptive"))
    gfn = jax.jit(jax.grad(
        lambda *a: jnp.sum(jnp.tanh(selective_scan(
            *a, delta_softplus=True, impl="adaptive"))),
        argnums=(0, 1, 2)))

    for name, scale, rtol, atol in [("safe", 0.05, 3e-2, 5e-2),
                                    ("saturating", 12.0, 3e-2, 5e-2)]:
        delta = (scale * np.abs(
            rng.standard_normal((batch, K, L, dim)))).astype(np.float32)
        args = tuple(jnp.asarray(x)
                     for x in (u, delta, A, B, C, D, bias))
        want = golden_scan_np(u, delta, A, B, C, D, bias, True)
        got = fn(*args)
        np.testing.assert_allclose(np.asarray(got), want, rtol=rtol,
                                   atol=atol, err_msg=name)

        def loss_ref(*a):
            return jnp.sum(jnp.tanh(selective_scan_ref(
                *a, delta_softplus=True)))
        g = gfn(*args)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
        for gname, a, b in zip(["du", "ddelta", "dA"], g, g_ref):
            sc = np.maximum(np.abs(np.asarray(b)).max(), 1.0)
            np.testing.assert_allclose(
                np.asarray(a) / sc, np.asarray(b) / sc, rtol=rtol,
                atol=atol, err_msg=f"adaptive dispatch grad {gname} {name}")


@pytest.mark.tpu
def test_adaptive_compiled_tiny_sequence_lengths(monkeypatch):
    """L=1 and L=4 chunks through the COMPILED adaptive path (fwd+bwd).

    Regression: with impl="adaptive" BOTH kernel branches trace for every
    shape, and the doubling/daa code paths carried 0-sized shifted slices
    at l_chunk==1 / q==1 (a[:, 1:], W4[:, :, :0]) that Mosaic rejects
    ("vector types must have positive constant sizes") -- hit by the tiny
    config's deepest stage, caught by driving train.py at --image_size 64."""
    from fusionmamba_tpu.ops.selective_scan import selective_scan

    for L in (1, 4):
        rng = np.random.default_rng(40 + L)
        batch, K, dim, N = 2, 4, 256, 16
        u = rng.standard_normal((batch, K, L, dim)).astype(np.float32)
        delta = (0.2 * np.abs(rng.standard_normal(
            (batch, K, L, dim)))).astype(np.float32)
        A = -np.exp(rng.uniform(0.0, 1.5, (K, dim, N))).astype(np.float32)
        B = rng.standard_normal((batch, K, L, N)).astype(np.float32)
        C = rng.standard_normal((batch, K, L, N)).astype(np.float32)
        D = rng.standard_normal((K, dim)).astype(np.float32)
        bias = rng.standard_normal((K, dim)).astype(np.float32)
        args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))
        want = golden_scan_np(u, delta, A, B, C, D, bias, True)
        got = jax.jit(lambda *a: selective_scan(
            *a, delta_softplus=True, impl="adaptive"))(*args)
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-2,
                                   atol=5e-2, err_msg=f"L={L}")
        g = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(selective_scan(
            *a, delta_softplus=True, impl="adaptive"))),
            argnums=(0, 1, 2)))(*args)
        assert all(bool(jnp.all(jnp.isfinite(x))) for x in g), f"L={L}"


def test_extended_clip_band_is_exact(monkeypatch):
    """Margins between the OLD +-60 rescale clip and the shipped _CLIP=72
    stay exact on the cumsum family -- the widened envelope that keeps 7
    of the 12 step-200 trained-regime scans (margins 61-72, see
    bench_artifacts/r5/margin_trip_distribution_200steps.txt) on the fast
    tier with no adaptive repair. Uses constant dt so the margin is exactly
    q * dt * |A| (test_scan_guard.py:40-45) and lands in (60, _CLIP)."""
    from fusionmamba_tpu.ops import scan_pallas as sp
    from fusionmamba_tpu.ops.scan_pallas import saturation_margin
    assert sp._CLIP > 66.5, "test targets the >60 band of the 72 clip"
    for algo in ("cumsum", "cumsum_mm"):
        monkeypatch.setattr(sp, "_SCAN_ALGO", algo)
        rng = np.random.default_rng(51)
        batch, K, L, dim, N = 1, 2, 64, 8, 4
        u = rng.standard_normal((batch, K, L, dim)).astype(np.float32)
        dval = 66.0 / (sp._CUMSUM_Q * 2.0)      # margin = q * dval * amax
        draw = float(np.log(np.expm1(dval)))     # softplus^-1(dval)
        delta = np.full((batch, K, L, dim), draw, np.float32)
        A = np.full((K, dim, N), -2.0, np.float32)
        B = rng.standard_normal((batch, K, L, N)).astype(np.float32)
        C = rng.standard_normal((batch, K, L, N)).astype(np.float32)
        D = rng.standard_normal((K, dim)).astype(np.float32)
        args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D))
        m = float(saturation_margin(args[1], args[2], None,
                                    delta_softplus=True))
        assert 60.0 < m < sp._CLIP, m

        want = golden_scan_np(u, delta, A, B, C, D, None, True)
        got = selective_scan_pallas(*args, None, delta_softplus=True,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-3,
                                   atol=3e-3, err_msg=algo)

        def loss(*a):
            out = selective_scan_pallas(*a, None, delta_softplus=True,
                                        interpret=True)
            return jnp.sum(out * jnp.cos(jnp.arange(
                out.size, dtype=jnp.float32)).reshape(out.shape))

        def loss_ref(*a):
            out = selective_scan_ref(*a, None, delta_softplus=True)
            return jnp.sum(out * jnp.cos(jnp.arange(
                out.size, dtype=jnp.float32)).reshape(out.shape))

        g = jax.grad(loss, argnums=(0, 1, 2))(*args)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
        for name, a, b in zip(["du", "ddelta", "dA"], g, g_ref):
            sc = np.maximum(np.abs(np.asarray(b)).max(), 1.0)
            np.testing.assert_allclose(
                np.asarray(a) / sc, np.asarray(b) / sc, rtol=3e-3,
                atol=3e-3, err_msg=f"extended-band grad {name} ({algo})")
