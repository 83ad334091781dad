"""Pallas depthwise conv vs XLA conv golden: forward + gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fusionmamba_tpu.ops.dwconv_pallas import (
    _xla_dwconv,
    depthwise_conv3x3,
)


@pytest.mark.parametrize("B,H,W,C", [(2, 8, 8, 16), (3, 5, 7, 8)])
def test_forward_matches_xla(B, H, W, C):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    want = _xla_dwconv(x, w, b)
    got = depthwise_conv3x3(x, w, b, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)

    def loss_pallas(x, w, b):
        out = depthwise_conv3x3(x, w, b, impl="pallas", interpret=True)
        wgt = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(
            out.shape)
        return jnp.sum(out * wgt)

    def loss_xla(x, w, b):
        out = _xla_dwconv(x, w, b)
        wgt = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(
            out.shape)
        return jnp.sum(out * wgt)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
    for name, a, bb in zip(("dx", "dw", "db"), g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_bf16_io():
    """bf16 activations, fp32 accumulation inside the kernel."""
    import jax
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    got = depthwise_conv3x3(x, w, b, impl="pallas", interpret=True)
    want = depthwise_conv3x3(x.astype(jnp.float32), w, b, impl="xla")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=3e-2, atol=5e-2)

    def loss(x):
        return jnp.sum(depthwise_conv3x3(
            x, w, b, impl="pallas", interpret=True).astype(jnp.float32))

    g = jax.grad(loss)(x)
    def loss_xla(x):
        return jnp.sum(depthwise_conv3x3(x, w, b, impl="xla"))
    g_ref = jax.grad(loss_xla)(x.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(g, np.float32), np.asarray(g_ref),
                               rtol=3e-2, atol=5e-2)


def test_dwconv_silu_epilogue_fwd_and_grads():
    """act="silu" fuses the conv's SiLU into the kernel (fwd epilogue +
    in-kernel recompute in the merged backward): matches the explicit
    silu(conv(x)) composition on forward and all grads."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, 16)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(16), jnp.float32)

    got = depthwise_conv3x3(x, w, b, impl="pallas", interpret=True,
                            act="silu")
    want = jax.nn.silu(_xla_dwconv(x, w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(x, w, b):
        return jnp.sum(depthwise_conv3x3(x, w, b, impl="pallas",
                                         interpret=True, act="silu") ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(jax.nn.silu(_xla_dwconv(x, w, b)) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for name, a, bb in zip(["dx", "dw", "db"], g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4,
            err_msg=f"dwconv silu grad mismatch {name}")


@pytest.mark.tpu
def test_compiled_dwconv_silu_on_tpu():
    """COMPILED smoke for the act="silu" epilogue + merged backward."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 128)), jnp.bfloat16)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, 128)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(128), jnp.float32)

    def f(x, w, b):
        return jnp.sum(depthwise_conv3x3(
            x, w, b, impl="pallas", act="silu").astype(jnp.float32))

    v, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))(x, w, b)
    want = jnp.sum(jax.nn.silu(_xla_dwconv(
        x.astype(jnp.float32), w, b)))
    np.testing.assert_allclose(float(v), float(want), rtol=2e-2)
    assert all(bool(jnp.isfinite(g.astype(jnp.float32)).all())
               for g in grads)
