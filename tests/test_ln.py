"""Fused LayerNorm(+gate) Pallas kernel vs flax.linen.LayerNorm numerics
(the reference's fused Triton layernorm analog --
`mamba_ssm/ops/triton/layernorm.py`): forward, all gradients, bf16 I/O."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fusionmamba_tpu.ops.ln_pallas import layer_norm_fused


def _flax_ln(x, scale, bias, eps=1e-6):
    mod = nn.LayerNorm(epsilon=eps)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x)


@pytest.mark.parametrize("shape", [(2, 8, 8, 96), (4, 16, 192), (64, 384)])
@pytest.mark.parametrize("has_gate", [False, True])
def test_ln_forward_matches_flax(shape, has_gate):
    rng = np.random.default_rng(0)
    C = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    gate = (jnp.asarray(rng.standard_normal(shape), jnp.float32)
            if has_gate else None)
    want = _flax_ln(x, scale, bias)
    if has_gate:
        want = want * gate
    got = layer_norm_fused(x, scale, bias, gate, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("has_gate", [False, True])
def test_ln_gradients(has_gate):
    rng = np.random.default_rng(1)
    shape, C = (2, 16, 96), 96
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    gate = (jnp.asarray(rng.standard_normal(shape), jnp.float32)
            if has_gate else None)
    w = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss_fused(x, scale, bias, gate):
        return jnp.sum(
            layer_norm_fused(x, scale, bias, gate, interpret=True) * w)

    def loss_ref(x, scale, bias, gate):
        y = _flax_ln(x, scale, bias)
        if gate is not None:
            y = y * gate
        return jnp.sum(y * w)

    n = 4 if has_gate else 3
    args = (x, scale, bias, gate)
    g_got = jax.grad(loss_fused, argnums=tuple(range(n)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(n)))(*args)
    for name, a, b in zip(["dx", "dscale", "dbias", "dgate"], g_got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"fused LN gradient mismatch: {name}")


def test_ln_bf16_io():
    rng = np.random.default_rng(2)
    shape, C = (4, 32, 192), 192
    x32 = rng.standard_normal(shape).astype(np.float32)
    g32 = rng.standard_normal(shape).astype(np.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    want = _flax_ln(jnp.asarray(x32), scale, bias) * g32
    got = layer_norm_fused(jnp.asarray(x32, jnp.bfloat16), scale, bias,
                           jnp.asarray(g32, jnp.bfloat16), interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=3e-2, atol=3e-2)


def test_ln_odd_rows_falls_back():
    """Row counts that don't tile fall back to the XLA path (auto mode)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((3, 96)), jnp.float32)
    scale = jnp.ones((96,), jnp.float32)
    bias = jnp.zeros((96,), jnp.float32)
    got = layer_norm_fused(x, scale, bias)
    want = _flax_ln(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gate_act", ["silu", "silu_sum"])
def test_ln_gate_activation_fused(gate_act):
    """gate_act folds the gate's activation into the kernel: "silu" is
    SS2D's y * silu(z) (`models/cross.py:731,742`); "silu_sum" is
    SS2DCross's y*(silu(z) + silu(silu(z))) dual gate
    (`models/cross.py:1207-1209,1225-1229`). Forward and all grads vs the
    explicit composition."""
    rng = np.random.default_rng(3)
    shape, C = (2, 16, 96), 96
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    gate = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def act(g):
        s1 = jax.nn.silu(g)
        return s1 if gate_act == "silu" else s1 + jax.nn.silu(s1)

    def loss_fused(x, scale, bias, gate):
        return jnp.sum(layer_norm_fused(x, scale, bias, gate,
                                        gate_act=gate_act,
                                        interpret=True) * w)

    def loss_ref(x, scale, bias, gate):
        return jnp.sum(_flax_ln(x, scale, bias) * act(gate) * w)

    v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(
        x, scale, bias, gate)
    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        x, scale, bias, gate)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-5)
    for name, a, b in zip(["dx", "dscale", "dbias", "dgate"], g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"gate_act={gate_act} grad mismatch {name}")


def test_ln_spatial_mean_fwd_and_grads():
    """ln_spatial_mean == mean over positions of LayerNorm(x), fwd and all
    grads (BiAttn's fused stats path)."""
    from fusionmamba_tpu.ops.ln_pallas import ln_spatial_mean

    rng = np.random.default_rng(4)
    B, H, W, C = 2, 8, 4, 96
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)

    def loss_fused(x, scale, bias):
        return jnp.sum(ln_spatial_mean(x, scale, bias, eps=1e-5,
                                       interpret=True) * w)

    def loss_ref(x, scale, bias):
        y = _flax_ln(x, scale, bias, eps=1e-5)
        return jnp.sum(jnp.mean(y, axis=(1, 2)) * w)

    v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(
        x, scale, bias)
    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        x, scale, bias)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-5)
    for name, a, b in zip(["dx", "dscale", "dbias"], g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"ln_spatial_mean grad mismatch {name}")


@pytest.mark.tpu
def test_compiled_fused_ln_variants_on_tpu():
    """COMPILED smoke for the r4 LN-kernel additions (gate_act fusion and
    ln_spatial_mean): Pallas block-shape legality is only checked by a real
    TPU lowering -- interpret mode accepted a (1, C) output block that the
    compiler rejects (caught by the r4 trajectory run)."""
    from fusionmamba_tpu.ops.ln_pallas import ln_spatial_mean, _lnm_ref

    rng = np.random.default_rng(7)
    B, H, W, C = 4, 16, 16, 96
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(C), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    gate = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)

    for gate_act in ("silu", "silu_sum"):
        def f(x, gate, ga=gate_act):
            return jnp.sum(layer_norm_fused(
                x, scale, bias, gate, eps=1e-5, gate_act=ga,
                impl="pallas").astype(jnp.float32))
        v, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))(x, gate)
        want = jnp.sum(layer_norm_fused(
            x, scale, bias, gate, eps=1e-5, gate_act=gate_act,
            impl="xla").astype(jnp.float32))
        np.testing.assert_allclose(float(v), float(want), rtol=2e-2)
        assert all(bool(jnp.isfinite(g.astype(jnp.float32)).all())
                   for g in grads)

    def m(x):
        return jnp.sum(ln_spatial_mean(x, scale, bias, eps=1e-5,
                                       impl="pallas"))
    v, g = jax.jit(jax.value_and_grad(m))(x)
    want = jnp.sum(_lnm_ref(x.reshape(B, H * W, C), scale, bias, 1e-5))
    np.testing.assert_allclose(float(v), float(want), rtol=2e-2)
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
