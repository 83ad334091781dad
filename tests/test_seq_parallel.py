"""Sequence-parallel scan (parallel/seq_scan.py): sharding L over a mesh
axis must reproduce the single-device scan exactly (the cross-chip carry
combine is the same (a, b) monoid the kernel uses across chunks)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fusionmamba_tpu.ops import selective_scan
from fusionmamba_tpu.parallel import (
    make_mesh, selective_scan_seq_parallel, shard_l)

from test_scan import golden_scan_np, make_inputs


def _cpu_mesh(n_data, n_model):
    cpus = jax.devices("cpu")
    if len(cpus) < n_data * n_model:
        pytest.skip(f"need {n_data * n_model} cpu devices, have {len(cpus)}")
    return make_mesh(n_data, n_model, devices=cpus[: n_data * n_model])


@pytest.mark.parametrize("n_shards", [2, 4])
def test_matches_single_device(n_shards):
    mesh = _cpu_mesh(8 // n_shards, n_shards)
    rng = np.random.default_rng(5)
    u, delta, A, B, C, D, bias = make_inputs(rng, batch=2, K=2, L=64, dim=8,
                                             N=4)
    args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))

    want = golden_scan_np(u, delta, A, B, C, D, bias, True)
    got = selective_scan_seq_parallel(
        *args, delta_softplus=True, mesh=mesh, axis="model", impl="ref")
    np.testing.assert_allclose(np.asarray(got), want, rtol=6e-4, atol=2e-3)


def test_gradients_match_single_device():
    mesh = _cpu_mesh(4, 2)
    rng = np.random.default_rng(6)
    u, delta, A, B, C, D, bias = make_inputs(rng, batch=1, K=2, L=32, dim=8,
                                             N=4)
    args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))

    def loss_sp(u, delta, A, B, C, D, bias):
        y = selective_scan_seq_parallel(
            u, delta, A, B, C, D, bias, delta_softplus=True,
            mesh=mesh, axis="model", impl="ref")
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_ref(u, delta, A, B, C, D, bias):
        y = selective_scan(u, delta, A, B, C, D, bias,
                           delta_softplus=True, impl="ref")
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip("u delta A B C".split(), g_sp, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
            err_msg=f"grad mismatch for {name}")


def test_sp_impl_resolves_ambient_mesh():
    """`selective_scan(impl="sp")` — the model-layer route (SS2D
    scan_impl="sp") — picks up the mesh set with jax.sharding.set_mesh."""
    mesh = _cpu_mesh(2, 4)
    rng = np.random.default_rng(8)
    u, delta, A, B, C, D, bias = make_inputs(rng, batch=2, K=2, L=64, dim=8,
                                             N=4)
    args = tuple(jnp.asarray(x) for x in (u, delta, A, B, C, D, bias))
    want = golden_scan_np(u, delta, A, B, C, D, bias, True)
    with jax.sharding.set_mesh(mesh):
        got = selective_scan(*args, delta_softplus=True, impl="sp")
    np.testing.assert_allclose(np.asarray(got), want, rtol=6e-4, atol=2e-3)

    with pytest.raises(ValueError, match="needs a mesh"):
        selective_scan(*args, delta_softplus=True, impl="sp")


def test_ss2d_scan_impl_sp_matches_single_device():
    """SS2D(scan_impl="sp") under an ambient mesh reproduces the
    single-device module bit-for-bit-ish (same params via same rng)."""
    from fusionmamba_tpu.nn.ss2d import SS2D

    mesh = _cpu_mesh(2, 4)
    cpu0 = jax.devices("cpu")[0]
    rng = np.random.default_rng(9)
    x = jax.device_put(
        jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32)), cpu0)

    ref_mod = SS2D(d_model=16, d_state=4, scan_impl="assoc")
    sp_mod = SS2D(d_model=16, d_state=4, scan_impl="sp")
    with jax.default_device(cpu0):
        params = ref_mod.init(jax.random.PRNGKey(0), x)
        want = ref_mod.apply(params, x)
    # under an ambient mesh every jitted op runs on the mesh, so operands
    # must live there (replicated; shard_map re-splits L internally)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    x_m = jax.device_put(x, rep)
    params_m = jax.device_put(params, rep)
    with jax.sharding.set_mesh(mesh):
        got = sp_mod.apply(params_m, x_m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sharded_inputs_stay_sharded():
    mesh = _cpu_mesh(2, 4)
    rng = np.random.default_rng(7)
    u, delta, A, B, C, D, bias = make_inputs(rng, batch=1, K=1, L=64, dim=8,
                                             N=4)
    ls = shard_l(mesh, "model")
    u_s = jax.device_put(jnp.asarray(u), ls)
    dt_s = jax.device_put(jnp.asarray(delta), ls)
    B_s = jax.device_put(jnp.asarray(B), ls)
    C_s = jax.device_put(jnp.asarray(C), ls)
    y = selective_scan_seq_parallel(
        u_s, dt_s, jnp.asarray(A), B_s, C_s, jnp.asarray(D),
        jnp.asarray(bias), delta_softplus=True, mesh=mesh, axis="model",
        impl="ref")
    assert y.sharding.spec == ls.spec
    want = golden_scan_np(u, delta, A, B, C, D, bias, True)
    np.testing.assert_allclose(np.asarray(y), want, rtol=6e-4, atol=2e-3)
