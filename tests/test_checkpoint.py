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
