"""Layer-level golden tests vs torch implementations of the reference
formulas (LDC masked conv `models/cross.py:807-814`, eca `:1247-1259`,
BiAttn `:756-768`, DifferentialEnhance `:851-864`)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fusionmamba_tpu.nn import (
    BiAttn,
    DifferentialEnhance,
    ECALayer,
    LDC,
    PatchExpand,
    PatchMerging,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_ldc_matches_torch_formula():
    rng = np.random.default_rng(0)
    C = 4
    x = rng.standard_normal((2, 8, 8, C)).astype(np.float32)
    layer = LDC(C, C)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    with jax.default_matmul_precision("float32"):
        got = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))

    # torch-side computation of the same effective-weight conv
    w_hwio = np.asarray(params["kernel"])            # (3,3,C,C)
    w_oihw = torch.from_numpy(w_hwio.transpose(3, 2, 0, 1).copy())
    lm = torch.from_numpy(np.asarray(params["learnable_mask"]).T.copy())
    theta = float(np.asarray(params["learnable_theta"])[0])
    center = torch.zeros(3, 3)
    center[1, 1] = 1.0
    mask = 1.0 - theta * lm[:, :, None, None] * center \
        * w_oihw.sum(2, keepdim=True).sum(3, keepdim=True)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    want = F.conv2d(xt, w_oihw * mask, padding=1).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-3)


def test_eca_matches_torch():
    rng = np.random.default_rng(1)
    C = 8
    x = rng.standard_normal((2, 4, 4, C)).astype(np.float32)
    layer = ECALayer()
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    got = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))

    w = torch.from_numpy(np.asarray(params["conv_kernel"]).copy())
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    y = xt.mean((2, 3), keepdim=True)                 # GAP
    y_ = y.squeeze(-1).transpose(-1, -2)              # (B,1,C)
    y = F.conv1d(y_, w[None, None], padding=1)
    y = y.transpose(-1, -2).unsqueeze(-1)
    want = (xt * torch.sigmoid(y)).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-3)


def test_biattn_matches_torch():
    rng = np.random.default_rng(2)
    C = 8
    x = rng.standard_normal((2, 4, 4, C)).astype(np.float32)
    layer = BiAttn(C)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    got = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))

    xt = torch.from_numpy(x.copy())
    ln_w = torch.from_numpy(np.asarray(params["norm"]["scale"]).copy())
    ln_b = torch.from_numpy(np.asarray(params["norm"]["bias"]).copy())
    h = F.layer_norm(xt, (C,), ln_w, ln_b)
    g = h.mean([1, 2], keepdim=True)
    w1 = torch.from_numpy(
        np.asarray(params["global_reduce"]["kernel"]).T.copy())
    b1 = torch.from_numpy(np.asarray(params["global_reduce"]["bias"]).copy())
    w2 = torch.from_numpy(
        np.asarray(params["channel_select"]["kernel"]).T.copy())
    b2 = torch.from_numpy(np.asarray(params["channel_select"]["bias"]).copy())
    g = F.gelu(F.linear(g, w1, b1))
    attn = torch.sigmoid(F.linear(g, w2, b2))
    want = (xt * attn).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_differential_enhance():
    rng = np.random.default_rng(3)
    f = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    a = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    b = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    layer = DifferentialEnhance()
    params = layer.init(jax.random.PRNGKey(0), *map(jnp.asarray, (f, a, b)))
    f1, f2 = layer.apply(params, *map(jnp.asarray, (f, a, b)))
    w12 = 1 / (1 + np.exp(-np.mean(a - b, axis=(1, 2), keepdims=True)))
    w21 = 1 / (1 + np.exp(-np.mean(b - a, axis=(1, 2), keepdims=True)))
    np.testing.assert_allclose(np.asarray(f1), w12 * f + a, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f2), w21 * f + b, rtol=1e-5,
                               atol=1e-5)


def test_patch_merge_expand_shapes():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    pm = PatchMerging(4)
    pv = pm.init(jax.random.PRNGKey(0), x)
    y = pm.apply(pv, x)
    assert y.shape == (1, 4, 4, 8)
    pe = PatchExpand(4)
    ev = pe.init(jax.random.PRNGKey(1), y)
    z = pe.apply(ev, y)
    assert z.shape == (1, 8, 8, 4)


def test_ss2d_fullres_variant():
    """SS2D scan_variant='fullres' (reference forward_corev0 semantics,
    `models/vmamba_Fusion_efficross.py:391-429`): shape-preserving, finite,
    differentiable, and distinct from the stride-2 efficient variant."""
    from fusionmamba_tpu.nn.ss2d import SS2D

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    full = SS2D(d_model=8, d_state=4, scan_impl="assoc",
                scan_variant="fullres")
    eff = SS2D(d_model=8, d_state=4, scan_impl="assoc")
    params = full.init(jax.random.PRNGKey(0), x)["params"]
    y_full = full.apply({"params": params}, x)
    y_eff = eff.apply({"params": params}, x)  # same param shapes/tree
    assert y_full.shape == x.shape
    assert np.isfinite(np.asarray(y_full)).all()
    # at init the SSM state contribution is small (y ~ D*u after LayerNorm),
    # so the two orderings differ by only ~1e-5 -- assert distinct, not far
    assert float(jnp.max(jnp.abs(y_full - y_eff))) > 1e-7

    g = jax.grad(lambda p: jnp.sum(
        full.apply({"params": p}, x) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
