"""Model-level shape and sanity tests (miniature config on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fusionmamba_tpu.config import test_config
from fusionmamba_tpu.models import VSSMFusion, VSSMFusionSeg


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = test_config(scan_impl="assoc")
    model = VSSMFusion(cfg)
    rng = jax.random.PRNGKey(0)
    x1 = jnp.ones((1, 32, 32, 1), jnp.float32) * 0.5
    x2 = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = model.init(rng, x1, x2)
    return cfg, model, params, x1, x2


def test_fusion_forward_shape(tiny_setup):
    cfg, model, params, x1, x2 = tiny_setup
    out = model.apply(params, x1, x2)
    assert out.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_fusion_residual_passthrough(tiny_setup):
    """Output includes the +2*x1 + 2*x2 residual: doubling x1 must move the
    output by at least the residual delta direction (sanity, not exactness)."""
    cfg, model, params, x1, x2 = tiny_setup
    out1 = model.apply(params, x1, x2)
    out2 = model.apply(params, x1 + 1.0, x2)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_fusion_jit_and_grad(tiny_setup):
    cfg, model, params, x1, x2 = tiny_setup

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, x1, x2)
        return jnp.mean(out ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least some gradient reaches the deepest encoder params
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_seg_forward(tiny_setup):
    cfg, _, _, x1, x2 = tiny_setup
    cfg_seg = test_config(scan_impl="assoc", num_seg_classes=5)
    model = VSSMFusionSeg(cfg_seg)
    variables = model.init(jax.random.PRNGKey(1), x1, x2)
    out = model.apply(variables, x1, x2, mutable=False)
    assert out["segmentation"].shape == (1, 32, 32, 5)
    assert out["fusion"].shape == (1, 32, 32, 1)


def test_fused_tail_equivalence(tiny_setup):
    """cfg.fused_tail computes the tail (final_up LN + 1x1 conv) in the
    pre-depth-to-space layout; must match the unfused path numerically
    (identical math, fp32-dot stats -- nn/patch.py, models/fusion.py)."""
    cfg, model, params, _, _ = tiny_setup
    rng = np.random.default_rng(3)
    x1 = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
    from fusionmamba_tpu.config import test_config as _tc
    model_unfused = VSSMFusion(_tc(scan_impl="assoc", fused_tail=False))
    out_fused = model.apply(params, x1, x2)        # default fused_tail=True
    out_plain = model_unfused.apply(params, x1, x2)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               rtol=2e-5, atol=2e-5)
