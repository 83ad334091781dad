"""Full-model GRADIENT parity vs torch autograd (VERDICT r2 item 3).

The reference validates its kernel's gradients against a golden model
(`mamba_ssm/ops/test_selective_scan.py:447-505`); this is the same check at
MODEL scale: dLoss/dparams of the end-to-end Fusionloss pipeline
(`loss.py:35-56` + the `train.py:149-152` clamp), torch-CPU autograd vs
jax-CPU, on converted weights and identical inputs. The torch side runs the
reference model through `reference_harness`'s autograd-replay scan backward;
gradients convert to the flax tree through the SAME permutation-only
transform table as the weights (`checkpoints/torch_import.py`), so per-leaf
comparison is direct.

A `tpu`-marked variant re-runs the jax side through the COMPILED Pallas
kernel at the kernel's documented mixed-precision tolerance.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_harness import build_reference_fusion, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not available")

D_STATE = 16
# 2stage/4stage mirror test_reference_parity's configs; 2stage_wide keeps
# d_inner >= 128 so the COMPILED Pallas kernel accepts it (tiny flat-lane
# widths SIGABRT this libtpu's LLO pass -- verify skill "known traps")
_CONFIGS = {
    "2stage": ((1, 1), (1, 1), (16, 32), 32),
    "4stage": ((1, 1, 1, 1), (1, 1, 1, 1), (16, 32, 64, 128), 64),
    "2stage_wide": ((1, 1), (1, 1), (64, 128), 32),
}


def _torch_loss(torch, ref, x, y):
    """Reference loss pipeline: forward, train.py clamp, Fusionloss."""
    import sys
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")  # append: don't shadow repo CLIs
    from loss import Fusionloss

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = torch.from_numpy(y.transpose(0, 3, 1, 2))
    gen = ref(xt, yt)
    ones = torch.ones_like(gen)
    zeros = torch.zeros_like(gen)
    gen = torch.where(gen > 1, ones, gen)      # train.py:149-152
    gen = torch.where(gen < 0, zeros, gen)
    total, _, _, _ = Fusionloss()(xt, yt, None, gen, 0)
    return total


def _jax_loss_fn(model, x, y):
    from fusionmamba_tpu.losses import fusion_loss

    def loss_fn(params):
        gen = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(y))
        gen = jnp.clip(gen.astype(jnp.float32), 0.0, 1.0)
        return fusion_loss(jnp.asarray(x), jnp.asarray(y), gen).total

    return loss_fn


@pytest.fixture(scope="module", params=sorted(_CONFIGS))
def grad_pair(request):
    torch = pytest.importorskip("torch")
    DEPTHS, DEPTHS_DEC, DIMS, SIZE = _CONFIGS[request.param]
    ref = build_reference_fusion(DEPTHS, DEPTHS_DEC, DIMS, D_STATE)

    from fusionmamba_tpu.checkpoints.torch_import import (
        convert_fusion_state_dict)
    from fusionmamba_tpu.config import FusionModelConfig
    from fusionmamba_tpu.models import VSSMFusion

    params = convert_fusion_state_dict(ref.state_dict(), DEPTHS, DEPTHS_DEC)

    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, (2, SIZE, SIZE, 1)).astype(np.float32)
    y = rng.uniform(0, 1, (2, SIZE, SIZE, 1)).astype(np.float32)

    # ---- torch grads (eval mode: droppath/dropout off, grads flow) ----
    ref.zero_grad(set_to_none=True)
    total = _torch_loss(torch, ref, x, y)
    total.backward()
    grad_sd = {}
    for name, p in ref.named_parameters():
        grad_sd[name] = (p.grad if p.grad is not None
                         else torch.zeros_like(p))
    # constant buffers the converter maps from state_dict but that carry no
    # gradient (none are parameters, so named_parameters misses none; the
    # converter skips buffers already)
    want = convert_fusion_state_dict(grad_sd, DEPTHS, DEPTHS_DEC)

    cfg = FusionModelConfig(depths=DEPTHS, depths_decoder=DEPTHS_DEC,
                            dims=DIMS, d_state=D_STATE, drop_path_rate=0.0,
                            scan_impl="ref")
    model = VSSMFusion(cfg)
    return request.param, model, params, want, float(total.detach()), x, y


def _compare(want, got, rtol, atol_norm, pct90=None):
    """Per-leaf relative 2-norm error gate; returns the worst (err, path).

    pct90: optional additional gate on the 90th-percentile leaf error --
    used by the mixed-precision device tier so its looser per-leaf max
    cannot hide a systematic error across many leaves."""
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    assert len(flat_w) == len(flat_g)
    worst = (0.0, "<none>")
    errs = []
    for (pw, lw), (pg, lg) in zip(
            sorted(flat_w, key=lambda t: str(t[0])),
            sorted(flat_g, key=lambda t: str(t[0]))):
        assert str(pw) == str(pg)
        lw = np.asarray(lw, np.float64)
        lg = np.asarray(lg, np.float64)
        denom = np.linalg.norm(lw) + atol_norm
        err = np.linalg.norm(lw - lg) / denom
        errs.append(err)
        if err > worst[0]:
            worst = (err, str(pw))
        assert err < rtol, (str(pw), err, float(np.abs(lw).max()),
                            float(np.abs(lg).max()))
    if pct90 is not None:
        p90 = float(np.percentile(errs, 90))
        assert p90 < pct90, ("90th-pct leaf grad error", p90)
    return worst


@pytest.mark.slow
def test_full_model_grads_match_torch_cpu(grad_pair):
    _, model, params, want, torch_total, x, y = grad_pair
    loss_fn = _jax_loss_fn(model, x, y)
    with jax.default_device(jax.devices("cpu")[0]), \
            jax.default_matmul_precision("float32"):
        total, grads = jax.value_and_grad(loss_fn)(params)
    # the primal losses agree first (forward parity at loss level)
    np.testing.assert_allclose(float(total), torch_total, rtol=1e-4)
    worst = _compare(want, grads, rtol=2e-3, atol_norm=1e-10)
    print(f"worst grad leaf rel err {worst[0]:.2e} at {worst[1]}")


@pytest.mark.tpu
@pytest.mark.slow
def test_full_model_grads_pallas_on_device(grad_pair):
    """Same comparison through the COMPILED Pallas scan path on the default
    (TPU) backend at the shipped operating point (library-default
    cumsum_mm/bf16-dot kernel). Tolerance follows the kernel's documented
    mixed-precision envelope (~5e-4 global rel error, PERF.md) amplified
    through the model's LayerNorm chains."""
    name, model, params, want, _, x, y = grad_pair
    if name != "2stage_wide":
        pytest.skip("compiled-kernel variant runs the Pallas-safe widths "
                    "only (d_inner >= 128)")
    from fusionmamba_tpu.config import FusionModelConfig

    cfg = FusionModelConfig(
        depths=model.cfg.depths, depths_decoder=model.cfg.depths_decoder,
        dims=model.cfg.dims, d_state=D_STATE, drop_path_rate=0.0,
        scan_impl="auto")
    from fusionmamba_tpu.models import VSSMFusion
    tpu_model = VSSMFusion(cfg)
    loss_fn = _jax_loss_fn(tpu_model, x, y)
    # float32 matmul precision: at the TPU DEFAULT, XLA computes every f32
    # dot at bf16-grade and unlucky small leaves (cross-block LN bias, LDC
    # masks) land 8..50% off torch REGARDLESS of scan impl (measured:
    # assoc and pallas deviate identically) -- that would make this a test
    # of XLA's dot policy, not of the Pallas path it exists to gate.
    # Pinning f32 leaves only the kernels' own documented envelope (the
    # GRAD_MM bf16 dots inside the scan backward are explicit and exempt
    # from the precision config).
    with jax.default_matmul_precision("float32"):
        grads = jax.jit(jax.grad(loss_fn))(params)
        grads = jax.device_get(grads)
    # absolute norm floor 1e-3: leaves whose whole gradient norm is ~1e-4
    # (numerically zero against a loss of O(30)) otherwise turn rounding
    # noise into meaningless relative error. pct90 keeps the distribution
    # honest.
    worst = _compare(want, grads, rtol=5e-2, atol_norm=1e-3, pct90=2e-2)
    print(f"worst on-device grad leaf rel err {worst[0]:.2e} at {worst[1]}")
