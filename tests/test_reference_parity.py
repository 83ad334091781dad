"""Golden end-to-end parity: reference PyTorch VSSM_Fusion (CPU, eval) vs
this framework's VSSMFusion with CONVERTED weights on the same inputs.

This is the BASELINE.json north-star check (fused-image SSIM >= 0.999 vs
reference outputs), run at tiny config so the reference's O(L) python-loop
scan stub stays fast. Skipped when /root/reference is not mounted.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_harness import build_reference_fusion, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not available")

# must be 16: the reference's VSSLayer passes `d_state=` but VSSBlock_new's
# kwarg is `ssm_d_state`, so the value is swallowed by **kwargs and encoder/
# decoder SS2Ds ALWAYS run d_state=16 (`vmamba_Fusion_efficross.py:651-658`,
# `cross.py:1297-1321`) -- 16 is the only block d_state any reference config
# can produce
D_STATE = 16

# (depths, depths_decoder, dims, input_size): the 2-stage tiny case plus a
# 4-stage case that exercises the decoder skip indices -2/-3 and the
# stage-3 path (`models/fusion.py` skip wiring vs
# `vmamba_Fusion_efficross.py:892-899`)
_CONFIGS = {
    "2stage": ((1, 1), (1, 1), (16, 32), 32),
    "4stage": ((1, 1, 1, 1), (1, 1, 1, 1), (16, 32, 64, 128), 64),
}


@pytest.fixture(scope="module", params=sorted(_CONFIGS))
def parity_pair(request):
    torch = pytest.importorskip("torch")
    DEPTHS, DEPTHS_DEC, DIMS, SIZE = _CONFIGS[request.param]
    ref = build_reference_fusion(DEPTHS, DEPTHS_DEC, DIMS, D_STATE)

    from fusionmamba_tpu.checkpoints.torch_import import (
        convert_fusion_state_dict)
    from fusionmamba_tpu.config import FusionModelConfig
    from fusionmamba_tpu.models import VSSMFusion

    params = convert_fusion_state_dict(
        ref.state_dict(), DEPTHS, DEPTHS_DEC)
    cfg = FusionModelConfig(depths=DEPTHS, depths_decoder=DEPTHS_DEC,
                            dims=DIMS, d_state=D_STATE, drop_path_rate=0.0,
                            scan_impl="ref")
    model = VSSMFusion(cfg)

    rng = np.random.default_rng(42)
    x = rng.uniform(0, 1, (2, SIZE, SIZE, 1)).astype(np.float32)
    y = rng.uniform(0, 1, (2, SIZE, SIZE, 1)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(y.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)

    # pin to the host CPU backend: bit-comparable IEEE fp32 vs torch-CPU.
    # On TPU the same graph lands ~5e-5 off per scan (transcendental and
    # accumulation differences), which decoder LayerNorms over low-variance
    # features amplify to ~7e-3 at the output -- hardware noise, not
    # semantics (verified: jax-ref vs torch golden is 9.5e-7 on CPU).
    with jax.default_device(jax.devices("cpu")[0]), \
            jax.default_matmul_precision("float32"):
        got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                     jnp.asarray(y)))
    return want, got


def test_outputs_close(parity_pair):
    """Quantile-based closeness: at random init the decoder LayerNorms are
    ill-conditioned at isolated positions (per-position channel variance
    ~1e-3 of scale), so ANY fp32 rounding difference -- ours vs torch, or
    torch-CPU vs torch-GPU -- amplifies ~1000x at a handful of pixels
    (verified: the pre-LN expand Linear matches to 3e-6 abs; the post-LN
    output differs 1.3e-2 at those positions). Structural parity is gated
    by the SSIM test; here we pin the bulk distribution."""
    want, got = parity_pair
    assert want.shape == got.shape
    rel = np.abs(want - got) / np.abs(want).max()
    assert np.median(rel) < 5e-4, np.median(rel)
    assert np.quantile(rel, 0.99) < 5e-3, np.quantile(rel, 0.99)
    assert rel.max() < 0.5, rel.max()


def test_ssim_north_star(parity_pair):
    """BASELINE.json: fused-image SSIM >= 0.999 vs reference outputs."""
    from fusionmamba_tpu.losses.ssim import ssim

    want, got = parity_pair
    # min-max normalize both the way test.py emits images (`test.py:93`)
    def norm(a):
        return (a - a.min()) / (a.max() - a.min() + 1e-12)

    val = float(ssim(jnp.asarray(norm(want)), jnp.asarray(norm(got)),
                     val_range=1.0))
    assert val >= 0.999, val


@pytest.mark.tpu
@pytest.mark.slow
def test_full_config_on_device_ssim():
    """VERDICT r1 item 5: the FULL reference config (depths [2,2,9,2] /
    decoder [2,9,2,2], dims [96,192,384,768], 256^2 input --
    `vmamba_Fusion_efficross.py:754-757`) golden-compared ON DEVICE: torch
    reference on CPU vs the COMPILED Pallas model on the default (TPU)
    backend under the shipped operating point (library-default
    cumsum_mm/bf16-dot kernel). Gate = the BASELINE.json north star,
    SSIM >= 0.999 through the test.py output pipeline (clamp [0,1] ->
    min-max renormalize, reference `test.py:82-100`). The measured value
    is recorded in PARITY.md (maintained by hand when this test is run)."""
    torch = pytest.importorskip("torch")
    DEPTHS, DEPTHS_DEC = (2, 2, 9, 2), (2, 9, 2, 2)
    DIMS, SIZE = (96, 192, 384, 768), 256
    ref = build_reference_fusion(DEPTHS, DEPTHS_DEC, DIMS, D_STATE)

    from fusionmamba_tpu.checkpoints.torch_import import (
        convert_fusion_state_dict)
    from fusionmamba_tpu.config import FusionModelConfig
    from fusionmamba_tpu.losses.ssim import ssim
    from fusionmamba_tpu.models import VSSMFusion

    params = convert_fusion_state_dict(ref.state_dict(), DEPTHS, DEPTHS_DEC)
    cfg = FusionModelConfig(depths=DEPTHS, depths_decoder=DEPTHS_DEC,
                            dims=DIMS, d_state=D_STATE, drop_path_rate=0.0,
                            scan_impl="auto")  # auto -> Pallas on TPU
    model = VSSMFusion(cfg)

    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1, (1, SIZE, SIZE, 1)).astype(np.float32)
    y = rng.uniform(0, 1, (1, SIZE, SIZE, 1)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(y.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)

    # params must be an ARGUMENT, not a closure: closed-over arrays bake
    # into the HLO as constants and the ~140 MB program body overflows the
    # tunneled compile endpoint (HTTP 413)
    fwd = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b))
    got = np.asarray(fwd(params, jnp.asarray(x), jnp.asarray(y)))
    assert got.shape == want.shape

    # reference test.py output pipeline: clamp then min-max renormalize
    def pipeline(a):
        a = np.clip(a, 0.0, 1.0)
        return (a - a.min()) / (a.max() - a.min() + 1e-12)

    val = float(ssim(jnp.asarray(pipeline(want)), jnp.asarray(pipeline(got)),
                     val_range=1.0))
    print(f"\nfull-config on-device SSIM vs torch golden: {val:.6f}")
    assert val >= 0.999, val


@pytest.mark.parametrize("config_name", sorted(_CONFIGS))
def test_roundtrip_export(config_name):
    """flax -> torch export loads strictly into the reference model."""
    torch = pytest.importorskip("torch")
    DEPTHS, DEPTHS_DEC, DIMS, _ = _CONFIGS[config_name]
    ref = build_reference_fusion(DEPTHS, DEPTHS_DEC, DIMS, D_STATE, seed=1)

    from fusionmamba_tpu.checkpoints.torch_import import (
        convert_fusion_state_dict, export_torch_state_dict)

    params = convert_fusion_state_dict(ref.state_dict(), DEPTHS, DEPTHS_DEC)
    sd = export_torch_state_dict(params, DEPTHS, DEPTHS_DEC)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    # anything missing must be buffers/params the reference never uses in
    # forward (documented in torch_import.py)
    allowed = ("base_mask", "Diff_enhance.lastconv", "lastconv")
    bad = [k for k in missing if not any(a in k for a in allowed)]
    assert not bad, bad
