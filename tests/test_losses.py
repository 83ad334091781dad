"""Loss parity tests vs torch golden implementations (CPU torch is available
in the image; tests skip if not)."""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from fusionmamba_tpu.losses import (
    cross_entropy,
    focal_loss,
    fusion_loss,
    msssim,
    segmentation_loss,
    sobel_xy,
    ssim,
)

torch = pytest.importorskip("torch")

_REF = "/root/reference"


def _ref_msssim():
    if not os.path.isdir(os.path.join(_REF, "pytorch_msssim")):
        return None
    if _REF not in sys.path:
        sys.path.append(_REF)  # append: don't shadow repo top-level modules
    try:
        import pytorch_msssim  # vendored in the reference repo
        return pytorch_msssim
    except Exception:
        return None


@pytest.mark.parametrize("seed", [0, 1])
def test_msssim_matches_reference(seed):
    ref = _ref_msssim()
    if ref is None:
        pytest.skip("reference pytorch_msssim unavailable")
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 1, (2, 1, 64, 64)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32),
                0, 1)
    want = float(ref.msssim(torch.from_numpy(a), torch.from_numpy(b),
                            normalize=True))
    got = float(msssim(jnp.asarray(a.transpose(0, 2, 3, 1)),
                       jnp.asarray(b.transpose(0, 2, 3, 1)), normalize=True))
    assert abs(got - want) < 1e-5


def test_ssim_matches_reference():
    ref = _ref_msssim()
    if ref is None:
        pytest.skip("reference pytorch_msssim unavailable")
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (1, 1, 32, 32)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 1, 32, 32)).astype(np.float32)
    want = float(ref.ssim(torch.from_numpy(a), torch.from_numpy(b)))
    got = float(ssim(jnp.asarray(a.transpose(0, 2, 3, 1)),
                     jnp.asarray(b.transpose(0, 2, 3, 1))))
    assert abs(got - want) < 1e-5


def test_sobel_matches_torch():
    import torch.nn.functional as F
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 1, 16, 16)).astype(np.float32)
    kx = torch.tensor([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]])
    ky = torch.tensor([[1., 2., 1.], [0., 0., 0.], [-1., -2., -1.]])
    t = torch.from_numpy(x)
    want = (F.conv2d(t, kx[None, None], padding=1).abs()
            + F.conv2d(t, ky[None, None], padding=1).abs()).numpy()
    got = np.asarray(sobel_xy(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-5,
                               atol=1e-5)


def test_fusion_loss_runs_and_is_positive():
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
    ir = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
    gen = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
    out = fusion_loss(y, ir, gen)
    assert float(out.total) > 0
    assert np.isfinite(float(out.total))
    # total = 100*ssim + 10*in + 1*grad
    recon = 100 * float(out.ssim_value) + 10 * float(out.loss_in) + float(
        out.loss_grad)
    assert abs(recon - float(out.total)) < 1e-4


def test_weighted_ce_matches_torch():
    import torch.nn.functional as F
    rng = np.random.default_rng(5)
    logits = rng.standard_normal((2, 5, 8, 8)).astype(np.float32)
    target = rng.integers(0, 5, (2, 8, 8))
    w = np.array([1.0, 970.0, 121.25, 970.0, 53.89], np.float32)
    want = float(F.cross_entropy(torch.from_numpy(logits),
                                 torch.from_numpy(target).long(),
                                 weight=torch.from_numpy(w)))
    got = float(cross_entropy(
        jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(target),
        jnp.asarray(w)))
    assert abs(got - want) < 1e-5


def test_focal_matches_torch_formula():
    import torch.nn.functional as F
    rng = np.random.default_rng(6)
    logits = rng.standard_normal((2, 5, 8, 8)).astype(np.float32)
    target = rng.integers(0, 5, (2, 8, 8))
    ce = F.cross_entropy(torch.from_numpy(logits),
                         torch.from_numpy(target).long(), reduction="none")
    pt = torch.exp(-ce)
    want = float(((1 - pt) ** 2 * ce).mean())
    got = float(focal_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                           jnp.asarray(target)))
    assert abs(got - want) < 1e-5


def test_segmentation_loss_pst900_default_weights():
    rng = np.random.default_rng(7)
    logits = jnp.asarray(
        rng.standard_normal((1, 8, 8, 5)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, 5, (1, 8, 8)))
    out = segmentation_loss(logits, target, num_classes=5)
    assert np.isfinite(float(out.total))
    assert abs(float(out.total) - (float(out.ce) + 0.5 * float(out.focal))) \
        < 1e-6
