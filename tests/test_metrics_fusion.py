"""Fusion-quality metrics (eval/metrics_fusion.py): identities and a
cross-check of the NumPy SSIM against the jax SSIM used in the loss
(losses/ssim.py, which itself matches the vendored pytorch_msssim)."""
import numpy as np
import pytest

from fusionmamba_tpu.eval import (
    entropy, fusion_report, mutual_information, qabf, ssim, std_dev)


@pytest.fixture
def imgs():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (64, 64))
    a = np.clip(base + 0.1 * rng.standard_normal((64, 64)), 0, 1)
    b = np.clip(1 - base + 0.1 * rng.standard_normal((64, 64)), 0, 1)
    f = 0.5 * (a + b)
    return a, b, f


def test_ssim_identity(imgs):
    a, _, _ = imgs
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-9)


def test_ssim_matches_jax_loss_ssim(imgs):
    a, b, _ = imgs
    import jax.numpy as jnp

    from fusionmamba_tpu.losses.ssim import ssim as jssim

    got = ssim(a, b)
    want = float(jssim(
        jnp.asarray(a, jnp.float32)[None, :, :, None],
        jnp.asarray(b, jnp.float32)[None, :, :, None],
        val_range=1.0))
    # the loss-side ssim uses SAME padding (torch_msssim semantics); the
    # eval-side uses the VALID region -- they agree away from borders
    assert got == pytest.approx(want, abs=2e-2)


def test_qabf_range_and_self_fusion(imgs):
    a, b, f = imgs
    q = qabf(a, b, f)
    assert 0.0 <= q <= 1.0
    # fusing a with itself and outputting it preserves all edges
    assert qabf(a, a, a) > 0.85
    # destroying all structure scores near zero
    assert qabf(a, b, np.full_like(a, 0.5)) < 0.1


def test_entropy_and_sd():
    const = np.full((32, 32), 0.5)
    assert entropy(const) == pytest.approx(0.0, abs=1e-9)
    assert std_dev(const) == pytest.approx(0.0, abs=1e-9)
    rng = np.random.default_rng(1)
    noisy = rng.uniform(0, 1, (64, 64))
    assert entropy(noisy) > 7.0        # ~8 bits for uniform
    assert std_dev(noisy) > 60.0       # ~73.6 for uniform*255


def test_mutual_information_prefers_dependence(imgs):
    a, b, _ = imgs
    rng = np.random.default_rng(2)
    indep = rng.uniform(0, 1, a.shape)
    assert mutual_information(a, b, a) > mutual_information(a, b, indep)


def test_fusion_report_keys(imgs):
    a, b, f = imgs
    rep = fusion_report(a, b, f, ref=f)
    assert rep["ssim_vs_reference"] == pytest.approx(1.0, abs=1e-9)
    for k in ("qabf", "entropy", "std_dev", "mi", "ssim_vis", "ssim_ir"):
        assert np.isfinite(rep[k])
