"""Native preprocessing library vs PIL/cv2 golden (built via `make -C
native`; tests skip when the .so is absent). PIL's uint8 path uses 8.8
fixed-point coefficients, so resize parity tolerance is +-2 LSB."""
import numpy as np
import pytest
from PIL import Image

from fusionmamba_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libpreprocess.so not built")


@pytest.mark.parametrize("in_hw,out_hw", [
    ((300, 220), (256, 256)),   # upscale one axis, downscale other
    ((64, 64), (256, 256)),     # pure upscale
    ((512, 640), (256, 256)),   # pure downscale (exercises support widening)
])
def test_resize_matches_pil(in_hw, out_hw):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, in_hw, np.uint8)
    want = np.array(Image.fromarray(img).resize(
        (out_hw[1], out_hw[0]), resample=3))
    got = native.resize_bicubic(img, *out_hw)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 2, f"max LSB diff {diff.max()}"
    assert (diff > 1).mean() < 0.01


def test_resize_rgb_matches_pil():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (200, 150, 3), np.uint8)
    want = np.array(Image.fromarray(img).resize((256, 256), resample=3))
    got = native.resize_bicubic(img, 256, 256)
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


def test_gray_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 255, (64, 64, 3), np.uint8)
    want = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    got = native.rgb_to_gray(rgb)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_preprocess_pair_fused():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 255, (300, 220, 3), np.uint8)
    ir = rng.integers(0, 255, (300, 220), np.uint8)
    vis_y, ir_out = native.preprocess_pair(rgb, ir, (256, 256))
    assert vis_y.shape == (256, 256, 1) and vis_y.dtype == np.float32
    assert 0.0 <= vis_y.min() and vis_y.max() <= 1.0
    # cross-check against the Python path within 2/255
    want_ir = np.array(Image.fromarray(ir).resize((256, 256), resample=3),
                       np.float32) / 255.0
    assert np.abs(ir_out[..., 0] - want_ir).max() <= 2.5 / 255.0
