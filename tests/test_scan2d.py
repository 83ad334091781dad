"""Cross-scan/merge layout ops: inverse property + exact index semantics
vs a NumPy model of the reference's strided scatter/gather
(`models/cross.py:139-190, 34-88`; full-res `vmamba_Fusion_efficross.py:398-429`).
"""
import numpy as np
import jax.numpy as jnp

from fusionmamba_tpu.ops import (
    cross_merge,
    cross_scan,
    efficient_merge,
    efficient_scan,
)


def efficient_scan_np(x):
    """NumPy mirror of the reference EfficientScan in NHWC terms."""
    B, H, W, C = x.shape
    H2, W2 = H // 2, W // 2
    d0 = x[:, ::2, ::2, :].reshape(B, -1, C)
    d1 = x.transpose(0, 2, 1, 3)[:, ::2, 1::2, :].reshape(B, -1, C)
    d2 = x[:, ::2, 1::2, :].reshape(B, -1, C)
    d3 = x.transpose(0, 2, 1, 3)[:, 1::2, 1::2, :].reshape(B, -1, C)
    return np.stack([d0, d1, d2, d3], axis=1)


def efficient_merge_np(ys, H, W):
    B, K, L, C = ys.shape
    H2, W2 = H // 2, W // 2
    y = np.zeros((B, H, W, C), ys.dtype)
    y[:, ::2, ::2, :] = ys[:, 0].reshape(B, H2, W2, C)
    y[:, 1::2, ::2, :] = ys[:, 1].reshape(B, W2, H2, C).transpose(0, 2, 1, 3)
    y[:, ::2, 1::2, :] = ys[:, 2].reshape(B, H2, W2, C)
    y[:, 1::2, 1::2, :] = ys[:, 3].reshape(B, W2, H2, C).transpose(0, 2, 1, 3)
    return y


def test_efficient_scan_matches_reference_semantics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 6, 3)).astype(np.float32)
    got = np.asarray(efficient_scan(jnp.asarray(x)))
    want = efficient_scan_np(x)
    np.testing.assert_array_equal(got, want)


def test_efficient_merge_inverse():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 6, 3)).astype(np.float32)
    ys = efficient_scan(jnp.asarray(x))
    back = efficient_merge(ys, 8, 6)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_efficient_merge_matches_reference_semantics():
    rng = np.random.default_rng(2)
    ys = rng.standard_normal((2, 4, 6, 3)).astype(np.float32)  # H=6, W=4
    got = np.asarray(efficient_merge(jnp.asarray(ys), 6, 4))
    want = efficient_merge_np(ys, 6, 4)
    np.testing.assert_array_equal(got, want)


def test_efficient_scan_odd_sizes_pad():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 5, 7, 2)).astype(np.float32)
    ys = efficient_scan(jnp.asarray(x))
    assert ys.shape == (1, 4, 3 * 4, 2)
    back = efficient_merge(ys, 5, 7)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_cross_scan_merge_fullres():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 4, 6, 3)).astype(np.float32)
    xs = cross_scan(jnp.asarray(x))
    assert xs.shape == (2, 4, 24, 3)
    # direction semantics
    np.testing.assert_array_equal(np.asarray(xs[:, 0]), x.reshape(2, -1, 3))
    np.testing.assert_array_equal(
        np.asarray(xs[:, 1]), x.transpose(0, 2, 1, 3).reshape(2, -1, 3))
    np.testing.assert_array_equal(
        np.asarray(xs[:, 2]), x.reshape(2, -1, 3)[:, ::-1])
    # merge of the scan itself = 4x the input
    merged = cross_merge(xs, 4, 6)
    np.testing.assert_allclose(np.asarray(merged), 4 * x, rtol=1e-6)
