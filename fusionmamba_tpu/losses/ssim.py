"""SSIM / MS-SSIM (NHWC, jnp), matching the vendored `pytorch_msssim`.

Parity notes vs `pytorch_msssim/__init__.py`:
  * Gaussian window 11, sigma 1.5, VALID padding, depthwise (:11-21, :42-57);
  * dynamic value range L from data when val_range is None (:26-40);
  * 5-level pyramid with avg-pool 2x2 and weights
    [0.0448, 0.2856, 0.3001, 0.2363, 0.1333] (:78-104);
  * normalize=True maps both stacks through (x+1)/2 (:96-98);
  * the final combination is `prod(pow1[:-1] * pow2[-1])` (:100-103), which
    raises the last-level SSIM to (levels-1) times its weight -- a quirk of
    the vendored implementation, reproduced faithfully because the training
    loss depends on it.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _depthwise_valid(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise VALID conv with the (separable) Gaussian window.

    Runs as two 1-D passes -- the outer-product window factors exactly, and
    separable depthwise convs lower ~10x better on TPU than the full k*k
    tap set (the torch reference convolves the 2-D window directly)."""
    c = x.shape[-1]
    k = win.shape[0]
    # factor exactly: win[i, j] = gi[i] * gi[j] (rank-1 by construction),
    # so gi = win[:, m] / sqrt(win[m, m]) for any column m
    m = k // 2
    gi = win[:, m] / jnp.sqrt(win[m, m])
    kv = gi.reshape(k, 1, 1, 1)
    kh = gi.reshape(1, k, 1, 1)
    kv = jnp.broadcast_to(kv, (k, 1, 1, c))
    kh = jnp.broadcast_to(kh, (1, k, 1, c))
    opts = dict(feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, kv, window_strides=(1, 1), padding="VALID", **opts)
    return jax.lax.conv_general_dilated(
        x, kh, window_strides=(1, 1), padding="VALID", **opts)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         val_range: float | None = None, full: bool = False):
    """img1, img2: (B, H, W, C). Returns scalar mean SSIM (and cs if full)."""
    if val_range is None:
        max_val = jnp.where(jnp.max(img1) > 128.0, 255.0, 1.0)
        min_val = jnp.where(jnp.min(img1) < -0.5, -1.0, 0.0)
        L = max_val - min_val
    else:
        L = jnp.float32(val_range)

    real_size = min(window_size, img1.shape[1], img1.shape[2])
    win = _gaussian_window(real_size)

    mu1 = _depthwise_valid(img1, win)
    mu2 = _depthwise_valid(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _depthwise_valid(img1 * img1, win) - mu1_sq
    sigma2_sq = _depthwise_valid(img2 * img2, win) - mu2_sq
    sigma12 = _depthwise_valid(img1 * img2, win) - mu1_mu2

    C1 = (0.01 * L) ** 2
    C2 = (0.03 * L) ** 2
    v1 = 2.0 * sigma12 + C2
    v2 = sigma1_sq + sigma2_sq + C2
    cs = jnp.mean(v1 / v2)
    ssim_map = ((2.0 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    ret = jnp.mean(ssim_map)
    if full:
        return ret, cs
    return ret


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def msssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
           val_range: float | None = None, normalize: bool = False):
    weights = jnp.asarray(_MSSSIM_WEIGHTS, jnp.float32)
    levels = len(_MSSSIM_WEIGHTS)
    mssim, mcs = [], []
    for _ in range(levels):
        sim, cs = ssim(img1, img2, window_size, val_range, full=True)
        mssim.append(sim)
        mcs.append(cs)
        img1 = _avg_pool2(img1)
        img2 = _avg_pool2(img2)
    mssim = jnp.stack(mssim)
    mcs = jnp.stack(mcs)
    if normalize:
        mssim = (mssim + 1.0) / 2.0
        mcs = (mcs + 1.0) / 2.0
    pow1 = mcs ** weights
    pow2 = mssim ** weights
    return jnp.prod(pow1[:-1] * pow2[-1])
