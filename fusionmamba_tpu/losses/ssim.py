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

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.lru_cache(maxsize=None)
def _gaussian_vec(size: int, sigma: float = 1.5) -> tuple:
    x = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return tuple((g / g.sum()).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _band_matrix(taps: tuple, L: int, same: bool) -> np.ndarray:
    """(L, L_out) banded conv-as-matmul matrix: y = x @ B applies the 1-D
    filter `taps` along a length-L axis (VALID, or zero-padded SAME).

    Why a matmul: these filters run on single-channel images, where a
    depthwise conv uses 1 of the VPU's 128 lanes; as a dense banded matmul
    the same filter is one small MXU contraction (L <= 256 here), ~10x
    faster and exactly autodifferentiable (the torch reference convolves a
    2-D window per channel -- `pytorch_msssim/__init__.py:42-57`)."""
    k = len(taps)
    if same:
        out = np.arange(L)
        B = np.zeros((L, L), np.float32)
        off = (k - 1) // 2
        for t in range(k):
            rows = out + t - off
            ok = (rows >= 0) & (rows < L)
            B[rows[ok], out[ok]] = taps[t]
    else:
        Lout = L - k + 1
        out = np.arange(Lout)
        B = np.zeros((L, Lout), np.float32)
        for t in range(k):
            B[out + t, out] = taps[t]
    return B


def sep_filter2d(x: jnp.ndarray, taps_h: tuple, taps_w: tuple,
                 same: bool = False) -> jnp.ndarray:
    """Separable 2-D filter via two banded matmuls (fp32 MXU).

    Accepts (B, H, W) -- the fast path: both dots contract a naturally
    minor (h or w) axis, so no relayout -- or NHWC (B, H, W, C). A
    trailing C=1 axis is poison for the rank-4 einsum: XLA tiles the two
    minor dims (w, c) as (8, 128) with c=1 in lanes, 1/128 utilization,
    and surrounds every dot with layout copies (~16 ms/step measured at
    b24); callers squeeze to rank-3 instead (`ssim` does it implicitly).
    """
    Bh = jnp.asarray(_band_matrix(taps_h, x.shape[1], same))
    Bw = jnp.asarray(_band_matrix(taps_w, x.shape[2], same))
    hp = jax.lax.Precision.HIGHEST  # sigma = E[x^2]-mu^2 cancels ~1e-3;
    if x.ndim == 3:
        y = jnp.einsum("bhw,hj->bjw", x, Bh, precision=hp)
        return jnp.einsum("bjw,wk->bjk", y, Bw, precision=hp)
    y = jnp.einsum("bhwc,hj->bjwc", x, Bh, precision=hp)
    return jnp.einsum("bjwc,wk->bjkc", y, Bw, precision=hp)


def _depthwise_valid(x: jnp.ndarray, gi: tuple) -> jnp.ndarray:
    """Gaussian-window VALID smoothing (both axes) as banded matmuls."""
    return sep_filter2d(x, gi, gi, same=False)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         val_range: float | None = None, full: bool = False,
         splits: int = 1):
    """img1, img2: (B, H, W, C) or (B, H, W). Returns scalar mean SSIM
    (and cs if full). Single-channel NHWC is squeezed to rank-3 so the
    banded matmuls run in the copy-free layout (see `sep_filter2d`).

    splits > 1: the batch is `splits` independent groups stacked on axis 0
    (equal sizes); means are taken per group and a (splits,)-vector is
    returned. Lets a caller run several SSIM comparisons through ONE
    filter pyramid (fusion_loss batches its two msssim calls this way)."""
    if img1.ndim == 4 and img1.shape[-1] == 1:
        img1, img2 = img1[..., 0], img2[..., 0]
    if val_range is None:
        max_val = jnp.where(jnp.max(img1) > 128.0, 255.0, 1.0)
        min_val = jnp.where(jnp.min(img1) < -0.5, -1.0, 0.0)
        L = max_val - min_val
    else:
        L = jnp.float32(val_range)

    real_size = min(window_size, img1.shape[1], img1.shape[2])
    win = _gaussian_vec(real_size)

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
    ssim_map = ((2.0 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    if splits == 1:
        cs = jnp.mean(v1 / v2)
        ret = jnp.mean(ssim_map)
    else:
        cs = jnp.mean((v1 / v2).reshape(splits, -1), axis=1)
        ret = jnp.mean(ssim_map.reshape(splits, -1), axis=1)
    if full:
        return ret, cs
    return ret


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    dims = (1, 2, 2, 1)[: x.ndim]
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, dims, dims, "VALID") / 4.0


def msssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
           val_range: float | None = None, normalize: bool = False,
           splits: int = 1):
    """5-level MS-SSIM. With splits > 1 the batch holds `splits` stacked
    comparison groups and a (splits,)-vector is returned (see `ssim`).

    The reference combines levels as `prod(pow1[:-1] * pow2[-1])`
    (`pytorch_msssim/__init__.py:100-103`) = prod_{i<4} mcs_i^w_i *
    mssim_4^(4*w_4). Computed here as a running scalar product instead of
    stack+prod: per-level mssim_i (i<4) and mcs_4 are never used, so XLA
    DCEs their map computations, and no tiny f32[5] concatenates appear on
    device (each measured ~0.9 ms/op at b24 -- scalar-stream stalls)."""
    if img1.ndim == 4 and img1.shape[-1] == 1:
        img1, img2 = img1[..., 0], img2[..., 0]
    levels = len(_MSSSIM_WEIGHTS)
    res = jnp.ones((splits,) if splits > 1 else (), jnp.float32)
    for i in range(levels):
        last = i == levels - 1
        sim, cs = ssim(img1, img2, window_size, val_range, full=True,
                       splits=splits)
        val = sim if last else cs
        if normalize:
            val = (val + 1.0) / 2.0
        w = _MSSSIM_WEIGHTS[i] * ((levels - 1) if last else 1)
        res = res * val ** w
        if not last:
            img1 = _avg_pool2(img1)
            img2 = _avg_pool2(img2)
    return res
