"""2-D cross-scan / cross-merge layout ops (NHWC, pure reshape/transpose).

Two families, both expressed so XLA lowers them to layout changes rather than
real gathers (the reference implements them as strided scatter/gather autograd
Functions -- `models/cross.py:139-190` (EfficientScan), `:34-88`
(EfficientMerge) -- and as stack/flip/transpose for the full-resolution
variant -- `models/vmamba_Fusion_efficross.py:398-429`):

* `efficient_scan` / `efficient_merge`: stride-2 spatial decimation into four
  direction sequences of length (H/2)*(W/2):
    k=0: (h even, w even), row-major      k=1: (h odd,  w even), column-major
    k=2: (h even, w odd),  row-major      k=3: (h odd,  w odd),  column-major
  `efficient_merge` is the exact inverse interleave.
* `cross_scan` / `cross_merge`: full-resolution four directions
  (row-major, column-major, and both reversed); merge sums the four outputs
  after undoing each ordering.

No custom VJPs needed: JAX autodiff of reshape/transpose/flip is exact and
the transpose of an interleave is the matching de-interleave.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def efficient_scan(x: jax.Array, step: int = 2) -> jax.Array:
    """(B, H, W, C) -> (B, 4, ceil(H/2)*ceil(W/2), C)."""
    if step != 2:
        raise NotImplementedError("reference semantics use step_size=2")
    B, H, W, C = x.shape
    pad_h = (-H) % step
    pad_w = (-W) % step
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    H2, W2 = x.shape[1] // step, x.shape[2] // step
    xq = x.reshape(B, H2, step, W2, step, C)
    d0 = xq[:, :, 0, :, 0, :].reshape(B, H2 * W2, C)
    d1 = xq[:, :, 1, :, 0, :].transpose(0, 2, 1, 3).reshape(B, W2 * H2, C)
    d2 = xq[:, :, 0, :, 1, :].reshape(B, H2 * W2, C)
    d3 = xq[:, :, 1, :, 1, :].transpose(0, 2, 1, 3).reshape(B, W2 * H2, C)
    return jnp.stack([d0, d1, d2, d3], axis=1)


def efficient_merge(ys: jax.Array, ori_h: int, ori_w: int,
                    step: int = 2) -> jax.Array:
    """(B, 4, L, C) -> (B, ori_h, ori_w, C), inverse of `efficient_scan`."""
    if step != 2:
        raise NotImplementedError("reference semantics use step_size=2")
    B, K, L, C = ys.shape
    H2 = -(-ori_h // step)
    W2 = -(-ori_w // step)
    q00 = ys[:, 0].reshape(B, H2, W2, C)
    q10 = ys[:, 1].reshape(B, W2, H2, C).transpose(0, 2, 1, 3)
    q01 = ys[:, 2].reshape(B, H2, W2, C)
    q11 = ys[:, 3].reshape(B, W2, H2, C).transpose(0, 2, 1, 3)
    even_h = jnp.stack([q00, q01], axis=3)   # (B, H2, W2, 2, C): w interleave
    odd_h = jnp.stack([q10, q11], axis=3)
    y = jnp.stack([even_h, odd_h], axis=2)   # (B, H2, 2, W2, 2, C)
    y = y.reshape(B, H2 * step, W2 * step, C)
    return y[:, :ori_h, :ori_w, :]


def cross_scan(x: jax.Array) -> jax.Array:
    """Full-resolution four-direction scan: (B, H, W, C) -> (B, 4, H*W, C)."""
    B, H, W, C = x.shape
    hw = x.reshape(B, H * W, C)
    wh = x.transpose(0, 2, 1, 3).reshape(B, W * H, C)
    return jnp.stack([hw, wh, jnp.flip(hw, axis=1), jnp.flip(wh, axis=1)],
                     axis=1)


def cross_merge(ys: jax.Array, H: int, W: int) -> jax.Array:
    """Sum the four direction outputs back to (B, H, W, C)."""
    B, K, L, C = ys.shape
    y0 = ys[:, 0]
    y1 = ys[:, 1].reshape(B, W, H, C).transpose(0, 2, 1, 3).reshape(B, L, C)
    y2 = jnp.flip(ys[:, 2], axis=1)
    y3 = jnp.flip(ys[:, 3], axis=1).reshape(B, W, H, C)
    y3 = y3.transpose(0, 2, 1, 3).reshape(B, L, C)
    return (y0 + y1 + y2 + y3).reshape(B, H, W, C)
