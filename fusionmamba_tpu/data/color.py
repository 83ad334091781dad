"""Y <-> RGB color-space pre/post utilities.

Covers the reference's offline tools (`RGB2Y.py`, `YtoRGB.py`,
`changesizeandY2RGB`) for PET/SPECT-MRI fusion: extract the luma (Y) channel
before fusing, then re-inject the fused Y into the source chroma. Both
array-level functions (jit-friendly float math) and file-level batch drivers
are provided.
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def rgb_to_y(rgb: np.ndarray) -> np.ndarray:
    """Y channel (ITU-R BT.601 full-range, the PIL/cv2 YCbCr convention).
    rgb uint8 or float [0,255]; returns same scale."""
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
            + 0.114 * rgb[..., 2])


def rgb_to_ycrcb(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 128.0
    cb = (b - y) * 0.564 + 128.0
    return np.stack([y, cr, cb], axis=-1)


def ycrcb_to_rgb(ycrcb: np.ndarray) -> np.ndarray:
    y, cr, cb = ycrcb[..., 0], ycrcb[..., 1], ycrcb[..., 2]
    r = y + 1.403 * (cr - 128.0)
    g = y - 0.714 * (cr - 128.0) - 0.344 * (cb - 128.0)
    b = y + 1.773 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def reinject_y(fused_y: np.ndarray, original_rgb: np.ndarray) -> np.ndarray:
    """Replace the Y channel of original_rgb with fused_y (uint8 in, uint8
    out), matching `YtoRGB.py:12-27` / `changesizeandY2RGB:13-45`."""
    if _HAS_CV2:
        if fused_y.shape[:2] != original_rgb.shape[:2]:
            fused_y = cv2.resize(
                fused_y, (original_rgb.shape[1], original_rgb.shape[0]))
        ycrcb = cv2.cvtColor(original_rgb, cv2.COLOR_RGB2YCrCb)
        ycrcb[:, :, 0] = fused_y
        return cv2.cvtColor(ycrcb, cv2.COLOR_YCrCb2RGB)
    if fused_y.shape[:2] != original_rgb.shape[:2]:
        fused_y = np.array(Image.fromarray(fused_y).resize(
            (original_rgb.shape[1], original_rgb.shape[0]), resample=3))
    ycrcb = rgb_to_ycrcb(original_rgb.astype(np.float32))
    ycrcb[..., 0] = fused_y.astype(np.float32)
    return np.clip(ycrcb_to_rgb(ycrcb), 0, 255).astype(np.uint8)


def extract_y_dir(input_path: str, output_path: str) -> int:
    """Batch Y-channel extraction (`RGB2Y.py:19-29`): RGB -> PIL YCbCr Y,
    saved as PNG. Returns count processed."""
    os.makedirs(output_path, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(input_path)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
            continue
        with Image.open(os.path.join(input_path, name)) as img:
            if img.mode != "RGB":
                img = img.convert("RGB")
            y = img.convert("YCbCr").split()[0]
            out = os.path.splitext(name)[0] + ".png"
            y.save(os.path.join(output_path, out), format="PNG")
            count += 1
    return count


def reinject_y_dir(fused_dir: str, rgb_dir: str, output_dir: str) -> int:
    """Batch chroma re-injection (`YtoRGB.py`). Matches files by name."""
    os.makedirs(output_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(rgb_dir)):
        fp = os.path.join(fused_dir, name)
        rp = os.path.join(rgb_dir, name)
        if not os.path.exists(fp):
            continue
        fused = np.asarray(Image.open(fp).convert("L"))
        rgb = np.asarray(Image.open(rp).convert("RGB"))
        out = reinject_y(fused, rgb)
        Image.fromarray(out).save(os.path.join(output_dir, name))
        count += 1
    return count
