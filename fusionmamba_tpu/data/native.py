"""ctypes binding for the native preprocessing library (native/preprocess.cpp).

Falls back to the PIL/cv2 Python path when the shared library has not been
built (`make -C native`). Note: PIL's uint8 resampling uses 8.8 fixed-point
coefficient precision internally while the native kernel accumulates in
double, so outputs may differ from PIL by +-1 LSB; the normalized float
outputs differ by <= 1/255.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libpreprocess.so"),
    "libpreprocess.so",
]

_lib = None
for _p in _LIB_PATHS:
    try:
        _lib = ctypes.CDLL(_p)
        break
    except OSError:
        continue

if _lib is not None:
    _u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    _f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    _lib.resize_bicubic_u8.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _u8p, ctypes.c_int, ctypes.c_int]
    _lib.rgb_to_gray_u8.argtypes = [_u8p, ctypes.c_int, ctypes.c_int, _u8p]
    _lib.normalize_u8_to_f32.argtypes = [_u8p, ctypes.c_int, _f32p]
    _lib.preprocess_pair_item.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int,
        _u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, _f32p, _f32p]
    _lib.preprocess_num_threads.restype = ctypes.c_int


def available() -> bool:
    return _lib is not None


def resize_bicubic(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """uint8 (H, W) or (H, W, C) -> (out_h, out_w[, C]), PIL-BICUBIC
    semantics."""
    assert _lib is not None
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), np.uint8)
    _lib.resize_bicubic_u8(img, h, w, c, out, out_h, out_w)
    return out[..., 0] if squeeze else out


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    assert _lib is not None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    out = np.empty((h, w), np.uint8)
    _lib.rgb_to_gray_u8(rgb, h, w, out)
    return out


def preprocess_pair(rgb: np.ndarray, ir: np.ndarray,
                    out_hw=(256, 256)) -> tuple[np.ndarray, np.ndarray]:
    """Fused resize + gray + normalize: returns (vis_y, ir) float32
    (H, W, 1) in [0, 1]."""
    assert _lib is not None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    ir = np.ascontiguousarray(ir, np.uint8)
    oh, ow = out_hw
    vis_y = np.empty((oh, ow), np.float32)
    ir_out = np.empty((oh, ow), np.float32)
    _lib.preprocess_pair_item(
        rgb, rgb.shape[0], rgb.shape[1],
        ir, ir.shape[0], ir.shape[1], oh, ow, vis_y, ir_out)
    return vis_y[..., None], ir_out[..., None]


def num_threads() -> int:
    return _lib.preprocess_num_threads() if _lib is not None else 0
