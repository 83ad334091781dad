"""Fusion dataset (NHWC, numpy) with the reference loader semantics.

Re-implements `TaskFusion_dataset.py:37-302` without torch:
  * per-dataset discovery: ACOD-12K RGB+Depth+GT with `_left_`->`_depth_`
    filename mapping (:72-97), MFNet RGB(.png)+thermal(.jpg)+labels (:99-134)
    and test split via `test.txt` (:200-240), PST900 rgb+thermal+labels with
    corrupted-file validation (:136-198), generic paired-folder test mode
    (:60-69);
  * item pipeline: BGR->RGB, PIL bicubic resize to 256x256, RGB->gray Y
    channel, /255 float32 (:242-292); labels nearest-resized, ACOD binarized
    at 127, others clipped to [0, 8] (:269-281); bad-file skip loop
    (:244-255).
Dataset roots are configurable (the reference hardcodes absolute paths).
Outputs are NHWC float32: (vis_y (H,W,1), ir (H,W,1)[, label (H,W) int32]).
"""
from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field
from typing import Iterator, Sequence

import numpy as np
from PIL import Image

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

IMG_EXTS = (".bmp", ".tif", ".jpg", ".png")


def _imread_color_rgb(path: str) -> np.ndarray | None:
    if _HAS_CV2:
        img = cv2.imread(path)
        if img is None:
            return None
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    try:
        return np.asarray(Image.open(path).convert("RGB"))
    except Exception:
        return None


def _imread_gray(path: str) -> np.ndarray | None:
    if _HAS_CV2:
        return cv2.imread(path, 0)
    try:
        return np.asarray(Image.open(path).convert("L"))
    except Exception:
        return None


def _pil_resize(arr: np.ndarray, size_hw: Sequence[int],
                interp: str = "bicubic") -> np.ndarray:
    """PIL-backed resize matching the reference `imresize`
    (`TaskFusion_dataset.py:11-24`): size given (H, W), PIL takes (W, H)."""
    resample = {"nearest": 0, "lanczos": 1, "bilinear": 2, "bicubic": 3}[interp]
    im = Image.fromarray(arr)
    return np.array(im.resize((size_hw[1], size_hw[0]), resample=resample))


def _rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    if _HAS_CV2:
        return cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    # cv2/ITU-R BT.601 luma
    g = rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    return np.round(g).astype(rgb.dtype)


def prepare_data_path(dataset_path: str):
    """Generic paired-folder discovery (`TaskFusion_dataset.py:26-35`)."""
    data = []
    for ext in IMG_EXTS:
        data.extend(glob.glob(os.path.join(dataset_path, f"*{ext}")))
    data.sort()
    names = sorted(os.listdir(dataset_path))
    return data, names


@dataclass
class DatasetRoots:
    """Filesystem layout per dataset (reference defaults at
    `TaskFusion_dataset.py:74,101,138,170,202` are absolute paths on the
    authors' machines; override via env FUSIONMAMBA_DATA_ROOT or directly)."""
    acod: str = ""
    mfnet: str = ""
    pst900: str = ""

    @classmethod
    def from_env(cls) -> "DatasetRoots":
        base = os.environ.get("FUSIONMAMBA_DATA_ROOT", "/data")
        return cls(
            acod=os.path.join(base, "ACOD-12K"),
            mfnet=os.path.join(base, "MFNet", "ir_seg_dataset"),
            pst900=os.path.join(base, "PST900_RGBT_Dataset"),
        )


@dataclass
class FusionDataset:
    split: str = "train"
    dataset_name: str = "acod"
    ir_path: str | None = None
    vi_path: str | None = None
    length: int = 0
    size: tuple = (256, 256)
    roots: DatasetRoots = field(default_factory=DatasetRoots.from_env)

    def __post_init__(self):
        assert self.split in ("train", "val", "test")
        self.filepath_vis: list[str] = []
        self.filepath_ir: list[str] = []
        self.filepath_labels: list[str] = []
        if self.split == "train":
            loader = {
                "acod": self._load_acod,
                "mfnet": self._load_mfnet,
                "pst900": lambda: self._load_pst900("train"),
            }.get(self.dataset_name)
            if loader is None:
                raise ValueError(f"Unknown dataset: {self.dataset_name}")
            loader()
        else:
            if self.dataset_name == "pst900":
                self._load_pst900("test")
            elif self.dataset_name == "mfnet":
                self._load_mfnet_test()
            else:
                self.filepath_vis, _ = prepare_data_path(self.vi_path)
                self.filepath_ir, _ = prepare_data_path(self.ir_path)
        if self.length == 0 or self.length > len(self.filepath_vis):
            self.length = len(self.filepath_vis)

    # ------------------------------------------------------------------ #
    def _load_acod(self):
        base = os.path.join(self.roots.acod, "Train")
        d_vis = os.path.join(base, "Imgs")
        d_ir = os.path.join(base, "Depth")
        d_gt = os.path.join(base, "GT")
        for f in sorted(os.listdir(d_vis)):
            if not f.endswith(IMG_EXTS):
                continue
            p_vis = os.path.join(d_vis, f)
            p_ir = os.path.join(d_ir, f.replace("_left_", "_depth_"))
            p_gt = os.path.join(d_gt, f)
            if os.path.exists(p_ir) and os.path.exists(p_gt):
                self.filepath_vis.append(p_vis)
                self.filepath_ir.append(p_ir)
                self.filepath_labels.append(p_gt)

    def _load_mfnet(self):
        base = self.roots.mfnet
        d_vis = os.path.join(base, "images")
        d_ir = os.path.join(base, "visual")
        d_lbl = os.path.join(base, "labels")
        for f in sorted(os.listdir(d_vis)):
            if not f.endswith(".png"):
                continue
            p_ir = os.path.join(d_ir, f.replace(".png", ".jpg"))
            p_lbl = os.path.join(d_lbl, f)
            if os.path.exists(p_ir) and os.path.exists(p_lbl):
                self.filepath_vis.append(os.path.join(d_vis, f))
                self.filepath_ir.append(p_ir)
                self.filepath_labels.append(p_lbl)

    def _load_mfnet_test(self):
        base = self.roots.mfnet
        with open(os.path.join(base, "test.txt")) as f:
            ids = [line.strip() for line in f]
        for fid in ids:
            p_vis = os.path.join(base, "images", f"{fid}.png")
            p_ir = os.path.join(base, "visual", f"{fid}.jpg")
            p_lbl = os.path.join(base, "labels", f"{fid}.png")
            if all(os.path.exists(p) for p in (p_vis, p_ir, p_lbl)):
                if _imread_color_rgb(p_vis) is None:
                    continue
                self.filepath_vis.append(p_vis)
                self.filepath_ir.append(p_ir)
                self.filepath_labels.append(p_lbl)

    def _load_pst900(self, split: str):
        base = os.path.join(self.roots.pst900, split)
        d_vis = os.path.join(base, "rgb")
        d_ir = os.path.join(base, "thermal")
        d_lbl = os.path.join(base, "labels")
        for f in sorted(os.listdir(d_vis)):
            if not f.endswith(IMG_EXTS):
                continue
            p_vis = os.path.join(d_vis, f)
            p_ir = os.path.join(d_ir, f)
            p_lbl = os.path.join(d_lbl, f)
            if os.path.exists(p_ir) and os.path.exists(p_lbl):
                if (_imread_color_rgb(p_vis) is None
                        or _imread_gray(p_ir) is None
                        or _imread_gray(p_lbl) is None):
                    continue
                self.filepath_vis.append(p_vis)
                self.filepath_ir.append(p_ir)
                self.filepath_labels.append(p_lbl)

    # ------------------------------------------------------------------ #
    @property
    def has_labels(self) -> bool:
        return len(self.filepath_labels) > 0

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, index: int):
        from . import native as _native

        attempts = 0
        n = len(self.filepath_vis)
        while attempts < n:
            vis = _imread_color_rgb(self.filepath_vis[index])
            ir = _imread_gray(self.filepath_ir[index])
            if vis is None or ir is None:
                index = (index + 1) % n
                attempts += 1
                continue
            if _native.available():
                # fused C++ path (native/preprocess.cpp): PIL-exact bicubic
                # resize + BT.601 gray + /255, GIL-free
                vis_y, ir = _native.preprocess_pair(vis, ir, self.size)
            else:
                ir = _pil_resize(ir, self.size, "bicubic")
                vis = _pil_resize(vis, self.size, "bicubic")
                vis_y = _rgb_to_gray(vis).astype(np.float32) / 255.0
                ir = ir.astype(np.float32)[..., None] / 255.0
                vis_y = vis_y[..., None]
            if self.has_labels:
                lbl = _imread_gray(self.filepath_labels[index])
                if lbl is not None:
                    lbl = _pil_resize(lbl, self.size, "nearest")
                    lbl = lbl.astype(np.float32)
                    if self.dataset_name == "acod":
                        lbl = (lbl > 127).astype(np.float32)
                    else:
                        lbl = np.clip(np.round(lbl), 0, 8)
                    return vis_y, ir, lbl.astype(np.int32)
            return vis_y, ir
        raise ValueError(
            f"All attempts to load images failed for {self.dataset_name}")


class SyntheticFusionDataset:
    """Drop-in stand-in for `FusionDataset` yielding deterministic random
    pairs (and labels), so the train/eval CLIs can be driven end-to-end on
    machines where the real datasets (reference `README.md` download links)
    are unavailable. Item contract matches `FusionDataset.__getitem__`:
    (vis_y, ir) float32 HWC in [0,1], plus an int32 HW label when
    `num_classes` is set (binary for num_classes=1, matching acod's
    thresholded GT; class ids otherwise).
    """

    def __init__(self, length: int = 32, size: tuple = (256, 256),
                 num_classes: int | None = None, seed: int = 0):
        self.length = length
        self.size = size
        self.num_classes = num_classes
        self.seed = seed

    @property
    def has_labels(self) -> bool:
        return self.num_classes is not None

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, index: int):
        rng = np.random.default_rng(self.seed * 100003 + index)
        h, w = self.size
        # smooth low-frequency fields (upsampled coarse noise) look closer
        # to natural images than white noise: losses/metrics get realistic
        # gradients and SSIM windows see structure
        def field():
            coarse = rng.uniform(0, 1, (h // 16, w // 16)).astype(np.float32)
            return np.kron(coarse, np.ones((16, 16), np.float32))
        vis_y = field()[..., None]
        ir = field()[..., None]
        if self.num_classes is None:
            return vis_y, ir
        if self.num_classes == 1:
            lbl = (field() > 0.5).astype(np.int32)
        else:
            lbl = rng.integers(0, self.num_classes,
                               (h // 32, w // 32)).astype(np.int32)
            lbl = np.kron(lbl, np.ones((32, 32), np.int32))
        return vis_y, ir, lbl


def batch_iterator(ds: FusionDataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True,
                   epochs: int | None = 1) -> Iterator[tuple]:
    """Simple epoch iterator yielding stacked NHWC numpy batches."""
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.arange(len(ds))
        if shuffle:
            rng.shuffle(order)
        for start in range(0, len(order), batch_size):
            idx = order[start:start + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            items = [ds[int(i)] for i in idx]
            yield tuple(np.stack(parts) for parts in zip(*items))
        epoch += 1
