"""Data pipeline tests on synthetic on-disk datasets (loader semantics of
`TaskFusion_dataset.py`: discovery, resize, Y extraction, label handling)."""
import os

import numpy as np
import pytest
from PIL import Image

from fusionmamba_tpu.data import DatasetRoots, FusionDataset, batch_iterator
from fusionmamba_tpu.data.color import reinject_y, rgb_to_y
from fusionmamba_tpu.data.prefetch import threaded_batches


@pytest.fixture(scope="module")
def pst900_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pst900")
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        for sub in ("rgb", "thermal", "labels"):
            os.makedirs(root / split / sub)
        for i in range(5):
            rgb = rng.integers(0, 255, (30, 40, 3), np.uint8)
            th = rng.integers(0, 255, (30, 40), np.uint8)
            lbl = rng.integers(0, 5, (30, 40)).astype(np.uint8)
            Image.fromarray(rgb).save(root / split / "rgb" / f"{i:02d}.png")
            Image.fromarray(th).save(
                root / split / "thermal" / f"{i:02d}.png")
            Image.fromarray(lbl).save(
                root / split / "labels" / f"{i:02d}.png")
    return str(root)


def test_pst900_loader(pst900_root):
    roots = DatasetRoots(pst900=pst900_root)
    ds = FusionDataset(split="train", dataset_name="pst900", roots=roots,
                       size=(64, 64))
    assert len(ds) == 5
    vis_y, ir, lbl = ds[0]
    assert vis_y.shape == (64, 64, 1) and vis_y.dtype == np.float32
    assert ir.shape == (64, 64, 1)
    assert lbl.shape == (64, 64) and lbl.dtype == np.int32
    assert 0.0 <= vis_y.min() and vis_y.max() <= 1.0
    assert lbl.max() <= 8


def test_batch_iterator(pst900_root):
    roots = DatasetRoots(pst900=pst900_root)
    ds = FusionDataset(split="train", dataset_name="pst900", roots=roots,
                       size=(32, 32))
    batches = list(batch_iterator(ds, 2, shuffle=True, seed=0))
    assert len(batches) == 2  # 5 samples, drop_last
    vis, ir, lbl = batches[0]
    assert vis.shape == (2, 32, 32, 1)
    assert lbl.shape == (2, 32, 32)


def test_threaded_batches(pst900_root):
    roots = DatasetRoots(pst900=pst900_root)
    ds = FusionDataset(split="train", dataset_name="pst900", roots=roots,
                       size=(32, 32))
    batches = list(threaded_batches(ds, 2, shuffle=False, num_workers=2,
                                    prefetch=2))
    assert len(batches) == 2
    ref = list(batch_iterator(ds, 2, shuffle=False))
    np.testing.assert_array_equal(batches[0][0], ref[0][0])


def test_acod_label_binarization(tmp_path):
    root = tmp_path / "acod"
    for sub in ("Imgs", "Depth", "GT"):
        os.makedirs(root / "Train" / sub)
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (20, 20, 3), np.uint8)
    gt = (rng.integers(0, 2, (20, 20)) * 255).astype(np.uint8)
    Image.fromarray(rgb).save(root / "Train" / "Imgs" / "a_left_0.png")
    Image.fromarray(rgb[..., 0]).save(
        root / "Train" / "Depth" / "a_depth_0.png")
    Image.fromarray(gt).save(root / "Train" / "GT" / "a_left_0.png")
    ds = FusionDataset(split="train", dataset_name="acod",
                       roots=DatasetRoots(acod=str(root)), size=(16, 16))
    assert len(ds) == 1
    _, _, lbl = ds[0]
    assert set(np.unique(lbl)).issubset({0, 1})


def test_y_extraction_and_reinjection():
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 255, (16, 16, 3), np.uint8)
    y = rgb_to_y(rgb.astype(np.float32))
    assert y.shape == (16, 16)
    out = reinject_y(np.round(y).astype(np.uint8), rgb)
    assert out.shape == rgb.shape and out.dtype == np.uint8
    # re-injecting the image's own Y channel approximately reproduces it
    assert np.mean(np.abs(out.astype(int) - rgb.astype(int))) < 3.0


def test_synthetic_dataset_contract():
    from fusionmamba_tpu.data import SyntheticFusionDataset, batch_iterator

    ds = SyntheticFusionDataset(length=5, size=(64, 64))
    assert len(ds) == 5 and not ds.has_labels
    vis_y, ir = ds[0]
    assert vis_y.shape == (64, 64, 1) and ir.shape == (64, 64, 1)
    assert vis_y.dtype == np.float32 and 0 <= vis_y.min() <= vis_y.max() <= 1
    np.testing.assert_array_equal(ds[0][0], vis_y)  # deterministic

    seg = SyntheticFusionDataset(length=4, size=(64, 64), num_classes=9)
    v, i, lbl = seg[2]
    assert lbl.shape == (64, 64) and lbl.dtype == np.int32
    assert lbl.min() >= 0 and lbl.max() < 9
    batches = list(batch_iterator(seg, 2, shuffle=False))
    assert len(batches) == 2 and batches[0][2].shape == (2, 64, 64)

    binary = SyntheticFusionDataset(length=2, size=(32, 32), num_classes=1)
    assert set(np.unique(binary[0][2])).issubset({0, 1})
