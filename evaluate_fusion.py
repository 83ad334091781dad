"""Fusion-quality / parity evaluation CLI.

Computes the standard image-fusion metrics (Qabf, EN, SD, MI, SSIM to each
source) over a folder of fused outputs, and -- when given a directory of
reference-implementation outputs -- the BASELINE.json parity metric
SSIM(ours, reference) per pair (north star: >= 0.999).

Usage:
  python evaluate_fusion.py --ir_dir D1 --vis_dir D2 --fused_dir D3 \
      [--ref_dir D4] [--out results.txt]

Files are matched by basename across directories (the reference test.py
writes outputs under the input basename, `test.py:95-100`).
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from fusionmamba_tpu.eval import fusion_report


def _load_gray(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("L"), np.float64) / 255.0


def _index(d: str) -> dict:
    out = {}
    for name in sorted(os.listdir(d)):
        if name.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tif")):
            out[os.path.splitext(name)[0]] = os.path.join(d, name)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ir_dir", required=True)
    ap.add_argument("--vis_dir", required=True)
    ap.add_argument("--fused_dir", required=True)
    ap.add_argument("--ref_dir", default=None,
                    help="reference implementation's fused outputs "
                         "(enables the SSIM-parity column)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    ir = _index(args.ir_dir)
    vis = _index(args.vis_dir)
    fused = _index(args.fused_dir)
    ref = _index(args.ref_dir) if args.ref_dir else {}
    keys = sorted(set(ir) & set(vis) & set(fused))
    if not keys:
        raise SystemExit("no matching basenames across directories")

    rows = []
    for k in keys:
        size = Image.open(fused[k]).size
        def load(path):
            img = Image.open(path).convert("L")
            if img.size != size:
                img = img.resize(size, Image.BICUBIC)
            return np.asarray(img, np.float64) / 255.0
        rep = fusion_report(load(vis[k]), load(ir[k]), _load_gray(fused[k]),
                            load(ref[k]) if k in ref else None)
        rows.append((k, rep))

    metrics = sorted({m for _, rep in rows for m in rep})
    lines = ["name\t" + "\t".join(metrics)]
    for k, rep in rows:
        lines.append(k + "\t" + "\t".join(
            f"{rep.get(m, float('nan')):.4f}" for m in metrics))
    means = {m: float(np.nanmean([rep.get(m, np.nan) for _, rep in rows]))
             for m in metrics}
    lines.append("MEAN\t" + "\t".join(f"{means[m]:.4f}" for m in metrics))
    text = "\n".join(lines)
    print(text)
    if "ssim_vs_reference" in means:
        ok = means["ssim_vs_reference"] >= 0.999
        print(f"\nparity SSIM vs reference: {means['ssim_vs_reference']:.5f} "
              f"({'PASS' if ok else 'BELOW'} 0.999 north star)")
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"written: {args.out}")


if __name__ == "__main__":
    main()
