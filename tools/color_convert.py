"""Offline color-space pre/post CLI (reference: `RGB2Y.py`, `YtoRGB.py`,
`changesizeandY2RGB` in /root/reference).

Subcommands:
  rgb2y    extract the Y (luma) channel from every RGB image in a folder
           (used to prepare PET/SPECT inputs -- `RGB2Y.py:19-29`)
  y2rgb    re-inject fused Y images into the chroma of the original RGB
           folder (`YtoRGB.py:12-27`, resize variant `changesizeandY2RGB`)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("rgb2y", help="extract Y channel from RGB folder")
    p1.add_argument("--input", required=True)
    p1.add_argument("--output", required=True)
    p2 = sub.add_parser("y2rgb", help="re-inject fused Y into RGB chroma")
    p2.add_argument("--fused", required=True, help="fused Y images folder")
    p2.add_argument("--rgb", required=True, help="original RGB folder")
    p2.add_argument("--output", required=True)
    args = ap.parse_args()

    from fusionmamba_tpu.data.color import extract_y_dir, reinject_y_dir

    if args.cmd == "rgb2y":
        n = extract_y_dir(args.input, args.output)
    else:
        n = reinject_y_dir(args.fused, args.rgb, args.output)
    print(f"{args.cmd}: wrote {n} images to "
          f"{args.output}")


if __name__ == "__main__":
    main()
