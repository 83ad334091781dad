"""Dataset / metric audit CLI (reference components #34:
`check_test_classes.py`, `debug_data_distribution.py`,
`debug_metrics_discrepancy.py`, `test_macc.py`).

Subcommands:
  classes  -- label-class distribution of a split (check_test_classes)
  dist     -- train/test class-distribution comparison (debug_data_distribution)
  macc     -- A/B the two mAcc definitions on synthetic data (test_macc)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def audit_classes(dataset: str, split: str, num_classes: int, limit: int):
    from fusionmamba_tpu.data import FusionDataset

    ds = FusionDataset(split=split, dataset_name=dataset)
    counts = np.zeros(num_classes, np.int64)
    n = min(limit or len(ds), len(ds))
    for i in range(n):
        item = ds[i]
        if len(item) < 3:
            continue
        counts += np.bincount(
            np.clip(item[2].flatten(), 0, num_classes - 1),
            minlength=num_classes)
    total = counts.sum()
    print(f"{dataset}/{split}: {n} samples")
    for c, cnt in enumerate(counts):
        print(f"  class {c}: {cnt} px ({100.0 * cnt / max(total, 1):.3f}%)")
    return counts


def macc_ab_check():
    """The two mAcc definitions on a synthetic example (test_macc.py:3-47):
    present-classes-only vs all-classes averaging."""
    rng = np.random.default_rng(0)
    target = rng.integers(0, 3, (64, 64))     # classes 0..2 of 5 present
    pred = target.copy()
    pred[rng.uniform(size=target.shape) < 0.2] = 0
    n_classes = 5
    accs_present, accs_all = [], []
    for c in range(n_classes):
        t = target == c
        if t.sum() > 0:
            acc = np.logical_and(t, pred == c).sum() / t.sum()
            accs_present.append(acc)
            accs_all.append(acc)
        else:
            accs_all.append(0.0)
    print(f"mAcc (present classes only): {np.mean(accs_present):.4f}")
    print(f"mAcc (all classes, absent=0): {np.mean(accs_all):.4f}")
    print("-> absent classes drag the all-classes variant down; the "
          "reference reports both (mfnet_segmentation_results.txt:3-4)")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("classes")
    p1.add_argument("--dataset", required=True)
    p1.add_argument("--split", default="test")
    p1.add_argument("--num_classes", type=int, default=9)
    p1.add_argument("--limit", type=int, default=0)
    p2 = sub.add_parser("dist")
    p2.add_argument("--dataset", required=True)
    p2.add_argument("--num_classes", type=int, default=9)
    p2.add_argument("--limit", type=int, default=0)
    sub.add_parser("macc")
    args = ap.parse_args()

    if args.cmd == "classes":
        audit_classes(args.dataset, args.split, args.num_classes, args.limit)
    elif args.cmd == "dist":
        tr = audit_classes(args.dataset, "train", args.num_classes,
                           args.limit)
        te = audit_classes(args.dataset, "test", args.num_classes,
                           args.limit)
        tr_f = tr / max(tr.sum(), 1)
        te_f = te / max(te.sum(), 1)
        print("class | train% | test% | ratio")
        for c in range(args.num_classes):
            r = te_f[c] / tr_f[c] if tr_f[c] > 0 else float("inf")
            print(f"{c:5d} | {100*tr_f[c]:6.3f} | {100*te_f[c]:6.3f} "
                  f"| {r:.2f}")
    else:
        macc_ab_check()


if __name__ == "__main__":
    main()
