#!/usr/bin/env python
"""Capacity calibration: scan a dataset and report per-stride-level voxel
counts so capacity schedules can be chosen with known overflow risk.

The fixed-capacity design silently drops voxels past a level's capacity
(sparse/coords.py:unique_coords clamps); the reference instead had dynamic
shapes. This tool makes the trade-off explicit: pick capacities at the
e.g. 99.9th percentile and record the expected drop rate.

Usage:
  python tools/calibrate_capacities.py --synthetic --scans 32 --batch 2
  python tools/calibrate_capacities.py --root data/SemanticKITTI/... --split train
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def level_counts(coords: np.ndarray, levels: int = 5):
    """Unique voxel counts at strides 1, 2, 4, 8, 16 (shared impl in
    data/collate.level_unique_counts; seg_evaluate audits with it too)."""
    from link_tpu.data.collate import level_unique_counts
    return level_unique_counts(coords, levels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None)
    ap.add_argument("--split", default="train")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--scans", type=int, default=32)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--voxel-size", type=float, default=0.05)
    ap.add_argument("--num-points", type=int, default=80000)
    args = ap.parse_args()

    from link_tpu.data.semantic_kitti import (SemanticKITTI,
                                              SyntheticSemanticKITTI)

    if args.synthetic or not (args.root and os.path.isdir(args.root)):
        ds = SyntheticSemanticKITTI(length=args.scans,
                                    voxel_size=args.voxel_size,
                                    num_points=args.num_points,
                                    split=args.split)
    else:
        ds = SemanticKITTI(args.root, args.split, args.voxel_size,
                           args.num_points)

    n = min(len(ds), args.scans)
    per_batch = []
    batch_coords = []
    for i in range(n):
        scan = ds[i]
        c = np.concatenate([scan["coords"],
                            np.full((len(scan["coords"]), 1),
                                    len(batch_coords), np.int32)], 1)
        batch_coords.append(c)
        if len(batch_coords) == args.batch:
            per_batch.append(level_counts(np.concatenate(batch_coords)))
            batch_coords = []

    arr = np.asarray(per_batch)
    print(f"{len(arr)} batches of {args.batch} scans, voxel "
          f"{args.voxel_size} m")
    print(f"{'level':>6} {'stride':>6} {'mean':>9} {'p50':>9} {'max':>9} "
          f"{'suggested cap':>14}")
    for lvl in range(arr.shape[1]):
        col = arr[:, lvl]
        cap = int(np.ceil(col.max() * 1.06 / 256) * 256)
        print(f"{lvl:>6} {1 << lvl:>6} {col.mean():>9.0f} "
              f"{np.median(col):>9.0f} {col.max():>9} {cap:>14}")
    caps = [int(np.ceil(arr[:, l].max() * 1.06 / 256) * 256)
            for l in range(arr.shape[1])]
    print(f"capacities: {caps}")


if __name__ == "__main__":
    main()
