#!/usr/bin/env python
"""Scan-scale golden: the torch reference ELKUNet cr1.0 on a production
80k-voxel SemanticKITTI-shaped scan (the exact bench.py input
distribution).

The tiny cr0.25 goldens (make_goldens.py, ~600 voxels) verify the math
but never engage the production capacities, the DirectIndex fence
hierarchy at real spans, padding lanes, or capacity-pressure behavior.
This golden does: tests/test_golden_parity.py::
test_elkunet_fullscale_matches_reference runs it at DEFAULT_CAPACITIES
(84992-row stem), where every join/window/fence path executes at its
real shape.

Reference model: segmentation/core/models/semantic_kitti/linkunet.py
(cos_x, r=2, s=3, groups=1 — the published SemanticKITTI config,
configs/semantic_kitti/link/cos.yaml). CPU runtime ~1-2 min/scan.

Requires the out-of-tree torchsparse-u CPU build (tests/goldens/README.md).
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsu", default="/tmp/tsu")
    ap.add_argument("--reference", default="/root/reference/segmentation")
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "goldens"))
    ap.add_argument("--points", type=int, default=80000)
    args = ap.parse_args()

    sys.path.insert(0, args.tsu)
    sys.path.insert(0, args.reference)
    import torch
    from torchsparse import SparseTensor as TorchSparseTensor
    from core.models.semantic_kitti.linkunet import ELKUNet as TorchELKUNet

    # the bench.py scan: SyntheticSemanticKITTI train split, 80k-voxel
    # cap, 120k raw points, seed 0 => scan 0 is bit-identical to the
    # first bench input
    from link_tpu.data.semantic_kitti import SyntheticSemanticKITTI
    ds = SyntheticSemanticKITTI(length=1, num_points=args.points,
                                n_raw_points=120000, split="train")
    s = ds[0]
    coords = np.concatenate(
        [np.asarray(s["coords"], np.int32),
         np.zeros((len(s["coords"]), 1), np.int32)], axis=1)
    feats = np.asarray(s["feats"], np.float32)
    print(f"scan: {len(coords)} voxels, extents "
          f"{coords[:, :3].max(0) + 1}")

    torch.manual_seed(0)
    model = TorchELKUNet(num_classes=20, cr=1.0, groups=1, baseop="cos_x",
                         r=2, s=3)
    model.eval()
    st = TorchSparseTensor(torch.from_numpy(feats), torch.from_numpy(coords))
    import time
    t0 = time.perf_counter()
    with torch.no_grad():
        out = model(st)
    print(f"reference forward: {time.perf_counter() - t0:.1f}s")

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        os.path.join(args.out, "elkunet_cr1.0_fullscale.npz"),
        coords=coords, feats=feats, logits=out.detach().numpy(), cr=1.0,
        **{f"state/{k}": v for k, v in sd.items()})
    size = os.path.getsize(
        os.path.join(args.out, "elkunet_cr1.0_fullscale.npz"))
    print(f"golden: logits {tuple(out.shape)}, state {len(sd)} tensors, "
          f"{size / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
