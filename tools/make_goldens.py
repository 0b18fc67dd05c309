#!/usr/bin/env python
"""Generate torch-reference golden files for voxel-feature parity tests.

Runs the PyTorch reference ELKUNet (segmentation/core/models/
semantic_kitti/linkunet.py) on its CPU backend over tiny synthetic scans
and saves (input cloud, state_dict, per-voxel output logits) to
tests/goldens/. tests/test_golden_parity.py then translates the weights
via utils/torch_import.py and asserts our JAX model reproduces the
features — the voxel-feature fidelity check BASELINE demands, runnable
without the datasets.

Requires the reference checkout and a built torchsparse-u CPU backend:

  cp -r /root/reference/segmentation/torchsparse-u /tmp/tsu
  (cd /tmp/tsu && CPATH=<shim with google/dense_hash_map> \
      python setup.py build_ext --inplace)

The google/dense_hash_map shim is a 15-line std::unordered_map alias —
see tests/goldens/README.md.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsu", default="/tmp/tsu",
                    help="built torchsparse-u checkout")
    ap.add_argument("--reference", default="/root/reference/segmentation")
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "goldens"))
    ap.add_argument("--n-scans", type=int, default=2)
    ap.add_argument("--n-points", type=int, default=600)
    ap.add_argument("--cr", type=float, default=0.25)
    args = ap.parse_args()

    sys.path.insert(0, args.tsu)
    sys.path.insert(0, args.reference)
    import torch
    torch.manual_seed(0)
    from torchsparse import SparseTensor as TorchSparseTensor
    from core.models.semantic_kitti.linkunet import ELKUNet as TorchELKUNet

    model = TorchELKUNet(num_classes=20, cr=args.cr, groups=1,
                         baseop="cos_x", r=2, s=3)
    model.eval()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(args.n_scans):
        n = args.n_points
        # small dense-ish cluster so every stride level has joins
        coords = np.unique(
            rng.integers(0, 24, (n, 3)).astype(np.int32), axis=0)
        coords = np.concatenate(
            [coords, np.zeros((len(coords), 1), np.int32)], axis=1)
        feats = rng.standard_normal((len(coords), 4)).astype(np.float32)

        st = TorchSparseTensor(torch.from_numpy(feats),
                               torch.from_numpy(coords))
        with torch.no_grad():
            out = model(st)
        np.savez_compressed(
            os.path.join(args.out, f"elkunet_cr{args.cr}_{i}.npz"),
            coords=coords, feats=feats,
            logits=out.detach().numpy(),
            cr=args.cr)
        print(f"scan {i}: {len(coords)} voxels, logits {tuple(out.shape)}")

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        os.path.join(args.out, f"elkunet_cr{args.cr}_state.npz"), **sd)
    print(f"state dict: {len(sd)} tensors -> {args.out}")

    # ELKEncoder at the published encoder-only config "cos:(3x5)^3"
    # (README.md Model Zoo row 4; linkencoder.py:188-330, groups=2).
    # r=3 hits the reference CPU bug devoxelize_cpu.cpp hardcoding 8
    # neighbors (the "-u" fork r-generalized only the CUDA kernel), which
    # yields NaN — substitute the same pure-torch transcription of the
    # CUDA kernel's semantics that make_goldens_det.py uses.
    import core.models.utils as ref_utils

    def spdevoxelize(feat, indices, weight, r=2):
        safe = indices.clamp(min=0).long()
        gathered = feat[safe]                       # (N, K, C)
        w = torch.where(indices >= 0, weight,
                        torch.zeros_like(weight)).unsqueeze(-1)
        return (gathered * w).sum(dim=1)

    ref_utils.F.spdevoxelize = spdevoxelize

    from core.models.semantic_kitti.linkencoder import (
        ELKEncoder as TorchELKEncoder)
    torch.manual_seed(3)
    enc = TorchELKEncoder(num_classes=20, cr=args.cr, groups=2,
                          baseop="cos", r=3, s=5)
    enc.eval()
    coords = np.unique(rng.integers(0, 24, (args.n_points, 3))
                       .astype(np.int32), axis=0)
    coords = np.concatenate(
        [coords, np.zeros((len(coords), 1), np.int32)], axis=1)
    feats = rng.standard_normal((len(coords), 4)).astype(np.float32)
    st = TorchSparseTensor(torch.from_numpy(feats), torch.from_numpy(coords))
    with torch.no_grad():
        out = enc(st)
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    np.savez_compressed(
        os.path.join(args.out, f"elkencoder_cr{args.cr}.npz"),
        coords=coords, feats=feats, logits=out.detach().numpy(),
        cr=args.cr, **{"sd_" + k.replace(".", "__"): v
                       for k, v in sd.items()})
    print(f"encoder golden: {len(coords)} voxels, "
          f"logits {tuple(out.shape)}")

    # baseline families: MinkUNet (minkunet.py:91-254; NOTE the reference's
    # actual channel plan is cs=[64]*9, minkunet.py:98) and SPVCNN
    # (spvcnn.py:82-235 — pins initial_voxelize / voxel_to_point /
    # point_to_voxel numerics; pres=vres=1 over already-quantized coords,
    # matching the dataset path's semantics)
    from core.models.semantic_kitti.minkunet import MinkUNet as TorchMinkUNet
    from core.models.semantic_kitti.spvcnn import SPVCNN as TorchSPVCNN

    for tag, ctor, kw in (
            ("minkunet", TorchMinkUNet, {}),
            ("spvcnn", TorchSPVCNN, dict(pres=1.0, vres=1.0))):
        torch.manual_seed(5)
        m = ctor(num_classes=20, cr=args.cr, **kw)
        m.eval()
        coords = np.unique(rng.integers(0, 24, (args.n_points, 3))
                           .astype(np.int32), axis=0)
        coords = np.concatenate(
            [coords, np.zeros((len(coords), 1), np.int32)], axis=1)
        feats = rng.standard_normal((len(coords), 4)).astype(np.float32)
        st = TorchSparseTensor(torch.from_numpy(feats),
                               torch.from_numpy(coords))
        with torch.no_grad():
            out = m(st)
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        np.savez_compressed(
            os.path.join(args.out, f"{tag}_cr{args.cr}.npz"),
            coords=coords, feats=feats, logits=out.detach().numpy(),
            cr=args.cr, **{"sd_" + k.replace(".", "__"): v
                           for k, v in sd.items()})
        print(f"{tag} golden: {len(coords)} voxels, "
              f"logits {tuple(out.shape)}")


if __name__ == "__main__":
    main()
