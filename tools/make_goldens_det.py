#!/usr/bin/env python
"""Detection-side golden files: the reference TSELKBlock
(detection/det3d/models/utils/ts_elk.py:110-230, baseop='cos' with the
det channel grouping) run on the torchsparse-u CPU backend.

spconv itself isn't needed: TSELKBlock.forward_ takes a plain torchsparse
SparseTensor (the spconv<->ts conversion wrappers are bypassed), so a
module stub satisfies the import. See tests/goldens/README.md for the
backend build steps; run after tools/make_goldens.py's prerequisites."""

import argparse
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsu", default="/tmp/tsu")
    ap.add_argument("--reference", default="/root/reference/detection")
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "goldens"))
    ap.add_argument("--inc", type=int, default=16)
    ap.add_argument("--block-sz", type=int, default=7)
    args = ap.parse_args()

    sys.path.insert(0, args.tsu)
    sys.path.insert(0, args.reference)
    # import-time stubs for deps absent in this container (none of them
    # execute: forward_ avoids spconv, and torchie's checkpoint utilities
    # are never called)
    import importlib.machinery
    for name in ("torchvision", "torchvision.models", "terminaltables",
                 "spconv", "spconv.pytorch"):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        m.__path__ = []
        sys.modules.setdefault(name, m)
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["terminaltables"].AsciiTable = object
    sys.modules["spconv"].pytorch = sys.modules["spconv.pytorch"]
    spc = sys.modules["spconv.pytorch"]
    spc.SparseConvTensor = type("SparseConvTensor", (), {})
    import torch.nn as _tnn
    for sym in ("ops", "SparseModule", "SparseSequential", "SubMConv3d",
                "SparseConv3d", "SparseInverseConv3d", "SparseMaxPool3d"):
        setattr(spc, sym, types.ModuleType("spconv.pytorch.ops")
                if sym == "ops" else _tnn.Identity)

    import torch
    torch.manual_seed(1)
    from torchsparse import SparseTensor
    # load ts_elk.py standalone — the det3d package __init__ chain pulls
    # in unrelated deps (addict, numba, ...) this container lacks
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ts_elk", os.path.join(args.reference,
                               "det3d/models/utils/ts_elk.py"))
    ts_elk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ts_elk)
    TSELKBlock = ts_elk.TSELKBlock

    # Reference CPU bug workaround: devoxelize_cpu.cpp hardcodes 8
    # neighbors — the "-u" fork r-generalized only the CUDA kernel
    # (devoxelize_cuda.cu:11-34), so kernel_size=3 (27 taps) reads the
    # wrong strides on CPU and yields NaN. Substitute a literal pure-torch
    # transcription of the CUDA kernel's semantics
    # (out[i] = sum_k w[i,k] * feat[idx[i,k]], idx < 0 contributes 0).
    def spdevoxelize(feat, indices, weight, r=2):
        safe = indices.clamp(min=0).long()
        gathered = feat[safe]                       # (N, K, C)
        w = torch.where(indices >= 0, weight,
                        torch.zeros_like(weight)).unsqueeze(-1)
        return (gathered * w).sum(dim=1)

    ts_elk.F.spdevoxelize = spdevoxelize

    blk = TSELKBlock(args.inc, args.inc, baseop="cos")
    blk.eval()

    rng = np.random.default_rng(2)
    coords = np.unique(rng.integers(0, 40, (700, 3)).astype(np.int32),
                       axis=0)
    coords = np.concatenate(
        [coords, np.zeros((len(coords), 1), np.int32)], axis=1)
    feats = rng.standard_normal((len(coords), args.inc)).astype(np.float32)
    st = SparseTensor(torch.from_numpy(feats), torch.from_numpy(coords))
    with torch.no_grad():
        out = blk.forward_(st, args.block_sz)

    sd = {k: v.detach().numpy() for k, v in blk.state_dict().items()}
    np.savez_compressed(
        os.path.join(args.out, "tselk_cos.npz"),
        coords=coords, feats=feats, out=out.F.detach().numpy(),
        block_sz=args.block_sz, inc=args.inc, **{
            "sd_" + k.replace(".", "__"): v for k, v in sd.items()})
    print(f"TSELK golden: {len(coords)} voxels, out {tuple(out.F.shape)}")


if __name__ == "__main__":
    main()
