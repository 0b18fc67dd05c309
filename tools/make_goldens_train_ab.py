#!/usr/bin/env python
"""Convergence A/B golden: train the ACTUAL torch reference ELKUNet
(segmentation/core/models/semantic_kitti/linkunet.py) for N SGD steps on
fixed synthetic scans with the trainer's exact loss shaping
(segmentation/core/trainers.py:41-81: CE(ignore 0) + lovasz_softmax on
softmax with the transpose/unsqueeze shaping) and the published
optimizer semantics (builder.py:make_optimizer: SGD nesterov momentum
0.9, coupled wd 1e-4), recording the per-step loss curve.

tests/test_convergence_ab.py replays the identical schedule — same
initial weights (translated), same scans, same step order — through our
seg_train_step and pins per-step agreement, upgrading "loss decreases"
(tests/test_training_dynamics.py) to "the optimizer+loss+BN+model system
reproduces reference training dynamics" (VERDICT r3 next #7).

Build prerequisite: the torchsparse-u CPU backend (see
tests/goldens/README.md).
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
    ap.add_argument("--n-scans", type=int, default=2)
    ap.add_argument("--n-points", type=int, default=600)
    ap.add_argument("--cr", type=float, default=0.25)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.05)
    args = ap.parse_args()

    sys.path.insert(0, args.tsu)
    sys.path.insert(0, args.reference)
    import torch
    torch.manual_seed(0)
    from torchsparse import SparseTensor as TorchSparseTensor
    from core.models.semantic_kitti.linkunet import ELKUNet as TorchELKUNet
    from core.lovasz_losses import lovasz_softmax
    import core.models.utils as ref_utils

    # pure-torch spdevoxelize (same semantics as the CUDA kernel,
    # autograd-capable) — the C++ CPU twin hardcodes 8 neighbors and has
    # a non-autograd backward; see tools/make_goldens.py
    def spdevoxelize(feat, indices, weight, r=2):
        safe = indices.clamp(min=0).long()
        gathered = feat[safe]
        w = torch.where(indices >= 0, weight,
                        torch.zeros_like(weight)).unsqueeze(-1)
        return (gathered * w).sum(dim=1)

    ref_utils.F.spdevoxelize = spdevoxelize

    # the reference CPU conv backward raises NotImplementedError
    # (torchsparse/nn/functional/conv.py:79) — transcribe the CUDA
    # backward's semantics (convolution_cuda.cu:167-278: per-tap
    # scatter-add dX, per-tap dW GEMM) in pure torch
    import torchsparse.nn.functional.conv as ref_conv

    def _cpu_backward(ctx, grad_output):
        inp, weight, nbmaps, nbsizes, transposed = ctx.for_backwards
        grad_input = torch.zeros_like(inp)
        grad_weight = torch.zeros_like(weight)
        g_out = grad_output.contiguous()
        cur_st = 0
        for k in range(weight.shape[0]):
            cur_ed = cur_st + nbsizes[k]
            in_map = nbmaps[cur_st:cur_ed, 0].long()
            out_map = nbmaps[cur_st:cur_ed, 1].long()
            cur_st = cur_ed
            if transposed:
                in_map, out_map = out_map, in_map
            g = g_out[out_map]
            grad_input.index_add_(0, in_map, g @ weight[k].t())
            grad_weight[k] = inp[in_map].t() @ g
        return grad_input, grad_weight, None, None, None, None

    ref_conv.ConvolutionFunction.backward = staticmethod(_cpu_backward)

    model = TorchELKUNet(num_classes=20, cr=args.cr, groups=1,
                         baseop="cos_x", r=2, s=3)
    sd0 = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}

    rng = np.random.default_rng(17)
    scans = []
    for i in range(args.n_scans):
        coords = np.unique(
            rng.integers(0, 24, (args.n_points, 3)).astype(np.int32), axis=0)
        coords = np.concatenate(
            [coords, np.zeros((len(coords), 1), np.int32)], axis=1)
        feats = rng.standard_normal((len(coords), 4)).astype(np.float32)
        # labels 0..19 with 0 = ignore present (CE ignore_index=0,
        # Lovász ignore=0 — the padding/ignore interaction must match)
        labels = rng.integers(0, 20, len(coords)).astype(np.int64)
        scans.append((coords, feats, labels))

    opt = torch.optim.SGD(model.parameters(), lr=args.lr, momentum=0.9,
                          weight_decay=1e-4, nesterov=True)
    ce = torch.nn.CrossEntropyLoss(ignore_index=0)
    model.train()
    losses, ces, lovs = [], [], []
    for step in range(args.steps):
        coords, feats, labels = scans[step % args.n_scans]
        st = TorchSparseTensor(torch.from_numpy(feats.copy()),
                               torch.from_numpy(coords))
        targets = torch.from_numpy(labels)
        out = model(st)
        loss_ce = ce(out, targets)
        out_r = out.transpose(0, 1).unsqueeze(dim=0).unsqueeze(dim=-1)
        tgt_r = targets.unsqueeze(dim=0).unsqueeze(dim=-1)
        loss_lov = lovasz_softmax(torch.nn.functional.softmax(out_r, dim=1),
                                  tgt_r, ignore=0)
        loss = loss_ce + loss_lov
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
        ces.append(float(loss_ce))
        lovs.append(float(loss_lov))
        print(f"step {step}: loss {float(loss):.6f} "
              f"(ce {float(loss_ce):.6f} lov {float(loss_lov):.6f})")

    np.savez_compressed(
        os.path.join(args.out, "train_ab.npz"),
        losses=np.asarray(losses), ces=np.asarray(ces),
        lovs=np.asarray(lovs), lr=args.lr, cr=args.cr,
        n_scans=args.n_scans,
        **{f"scan{i}_{k}": v for i, (c, f, l) in enumerate(scans)
           for k, v in (("coords", c), ("feats", f), ("labels", l))},
        **{"sd_" + k.replace(".", "__"): v for k, v in sd0.items()})
    print(f"-> {os.path.join(args.out, 'train_ab.npz')}")


if __name__ == "__main__":
    main()
