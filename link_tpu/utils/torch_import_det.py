"""Detection checkpoint translation: CenterPoint-LinK torch .pth -> flax.

Layout conversions:
  * spconv 2.x Sub/SparseConv3d weights are (Co, kz, ky, kx, Ci); our
    torchsparse-mode SubM taps enumerate z-major (x fastest) offsets and
    the spconv-engine strided taps enumerate x-major (z fastest) raw tap
    indices — both are index permutations of the (kz, ky, kx) block
    followed by a (Ci, Co) transpose.
  * torch Conv2d (Co, Ci, kh, kw) -> flax (kh, kw, Ci, Co);
    ConvTranspose2d (Ci, Co, kh, kw) -> flax ConvTranspose (kh, kw, Ci, Co)
    with a spatial flip (torch deconv cross-correlates the flipped kernel
    relative to lax.conv_transpose).

Validation: structural (tests/test_torch_import_det.py); numerical —
the dense half (RPN + CenterHead: conv/deconv transposes incl. the
ConvTranspose spatial flip, BN eps/momentum, sequential/branch indices)
against the reference torch modules run on CPU
(tests/test_golden_det_dense.py over tests/goldens/det_dense.npz), and
the TSELK block against the torchsparse-u CPU backend
(tests/test_golden_parity.py). A real released checkpoint end-to-end
still needs the dataset container (PLAN.md).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def spconv_subm_to_ts(w: np.ndarray) -> np.ndarray:
    """(Co, kz, ky, kx, Ci) -> (K, Ci, Co) in torchsparse odd-kernel order
    (z-major, x fastest: k = z*ky*kx + y*kx + x with offsets -1..1)."""
    co, kz, ky, kx, ci = w.shape
    out = np.empty((kz * ky * kx, ci, co), w.dtype)
    k = 0
    for z in range(kz):
        for y in range(ky):
            for x in range(kx):
                out[k] = w[:, z, y, x, :].T
                k += 1
    return out


def spconv_strided_to_engine(w: np.ndarray) -> np.ndarray:
    """(Co, kz, ky, kx, Ci) -> (K, Ci, Co) in spconv_engine tap order
    (x-major, z fastest: k = x*ky*kz + y*kz + z)."""
    co, kz, ky, kx, ci = w.shape
    out = np.empty((kz * ky * kx, ci, co), w.dtype)
    k = 0
    for x in range(kx):
        for y in range(ky):
            for z in range(kz):
                out[k] = w[:, z, y, x, :].T
                k += 1
    return out


def conv2d_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def deconv2d_to_flax(w: np.ndarray) -> np.ndarray:
    # torch (Ci, Co, kh, kw); flip spatial dims for lax.conv_transpose
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


def translate_voxelnet(sd: Dict[str, np.ndarray],
                       tasks=(1, 2, 2, 1, 2, 2)) -> Dict[str, Any]:
    """Map the reference VoxelNet(SpMiddleResNetFHDELKv3 + RPN + CenterHead)
    state_dict onto our flax VoxelNet variable trees."""
    params: Dict[str, Any] = {"backbone": {}, "neck": {}, "bbox_head": {}}
    stats: Dict[str, Any] = {"backbone": {}, "neck": {}, "bbox_head": {}}

    def put(tree, path, name, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[name] = value

    def bn1d(tree_p, tree_s, path, prefix):
        put(tree_p, path, "scale", sd[prefix + ".weight"])
        put(tree_p, path, "bias", sd[prefix + ".bias"])
        put(tree_s, path, "mean", sd[prefix + ".running_mean"])
        put(tree_s, path, "var", sd[prefix + ".running_var"])

    B = "backbone"

    # conv_input: SubM(5->16) + BN
    put(params, (B, "conv_input"), "kernel",
        spconv_subm_to_ts(sd["backbone.conv_input.0.weight"]))
    bn1d(params[B], stats[B], ("conv_input_bn",), "backbone.conv_input.1")

    for lvl in range(1, 5):
        if lvl > 1:
            put(params, (B, f"down{lvl}"), "kernel",
                spconv_strided_to_engine(sd[f"backbone.down{lvl}.0.weight"]))
            bn1d(params[B], stats[B], (f"down{lvl}", "SparseBatchNorm_0"),
                 f"backbone.down{lvl}.1")
        for bi in range(2):
            base = f"backbone.conv{lvl}.{bi}"
            path = (f"conv{lvl}_{bi}",)
            put(params, (B,) + path, "SparseConv3d_0", {
                "kernel": spconv_subm_to_ts(sd[base + ".conv1.weight"]),
                "bias": sd[base + ".conv1.bias"]})
            put(params, (B,) + path, "SparseConv3d_1", {
                "kernel": spconv_subm_to_ts(sd[base + ".conv2.weight"]),
                "bias": sd[base + ".conv2.bias"]})
            for bn_i, t in (("SparseBatchNorm_0", ".bn1"),
                            ("SparseBatchNorm_1", ".bn2")):
                put(params, (B,) + path, bn_i,
                    {"scale": sd[base + t + ".weight"],
                     "bias": sd[base + t + ".bias"]})
                put(stats, (B,) + path, bn_i,
                    {"mean": sd[base + t + ".running_mean"],
                     "var": sd[base + t + ".running_var"]})
        # tails + ELK
        put(params, (B, f"conv{lvl}_tail"), "kernel",
            spconv_subm_to_ts(sd[f"backbone.conv{lvl}_tail.0.weight"]))
        bn1d(params[B], stats[B], (f"conv{lvl}_tail_bn",),
             f"backbone.conv{lvl}_tail.1")
        e = f"backbone.elk{lvl}"
        put(params, (B, f"elk{lvl}", "pre_mix"), "kernel",
            sd[e + ".pre_mix.0.weight"].T)
        put(params, (B, f"elk{lvl}", "pre_mix_norm"), "scale",
            sd[e + ".pre_mix.1.weight"])
        put(params, (B, f"elk{lvl}", "pre_mix_norm"), "bias",
            sd[e + ".pre_mix.1.bias"])
        put(params, (B, f"elk{lvl}", "local_mix"), "kernel",
            sd[e + ".local_mix.0.kernel"])
        put(params, (B, f"elk{lvl}", "pos_weight"), "kernel",
            sd[e + ".pos_weight.0.weight"].T)
        for nm in ("norm", "norm_local"):
            put(params, (B, f"elk{lvl}", nm), "scale", sd[f"{e}.{nm}.weight"])
            put(params, (B, f"elk{lvl}", nm), "bias", sd[f"{e}.{nm}.bias"])
        put(params, (B, f"elk{lvl}_tail"), "kernel",
            spconv_subm_to_ts(sd[f"backbone.elk{lvl}_tail.0.weight"]))
        bn1d(params[B], stats[B], (f"elk{lvl}_tail_bn",),
             f"backbone.elk{lvl}_tail.1")

    put(params, (B,), "extra_conv_kernel",
        spconv_strided_to_engine(sd["backbone.extra_conv.0.weight"]))
    bn1d(params[B], stats[B], ("extra_conv_bn",), "backbone.extra_conv.1")

    _translate_dense_into(sd, params, stats, tasks)
    return {"params": params, "batch_stats": stats}


def translate_dense(sd: Dict[str, np.ndarray],
                    tasks=(1, 2, 2, 1, 2, 2)) -> Dict[str, Any]:
    """Neck + head only (keys prefixed `neck.` / `bbox_head.`) — for
    partial checkpoints and the dense golden-parity test
    (tests/goldens/det_dense.npz, generated by tools/make_goldens_det.py
    --dense-only from the reference torch RPN/CenterHead)."""
    params: Dict[str, Any] = {"neck": {}, "bbox_head": {}}
    stats: Dict[str, Any] = {"neck": {}, "bbox_head": {}}
    _translate_dense_into(sd, params, stats, tasks)
    return {"params": params, "batch_stats": stats}


def _translate_dense_into(sd, params, stats, tasks):
    def put(tree, path, name, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[name] = value

    # RPN: blocks 0/1 each: convs at seq idx 1, 4, 7, ... + BN after
    NK = "neck"
    for blk in range(2):
        # torch Sequential: [ZeroPad, Conv, BN, ReLU] + n x [Conv, BN, ReLU]
        # (rpn.py:69-87); n = layer_nums[blk], inferred from the keys so
        # reduced test configs (e.g. the det A/B golden's layer_nums=[2,2])
        # translate too
        conv_ids = [1]
        while f"neck.blocks.{blk}.{conv_ids[-1] + 3}.weight" in sd:
            conv_ids.append(conv_ids[-1] + 3)
        for ci_, tid in enumerate(conv_ids):
            base = f"neck.blocks.{blk}.{tid}"
            bnb = f"neck.blocks.{blk}.{tid + 1}"
            path = (f"block{blk}_conv{ci_}",)
            put(params, (NK,) + path, "Conv_0",
                {"kernel": conv2d_to_flax(sd[base + ".weight"])})
            put(params, (NK,) + path, "BatchNorm_0",
                {"scale": sd[bnb + ".weight"], "bias": sd[bnb + ".bias"]})
            put(stats, (NK,) + path, "BatchNorm_0",
                {"mean": sd[bnb + ".running_mean"],
                 "var": sd[bnb + ".running_var"]})
        base = f"neck.deblocks.{blk}.0"
        bnb = f"neck.deblocks.{blk}.1"
        path = (f"deblock{blk}",)
        w = sd[base + ".weight"]
        kern = (deconv2d_to_flax(w) if blk == 1 else conv2d_to_flax(w))
        key = "ConvTranspose_0" if blk == 1 else "Conv_0"
        put(params, (NK,) + path, key, {"kernel": kern})
        put(params, (NK,) + path, "BatchNorm_0",
            {"scale": sd[bnb + ".weight"], "bias": sd[bnb + ".bias"]})
        put(stats, (NK,) + path, "BatchNorm_0",
            {"mean": sd[bnb + ".running_mean"],
             "var": sd[bnb + ".running_var"]})

    # CenterHead
    H = "bbox_head"
    put(params, (H, "shared_conv"), "kernel",
        conv2d_to_flax(sd["bbox_head.shared_conv.0.weight"]))
    put(params, (H, "shared_conv"), "bias", sd["bbox_head.shared_conv.0.bias"])
    put(params, (H, "shared_bn"), "scale", sd["bbox_head.shared_conv.1.weight"])
    put(params, (H, "shared_bn"), "bias", sd["bbox_head.shared_conv.1.bias"])
    put(stats, (H, "shared_bn"), "mean",
        sd["bbox_head.shared_conv.1.running_mean"])
    put(stats, (H, "shared_bn"), "var",
        sd["bbox_head.shared_conv.1.running_var"])

    heads = ["reg", "height", "dim", "rot", "vel", "hm"]
    for t in range(len(tasks)):
        for head in heads:
            base = f"bbox_head.tasks.{t}.{head}"
            path = (f"task{t}_{head}",)
            # branch: Conv(0) BN(1) ReLU(2) Conv(3)
            put(params, (H,) + path, "conv0",
                {"kernel": conv2d_to_flax(sd[base + ".0.weight"]),
                 "bias": sd[base + ".0.bias"]})
            put(params, (H,) + path, "bn0",
                {"scale": sd[base + ".1.weight"], "bias": sd[base + ".1.bias"]})
            put(stats, (H,) + path, "bn0",
                {"mean": sd[base + ".1.running_mean"],
                 "var": sd[base + ".1.running_var"]})
            put(params, (H,) + path, "final",
                {"kernel": conv2d_to_flax(sd[base + ".3.weight"]),
                 "bias": sd[base + ".3.bias"]})
