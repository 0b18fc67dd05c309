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
    ap.add_argument("--dense-only", action="store_true",
                    help="skip the TSELK golden (needs the torchsparse-u "
                         "CPU build at --tsu); the dense RPN+CenterHead "
                         "golden is pure torch")
    ap.add_argument("--fullscale", action="store_true",
                    help="ALSO generate tselk_cos_fullscale.npz: the "
                         "reference TSELKBlock on a production-scale "
                         "~160k-voxel nuScenes-shaped frame (the bench.py "
                         "det input distribution, r=3 block_sz=7) — the "
                         "det half of the scan-scale parity pins")
    args = ap.parse_args()
    if args.dense_only:
        make_dense_golden(args)
        return

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

    if args.fullscale:
        # Production-scale frame: the exact bench.py det voxel
        # distribution (SyntheticNuScenes val, 160k-voxel cap on the
        # 1440x1440x41 grid), fed to the SAME reference block. This is
        # where the det joins run at real spans and the aux grid at its
        # real ~7x210x210 extent.
        sys.path.insert(0, REPO)
        from link_tpu.data.nuscenes import SyntheticNuScenes
        ds = SyntheticNuScenes(length=1, mode="val", seed=0,
                               max_voxels=160000)
        zyx = ds[0]["coords_zyx"]
        coords = np.concatenate(
            [zyx[:, ::-1], np.zeros((len(zyx), 1), np.int32)],
            axis=1).astype(np.int32)
        feats = np.random.default_rng(3).standard_normal(
            (len(coords), args.inc)).astype(np.float32)
        st = SparseTensor(torch.from_numpy(feats),
                          torch.from_numpy(coords))
        import time
        t0 = time.perf_counter()
        with torch.no_grad():
            out = blk.forward_(st, args.block_sz)
        print(f"fullscale reference forward: "
              f"{time.perf_counter() - t0:.1f}s")
        np.savez_compressed(
            os.path.join(args.out, "tselk_cos_fullscale.npz"),
            coords=coords, feats=feats, out=out.F.detach().numpy(),
            block_sz=args.block_sz, inc=args.inc, **{
                "sd_" + k.replace(".", "__"): v for k, v in sd.items()})
        print(f"fullscale TSELK golden: {len(coords)} voxels")

    make_dense_golden(args)


def _load_as(dotted: str, path: str):
    """Load a reference source file under a dotted module name so its
    relative imports resolve against the stub package tree."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(dotted, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    parent, _, leaf = dotted.rpartition(".")
    if parent in sys.modules:
        setattr(sys.modules[parent], leaf, mod)
    return mod


def make_dense_golden(args):
    """Golden for the DENSE det modules: the reference torch RPN + CenterHead
    (pure torch, CPU-runnable — unlike the spconv backbone) run on a random
    BEV map at the published LinK config (rpn.py:22-160,
    center_head.py:170-294; configs/nusc/voxelnet/..._elkv3.py neck/head
    dicts). Numerically validates utils/torch_import_det.translate_dense:
    conv/deconv layout transposes, BN eps/momentum mapping, sequential and
    branch indices."""
    import importlib.machinery
    import torch

    ref = args.reference

    # numba is absent in this container; only its @jit/@njit decorators are
    # touched at import time in the modules CenterHead pulls in
    def _jit(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f
    nb = types.ModuleType("numba")
    nb.__spec__ = importlib.machinery.ModuleSpec("numba", None)
    nb.jit = nb.njit = _jit
    sys.modules.setdefault("numba", nb)

    # torchvision stub (rpn.py does `from torchvision.models import resnet`
    # without using it); no-op under a full main() run that already made it
    for name in ("torchvision", "torchvision.models"):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        m.__path__ = []
        sys.modules.setdefault(name, m)
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    if not hasattr(sys.modules["torchvision.models"], "resnet"):
        sys.modules["torchvision.models"].resnet = types.ModuleType(
            "torchvision.models.resnet")

    def pkg(name):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
        m.__path__ = []
        sys.modules[name] = m
        parent, _, leaf = name.rpartition(".")
        if parent:
            setattr(pkg(parent), leaf, m)
        return m

    for name in ("det3d", "det3d.utils", "det3d.utils.dist", "det3d.torchie",
                 "det3d.core", "det3d.core.utils", "det3d.core.bbox",
                 "det3d.models", "det3d.models.necks",
                 "det3d.models.bbox_heads", "det3d.models.losses"):
        pkg(name)
    sys.modules["det3d.utils.dist"].dist_common = types.ModuleType(
        "det3d.utils.dist.dist_common")
    sys.modules["det3d.utils.dist.dist_common"] = \
        sys.modules["det3d.utils.dist"].dist_common
    tr = types.ModuleType("det3d.torchie.trainer")
    tr.load_checkpoint = lambda *a, **k: None
    sys.modules["det3d.torchie.trainer"] = tr
    sys.modules["det3d.torchie"].trainer = tr

    _load_as("det3d.torchie.cnn",
             os.path.join(ref, "det3d/torchie/cnn/weight_init.py"))
    _load_as("det3d.core.utils.circle_nms_jit",
             os.path.join(ref, "det3d/core/utils/circle_nms_jit.py"))
    _load_as("det3d.core.utils.center_utils",
             os.path.join(ref, "det3d/core/utils/center_utils.py"))
    _load_as("det3d.core.bbox.geometry",
             os.path.join(ref, "det3d/core/bbox/geometry.py"))
    _load_as("det3d.core.bbox.box_np_ops",
             os.path.join(ref, "det3d/core/bbox/box_np_ops.py"))
    bto = _load_as("det3d.core.bbox.box_torch_ops",
                   os.path.join(ref, "det3d/core/bbox/box_torch_ops.py"))
    sys.modules["det3d.core"].box_torch_ops = bto

    # det3d.models.utils: compose misc.py + norm.py in one namespace (the
    # real package __init__ also pulls conv_module/scale, unused by RPN)
    mu = pkg("det3d.models.utils")
    for fn in ("det3d/models/utils/misc.py", "det3d/models/utils/norm.py"):
        src = open(os.path.join(ref, fn)).read()
        exec(compile(src, os.path.join(ref, fn), "exec"), mu.__dict__)

    class _Reg:
        @staticmethod
        def register_module(cls):
            return cls
    reg = types.ModuleType("det3d.models.registry")
    reg.NECKS = reg.HEADS = reg.BACKBONES = reg.READERS = _Reg
    sys.modules["det3d.models.registry"] = reg
    sys.modules["det3d.models"].registry = reg
    bld = types.ModuleType("det3d.models.builder")
    sys.modules["det3d.models.builder"] = bld
    sys.modules["det3d.models"].builder = bld
    sys.modules["det3d.models"].utils = mu

    _load_as("det3d.models.losses.centernet_loss",
             os.path.join(ref, "det3d/models/losses/centernet_loss.py"))
    rpn_mod = _load_as("det3d.models.necks.rpn",
                       os.path.join(ref, "det3d/models/necks/rpn.py"))
    ch_mod = _load_as("det3d.models.bbox_heads.center_head",
                      os.path.join(ref, "det3d/models/bbox_heads/center_head.py"))

    torch.manual_seed(7)
    import logging
    neck = rpn_mod.RPN(layer_nums=[5, 5], ds_layer_strides=[1, 2],
                       ds_num_filters=[128, 256], us_layer_strides=[1, 2],
                       us_num_filters=[256, 256], num_input_features=256,
                       logger=logging.getLogger("rpn"))
    tasks = [dict(num_class=1, class_names=["car"]),
             dict(num_class=2, class_names=["truck", "construction_vehicle"]),
             dict(num_class=2, class_names=["bus", "trailer"]),
             dict(num_class=1, class_names=["barrier"]),
             dict(num_class=2, class_names=["motorcycle", "bicycle"]),
             dict(num_class=2, class_names=["pedestrian", "traffic_cone"])]
    head = ch_mod.CenterHead(
        in_channels=512, tasks=tasks, dataset="nuscenes",
        weight=0.25, code_weights=[1.0] * 10,
        common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        share_conv_channel=64, dcn_head=False)
    neck.eval()
    head.eval()

    # nudge running stats off their (0, 1) init so the BN mapping
    # (eps/momentum/layout) is actually exercised at eval time
    with torch.no_grad():
        for mod in list(neck.modules()) + list(head.modules()):
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.6, 1.5)

    rng = np.random.default_rng(11)
    bev = rng.standard_normal((1, 256, 40, 40)).astype(np.float32)
    with torch.no_grad():
        rpn_out = neck(torch.from_numpy(bev))
        preds, _ = head(rpn_out)      # forward returns (ret_dicts, shared)

    # --- double-flip predict golden ---------------------------------------
    # the reference fuses the 4-flip group INSIDE predict
    # (center_head.py:predict double_flip branch: map unflips, reg 1-x,
    # rot/vel sign flips, means) then decodes and post-processes. A
    # near-zero circle-NMS radius makes the NMS a no-op, so the golden
    # pins exactly the fusion + decode math (our double_flip_fuse +
    # decode_boxes) without the reference circle path's unsorted-order
    # quirk (LinK configs use rotated NMS, which is CUDA-only here).
    class AD(dict):
        def __getattr__(self, k):
            return self[k]

    rng2 = np.random.default_rng(31)
    hh = ww = 16
    pds = []
    for nc in (1, 2, 2, 1, 2, 2):          # one preds_dict per task
        pd = {"hm": rng2.standard_normal((4, nc, hh, ww)),
              "reg": rng2.random((4, 2, hh, ww)),
              "height": rng2.standard_normal((4, 1, hh, ww)) * 0.5,
              "dim": rng2.standard_normal((4, 3, hh, ww)) * 0.3,
              "rot": rng2.standard_normal((4, 2, hh, ww)),
              "vel": rng2.standard_normal((4, 2, hh, ww))}
        pds.append({k: v.astype(np.float32) for k, v in pd.items()})
    test_cfg = AD(double_flip=True, score_threshold=0.4,
                  post_center_limit_range=[-8.0, -8.0, -10.0,
                                           8.0, 8.0, 10.0],
                  out_size_factor=8, voxel_size=[0.075, 0.075],
                  pc_range=[-6.0, -6.0], circular_nms=True,
                  min_radius=[1e-6] * 6,
                  nms=AD(nms_post_max_size=500, nms_pre_max_size=500,
                         nms_iou_threshold=0.2))
    with torch.no_grad():
        ret = head.predict(
            {"metadata": []},
            [{k: torch.from_numpy(v.copy()) for k, v in pd.items()}
             for pd in pds],
            test_cfg)
    sel = ret[0]
    flip_arrays = {f"flip_t{t}_{k}": v for t, pd in enumerate(pds)
                   for k, v in pd.items()}
    flip_arrays.update(
        flip_boxes=sel["box3d_lidar"].numpy(),
        flip_scores=sel["scores"].numpy(),
        flip_labels=sel["label_preds"].numpy().astype(np.int64))

    # --- RoIHead golden (two-stage refinement MLP) --------------------------
    # roi_head.py:17-98 eval forward: shared Conv1d(k=1)+BN1d+ReLU stack
    # (+dropout, inert in eval) -> cls/reg stacks with a final biased
    # Conv1d. ProposalTargetLayer / iou3d are stubbed: training=False
    # never touches them.
    tga = pkg("det3d.models.roi_heads")
    pkg("det3d.models.roi_heads.target_assigner")
    ptl = types.ModuleType(
        "det3d.models.roi_heads.target_assigner.proposal_target_layer")
    class _PTL:                       # constructed but never called in eval
        def __init__(self, *a, **k):
            pass
    ptl.ProposalTargetLayer = _PTL
    sys.modules[ptl.__name__] = ptl
    reg.ROI_HEAD = reg.NECKS
    _load_as("det3d.models.roi_heads.roi_head_template",
             os.path.join(ref, "det3d/models/roi_heads/roi_head_template.py"))
    rh_mod = _load_as("det3d.models.roi_heads.roi_head",
                      os.path.join(ref, "det3d/models/roi_heads/roi_head.py"))

    class CfgAD(dict):
        def __getattr__(self, k):
            return self[k]

    torch.manual_seed(17)
    rcfg = CfgAD(SHARED_FC=[256, 256], CLS_FC=[256, 256],
                 REG_FC=[256, 256], DP_RATIO=0.3,
                 TARGET_CONFIG=CfgAD(), LOSS_CONFIG=CfgAD(
                     LOSS_WEIGHTS={"rcnn_cls_weight": 1.0,
                                   "rcnn_reg_weight": 1.0,
                                   "code_weights": [1.0] * 9}))
    rih = rh_mod.RoIHead(input_channels=128, model_cfg=rcfg, num_class=1,
                         code_size=9)
    rih.eval()
    with torch.no_grad():
        for mod in rih.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.6, 1.5)
    n_roi = 40
    roi_feats = rng2.standard_normal((1, n_roi, 128)).astype(np.float32)
    rois = np.concatenate(
        [rng2.uniform(-40, 40, (1, n_roi, 2)),          # x, y
         rng2.uniform(-2, 2, (1, n_roi, 1)),            # z
         rng2.uniform(0.5, 5, (1, n_roi, 3)),           # dims
         rng2.uniform(-3.2, 3.2, (1, n_roi, 1)),        # ry
         rng2.uniform(-2, 2, (1, n_roi, 2))],           # vel
        axis=2).astype(np.float32)
    bd = {"rois": torch.from_numpy(rois.copy()),
          "roi_features": torch.from_numpy(roi_feats)}
    with torch.no_grad():
        bd = rih(bd, training=False)
    roi_arrays = {
        "roi_feats": roi_feats, "roi_rois": rois,
        "roi_cls": bd["batch_cls_preds"].numpy(),
        "roi_boxes": bd["batch_box_preds"].numpy(),
        **{"roisd_" + k.replace(".", "__"): v.detach().numpy()
           for k, v in rih.state_dict().items()}}
    # BEV 5-point pooling golden (detectors/two_stage.py:get_box_center
    # 51-78 + second_stage/bird_eye_view.py + center_utils
    # bilinear_interpolate_torch) — includes boxes near/off the map edge
    # to pin the boundary clamp semantics
    CU = sys.modules["det3d.core.utils.center_utils"]
    bto2 = sys.modules["det3d.core.bbox.box_torch_ops"]
    bev_m = rng2.standard_normal((24, 24, 8)).astype(np.float32)
    nb2 = 30
    bboxes = np.concatenate(
        [rng2.uniform(-9, 9, (nb2, 2)),               # x, y (some off-map)
         rng2.uniform(-2, 2, (nb2, 1)),
         rng2.uniform(0.5, 5, (nb2, 3)),
         rng2.uniform(-2, 2, (nb2, 2)),
         rng2.uniform(-3.2, 3.2, (nb2, 1))], axis=1).astype(np.float32)
    tb = torch.from_numpy(bboxes)
    corners = bto2.center_to_corner_box2d(tb[:, :2], tb[:, 3:5], tb[:, -1])
    height = tb[:, 2:3]
    fm = torch.cat([(corners[:, 0] + corners[:, 1]) / 2, height], dim=-1)
    bm = torch.cat([(corners[:, 2] + corners[:, 3]) / 2, height], dim=-1)
    lm = torch.cat([(corners[:, 0] + corners[:, 3]) / 2, height], dim=-1)
    rm = torch.cat([(corners[:, 1] + corners[:, 2]) / 2, height], dim=-1)
    points = torch.cat([tb[:, :3], fm, bm, lm, rm], dim=0)
    pc_start, vox, ostride = (-6.0, -6.0), (0.5, 0.5), 1
    xs = (points[:, 0] - pc_start[0]) / vox[0] / ostride
    ys = (points[:, 1] - pc_start[1]) / vox[1] / ostride
    pooled = CU.bilinear_interpolate_torch(torch.from_numpy(bev_m), xs, ys)
    sec = len(pooled) // 5
    pooled = torch.cat([pooled[i * sec:(i + 1) * sec] for i in range(5)],
                       dim=1)
    roi_arrays.update(bev_map=bev_m, bev_boxes=bboxes,
                      bev_pooled=pooled.numpy())

    np.savez_compressed(os.path.join(args.out, "det_roi.npz"), **roi_arrays)
    print(f"roi golden: cls {tuple(bd['batch_cls_preds'].shape)} "
          f"boxes {tuple(bd['batch_box_preds'].shape)}")

    sd = {"neck." + k: v.detach().numpy()
          for k, v in neck.state_dict().items()}
    sd.update({"bbox_head." + k: v.detach().numpy()
               for k, v in head.state_dict().items()})
    arrays = dict(bev=bev, rpn_out=rpn_out.detach().numpy())
    for t, pd in enumerate(preds):
        for name, v in pd.items():
            arrays[f"task{t}_{name}"] = v.detach().numpy()
    np.savez_compressed(
        os.path.join(args.out, "det_dense.npz"), **arrays,
        **{"sd_" + k.replace(".", "__"): v for k, v in sd.items()})
    # separate small file: keeps the 26 MB weight archive untouched when
    # only the flip golden changes
    np.savez_compressed(os.path.join(args.out, "det_flip.npz"),
                        **flip_arrays)
    print(f"dense golden: rpn_out {tuple(rpn_out.shape)}, "
          f"{len(preds)} task dicts")


if __name__ == "__main__":
    main()
