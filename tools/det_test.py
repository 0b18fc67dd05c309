#!/usr/bin/env python
"""Detection eval: forward + decode + rotated NMS + NDS/mAP (+ latency).

Reference: detection/tools/dist_test.py:73-218 — no-grad loop, middle-third
latency probe (--speed-test), detection gathering and nuScenes evaluation.
Supports TTA input rotation (--tt-rotation, degrees) whose predictions are
rotated back before fusion (center_head.py:490-504).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

TEST_CFG = dict(
    post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
    max_per_img=500,
    nms_pre_max_size=1000,
    nms_post_max_size=83,
    nms_iou_threshold=0.2,
    score_threshold=0.1,
    pc_range=[-54, -54],
    voxel_size=[0.075, 0.075],
    out_size_factor=8,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    help="reference-style py config; overrides TEST_CFG")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--info-path", default="data/nuScenes/infos_val_10sweeps_withvelo_filter_True.pkl")
    ap.add_argument("--root-path", default="data/nuScenes")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--speed-test", action="store_true")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--tt-rotation", type=float, default=0.0,
                    help="TTA input rotation (degrees); the input cloud is "
                         "rotated before voxelization and predictions are "
                         "rotated back (reference preprocess.py:153-157 + "
                         "center_head.py:490-504)")
    ap.add_argument("--double-flip", action="store_true",
                    help="4-flip TTA: batch [orig, y-flip, x-flip, xy-flip] "
                         "inputs and fuse predictions at decode "
                         "(test_aug.py DoubleFlip + center_head.py:320-416)")
    ap.add_argument("--two-stage", action="store_true",
                    help="RoI refinement second stage (reference "
                         "detectors/two_stage.py): BEV 5-point pooling + "
                         "RoI head rescoring/refining the NMS proposals")
    ap.add_argument("--two-stage-checkpoint", default=None,
                    help="orbax/pickle checkpoint for the refinement head")
    ap.add_argument("--dcn-head", action="store_true",
                    help="DCNSepHead (deformable feature adaption) instead "
                         "of SepHead (reference bbox_head.dcn_head)")
    ap.add_argument("--dense-from-level", type=int, default=None,
                    help="hybrid dense backbone: levels >= L run masked "
                         "dense convs on the MXU (scn.py dense_from_level)")
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="model compute dtype (box decode stays f32); "
                         "bfloat16 halves feature-gather bytes + MXU time")
    ap.add_argument("--device-nms", action="store_true",
                    help="run rotated NMS on device inside the jitted "
                         "forward (ops/nms.rotate_nms_jax) — nothing "
                         "leaves the chip between backbone and boxes")
    ap.add_argument("--out", default=None, help="write predictions json")
    ap.add_argument("--save-vis", default=None,
                    help="write a visualization pkl (points + detections "
                         "+ gt) for tools/demo.py")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from link_tpu.data import det_pipeline as dp
    from link_tpu.data.nuscenes import NuScenesDataset, SyntheticNuScenes
    from link_tpu.models.voxelnet import VoxelNet
    from link_tpu.models.center_head import decode_boxes
    from link_tpu.ops.nms import rotate_nms_pcdet
    from link_tpu.ops import box_np
    from link_tpu.train import trainer as T
    from link_tpu.train.checkpoint import load_checkpoint
    from link_tpu.eval import nuscenes_eval as NE

    global TEST_CFG
    if args.config:
        from link_tpu.utils.config import load_py_config
        cfg = load_py_config(args.config)
        t = cfg.test_cfg
        TEST_CFG = dict(
            post_center_limit_range=list(t.post_center_limit_range),
            max_per_img=t.max_per_img,
            nms_pre_max_size=t.nms.nms_pre_max_size,
            nms_post_max_size=t.nms.nms_post_max_size,
            nms_iou_threshold=t.nms.nms_iou_threshold,
            score_threshold=t.score_threshold,
            pc_range=list(t.pc_range), voxel_size=list(t.voxel_size),
            out_size_factor=t.out_size_factor)

    tt_rot = float(np.deg2rad(args.tt_rotation))
    if args.synthetic or not os.path.exists(args.info_path):
        ds = SyntheticNuScenes(length=8, mode="train", max_voxels=160000,
                               tt_rotation=tt_rot,
                               double_flip=args.double_flip)
        grid = (1440, 1440, 40)
    else:
        ds = NuScenesDataset(args.info_path, args.root_path, mode="val",
                             max_voxels=(120000, 160000),
                             tt_rotation=tt_rot,
                             double_flip=args.double_flip)
        grid = (1440, 1440, 40)

    # reference configs choose the head via bbox_head.dcn_head
    # (center_head.py:221-238); --dcn-head forces it for synthetic runs
    dcn = args.dcn_head
    if args.config:
        dcn = dcn or bool(getattr(cfg.model.bbox_head, "dcn_head", False))

    n_batch = 4 if args.double_flip else 1
    cap = 163840 * n_batch
    model = VoxelNet(num_input_features=5, batch_size=n_batch,
                     grid_shape=grid,
                     capacities=(cap, cap // 2, cap // 4, cap // 8),
                     return_bev=args.two_stage, dcn_head=dcn,
                     dtype=args.dtype,
                     dense_from_level=args.dense_from_level)
    num_classes = [len(t) for t in model.tasks]

    def batch_samples(s):
        # double-flip: group [orig, y-flip, x-flip, xy-flip] in one batch
        # (the order double_flip_fuse expects); targets are eval-irrelevant
        # and the flip variants have none, so strip them before collation
        if args.double_flip:
            keys = ("voxels", "coords_zyx", "num_points")
            group = [{k: s[k] for k in keys}] + list(s["flip_variants"])
        else:
            group = [s]
        return dp.collate_det(group, cap)

    s0 = ds[0]
    b0 = batch_samples(s0)

    @jax.jit
    def forward(params, bstats, voxels, coords, npts, nnz):
        out = model.apply({"params": params, "batch_stats": bstats},
                          voxels, coords, npts, nnz, False)
        preds, bev = out if args.two_stage else (out, None)
        decoded = decode_boxes(preds, TEST_CFG, num_classes,
                               double_flip=args.double_flip)
        if args.device_nms:
            from link_tpu.models.center_head import device_nms
            decoded = device_nms(decoded, TEST_CFG)
        return (decoded, bev) if args.two_stage else decoded

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(b0["voxels"]),
                           jnp.asarray(b0["coords"]),
                           jnp.asarray(b0["num_points"]),
                           jnp.asarray(b0["nnz"]), False)
    params, bstats = variables["params"], variables["batch_stats"]
    if args.checkpoint:
        import optax
        template = T.TrainState(step=jnp.int32(0), params=params,
                                batch_stats=bstats,
                                opt_state=optax.sgd(0.1).init(params))
        st = load_checkpoint(args.checkpoint, template)
        params, bstats = st.params, st.batch_stats
        print(f"restored {args.checkpoint}")

    # ---- second stage (reference TwoStageDetector, NMS_POST_MAXSIZE 500,
    # num_point 5) -------------------------------------------------------
    refine = refine_vars = refine_apply = None
    n_roi_max = 500
    if args.two_stage:
        from link_tpu.models import two_stage as TS
        refine = TS.TwoStageRefinement(
            bev_channels=512, num_point=5, code_size=9,
            pc_start=(TEST_CFG["pc_range"][0], TEST_CFG["pc_range"][1]),
            voxel_size=(TEST_CFG["voxel_size"][0],
                        TEST_CFG["voxel_size"][1]),
            out_stride=TEST_CFG["out_size_factor"])

        @jax.jit
        def refine_apply(variables, bev0, rois, scores):
            iou, reg = refine.apply(variables, bev0, rois, scores, False)
            boxes = TS.generate_refined_boxes(rois, reg)
            return TS.second_stage_score(iou, scores), boxes

        def refine_sample(variables, bev0, pb, ps):
            from link_tpu.models import two_stage as TSm
            rois = np.zeros((n_roi_max, 9), np.float32)
            scores = np.zeros((n_roi_max,), np.float32)
            k = min(len(pb), n_roi_max)
            if k:
                rois[:k] = TSm.reorder_to_roi_layout(pb[:k])
                scores[:k] = ps[:k]
            s2, boxes = refine_apply(variables, bev0, jnp.asarray(rois),
                                     jnp.asarray(scores))
            boxes = TSm.roi_layout_to_det3d(np.asarray(boxes))
            return np.asarray(s2)[:k], boxes[:k]

    n = min(len(ds), args.limit) if args.limit else len(ds)
    samples, latencies = [], []
    for i in range(n):
        s = ds[i]
        b = batch_samples(s)
        t0 = time.perf_counter()
        task_outs = forward(params, bstats, jnp.asarray(b["voxels"]),
                            jnp.asarray(b["coords"]),
                            jnp.asarray(b["num_points"]),
                            jnp.asarray(b["nnz"]))
        bev_out = None
        if args.two_stage:
            task_outs, bev_out = task_outs
        task_outs = jax.device_get(task_outs)
        latencies.append(time.perf_counter() - t0)

        boxes_l, scores_l, labels_l = [], [], []
        for boxes, scores, labels, mask in task_outs:
            m = np.asarray(mask[0])
            bx, sc, lb = (np.asarray(boxes[0])[m], np.asarray(scores[0])[m],
                          np.asarray(labels[0])[m])
            if len(bx) == 0:
                continue
            if args.device_nms:      # mask was the on-device post-NMS keep
                boxes_l.append(bx)
                scores_l.append(sc)
                labels_l.append(lb)
                continue
            b7 = bx[:, [0, 1, 2, 3, 4, 5, 8]]
            keep = rotate_nms_pcdet(b7, sc,
                                    thresh=TEST_CFG["nms_iou_threshold"],
                                    pre_maxsize=TEST_CFG["nms_pre_max_size"],
                                    post_max_size=TEST_CFG["nms_post_max_size"])
            boxes_l.append(bx[keep])
            scores_l.append(sc[keep])
            labels_l.append(lb[keep])
        if boxes_l:
            pb = np.concatenate(boxes_l)
            ps = np.concatenate(scores_l)
            pl = np.concatenate(labels_l)
        else:
            pb, ps, pl = (np.zeros((0, 9)), np.zeros(0),
                          np.zeros(0, np.int64))

        if args.two_stage and len(pb):
            # RPN emits (B, C, H, W); the refinement samples (H, W, C)
            bev0 = jnp.transpose(bev_out[0], (1, 2, 0))
            if refine_vars is None:
                refine_vars = refine.init(
                    jax.random.PRNGKey(1), bev0,
                    jnp.zeros((n_roi_max, 9)), jnp.zeros((n_roi_max,)),
                    False)
                if args.two_stage_checkpoint:
                    from link_tpu.train.checkpoint import load_checkpoint
                    refine_vars = load_checkpoint(
                        args.two_stage_checkpoint, refine_vars)
            ps, pb = refine_sample(refine_vars, bev0, pb, ps)
            pl = pl[:len(pb)]

        if args.tt_rotation != 0.0:
            from link_tpu.eval.tta_fusion import rotate_predictions_back
            pb = rotate_predictions_back(pb, np.deg2rad(args.tt_rotation))

        rec = {"token": s.get("token", str(i)), "pred_boxes": pb,
               "pred_scores": ps, "pred_labels": pl}
        if "gt_boxes" in s:
            rec["gt_boxes"] = s["gt_boxes"]
            rec["gt_classes"] = s["gt_classes"]
            for k in ("gt_attributes", "gt_num_pts"):
                if k in s:
                    rec[k] = s[k]
        if args.save_vis:
            # recover the (voxel-capped) cloud from the voxel buffers:
            # each voxel row stores its first max_points raw points
            v, c = s["voxels"], s["num_points"]
            pts = np.concatenate([v[j, :c[j], :3] for j in range(len(c))]) \
                if len(c) else np.zeros((0, 3), np.float32)
            rec["_vis"] = {"points": pts,
                           "detections": {"box3d_lidar": pb, "scores": ps,
                                          "label_preds": pl},
                           "gt_boxes": s.get("gt_boxes")}
        samples.append(rec)
        if (i + 1) % 50 == 0:
            print(f"[{i+1}/{n}]", flush=True)

    if args.speed_test and len(latencies) > 3:
        third = len(latencies) // 3
        mid = latencies[third:2 * third]
        print(f"latency (middle third): {np.mean(mid)*1000:.1f} ms "
              f"({1/np.mean(mid):.2f} samples/s)")

    if args.save_vis:
        import pickle
        os.makedirs(os.path.dirname(args.save_vis) or ".", exist_ok=True)
        with open(args.save_vis, "wb") as f:
            pickle.dump([s.pop("_vis") for s in samples], f)
        print("wrote", args.save_vis)

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump([{k: (v.tolist() if isinstance(v, np.ndarray) else v)
                        for k, v in s.items()} for s in samples], f)

    if samples and "gt_boxes" in samples[0]:
        gt_c, pr_c, sc_c, at_c = NE.group_by_class(samples)
        metrics = NE.evaluate_nuscenes(gt_c, pr_c, sc_c, attrs_by_class=at_c)
        print(f"mAP: {metrics['mean_ap']*100:.2f}  NDS: "
              f"{metrics['nds']*100:.2f}")
        for c, ap in metrics["class_aps"].items():
            print(f"  {c}: AP {ap*100:.1f}")


if __name__ == "__main__":
    main()
