#!/usr/bin/env python
"""Two-stage fine-tuning: freeze the first stage, train the RoI refinement
head on its proposals.

Reference: detection/det3d/models/detectors/two_stage.py (freeze=True "we
train the model in two steps") + the two_stage *_ft_6epoch_freeze configs:
first-stage forward + NMS produce proposals, proposal-target assignment
samples 128 rois/image, and the RoI head trains with BCE(iou) + L1
(canonical residuals) under one-cycle Adam.
"""

import argparse
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
    nms_pre_max_size=1000, nms_post_max_size=83, nms_iou_threshold=0.2,
    score_threshold=0.1, pc_range=[-54, -54], voxel_size=[0.075, 0.075],
    out_size_factor=8,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="first-stage checkpoint (frozen)")
    ap.add_argument("--info-path",
                    default="data/nuScenes/infos_train_10sweeps_withvelo_filter_True.pkl")
    ap.add_argument("--root-path", default="data/nuScenes")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--gt-proposals", action="store_true",
                    help="augment proposals with jittered GT boxes — "
                         "gives the RoI head foreground supervision even "
                         "when the first stage is untrained (synthetic "
                         "validation); with a trained first stage the "
                         "reference gets fg from real proposals")
    ap.add_argument("--steps", type=int, default=0, help="0 = one epoch")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--run-dir", default="runs/two_stage")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from link_tpu.data import det_pipeline as dp
    from link_tpu.data.nuscenes import NuScenesDataset, SyntheticNuScenes
    from link_tpu.models.voxelnet import VoxelNet
    from link_tpu.models.center_head import decode_boxes
    from link_tpu.models import two_stage as TS
    from link_tpu.ops.nms import rotate_nms_pcdet
    from link_tpu.train import trainer as T
    from link_tpu.train import det_trainer as DT
    from link_tpu.train import schedules
    from link_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    if args.synthetic or not os.path.exists(args.info_path):
        ds = SyntheticNuScenes(length=16, mode="train", max_voxels=120000)
    else:
        ds = NuScenesDataset(args.info_path, args.root_path, mode="train",
                             max_voxels=(120000, 160000))
    grid = (1440, 1440, 40)
    cap = 131072
    model = VoxelNet(num_input_features=5, batch_size=1, grid_shape=grid,
                     capacities=(cap, cap // 2, cap // 4, cap // 8),
                     return_bev=True)
    num_classes = [len(t) for t in model.tasks]

    s0 = ds[0]
    b0 = dp.collate_det([s0], cap)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(b0["voxels"]),
                           jnp.asarray(b0["coords"]),
                           jnp.asarray(b0["num_points"]),
                           jnp.asarray(b0["nnz"]), False)
    params, bstats = variables["params"], variables["batch_stats"]
    if args.checkpoint:
        template = T.TrainState(step=jnp.int32(0), params=params,
                                batch_stats=bstats,
                                opt_state=optax.sgd(0.1).init(params))
        st = load_checkpoint(args.checkpoint, template)
        params, bstats = st.params, st.batch_stats
        print(f"restored first stage {args.checkpoint}")

    @jax.jit
    def first_stage(params, bstats, voxels, coords, npts, nnz):
        preds, bev = model.apply({"params": params, "batch_stats": bstats},
                                 voxels, coords, npts, nnz, False)
        return decode_boxes(preds, TEST_CFG, num_classes), bev

    refine = TS.TwoStageRefinement(
        bev_channels=512, num_point=5, code_size=9,
        pc_start=(TEST_CFG["pc_range"][0], TEST_CFG["pc_range"][1]),
        voxel_size=(TEST_CFG["voxel_size"][0], TEST_CFG["voxel_size"][1]),
        out_stride=TEST_CFG["out_size_factor"])
    n_roi = TS.ROI_SAMPLER_DEFAULTS["ROI_PER_IMAGE"]

    steps_per_epoch = args.steps or len(ds)
    total = steps_per_epoch * args.epochs
    lr_fn, mom_fn = schedules.one_cycle(args.lr, total)
    tx = DT.make_one_cycle_adam(lr_fn, mom_fn, weight_decay=0.01,
                                grad_clip=35.0)

    r_vars = refine.init(jax.random.PRNGKey(1),
                         jnp.zeros((180, 180, 512)),
                         jnp.zeros((n_roi, 9)), jnp.zeros((n_roi,)), True)
    r_params, r_bs = r_vars["params"], r_vars["batch_stats"]
    opt_state = tx.init(r_params)

    @jax.jit
    def train_step(r_params, r_bs, opt_state, bev0, rois, scores,
                   cls_labels, reg_targets, reg_mask):
        def loss_fn(p):
            (iou, reg), mut = refine.apply(
                {"params": p, "batch_stats": r_bs}, bev0, rois, scores,
                True, mutable=["batch_stats"])
            cl, rl = TS.roi_losses(iou, reg, cls_labels, reg_targets,
                                   reg_mask)
            return cl + rl, (mut["batch_stats"], cl, rl)
        (loss, (bs2, cl, rl)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(r_params)
        up, opt2 = tx.update(g, opt_state, r_params)
        return optax.apply_updates(r_params, up), bs2, opt2, loss, cl, rl

    rng = np.random.default_rng(0)
    step = 0
    t0 = time.time()
    for epoch in range(args.epochs):
        for i in range(steps_per_epoch):
            s = ds[i % len(ds)]
            b = dp.collate_det([s], cap)
            decoded, bev = first_stage(
                params, bstats, jnp.asarray(b["voxels"]),
                jnp.asarray(b["coords"]), jnp.asarray(b["num_points"]),
                jnp.asarray(b["nnz"]))
            boxes_l, scores_l, labels_l = [], [], []
            for boxes, scores, labels, mask in jax.device_get(decoded):
                m = np.asarray(mask[0])
                bx = np.asarray(boxes[0])[m]
                if not len(bx):
                    continue
                keep = rotate_nms_pcdet(
                    bx[:, [0, 1, 2, 3, 4, 5, 8]], np.asarray(scores[0])[m],
                    thresh=TEST_CFG["nms_iou_threshold"],
                    pre_maxsize=TEST_CFG["nms_pre_max_size"],
                    post_max_size=TEST_CFG["nms_post_max_size"])
                boxes_l.append(bx[keep])
                scores_l.append(np.asarray(scores[0])[m][keep])
                labels_l.append(np.asarray(labels[0])[m][keep])
            if not boxes_l and not args.gt_proposals:
                continue
            pb = np.concatenate(boxes_l) if boxes_l else np.zeros((0, 9))
            ps = np.concatenate(scores_l) if scores_l else np.zeros(0)
            pl = np.concatenate(labels_l) if labels_l else np.zeros(0, np.int64)
            if args.gt_proposals and len(s["gt_boxes"]):
                jit = s["gt_boxes"] + rng.normal(
                    0, 0.1, s["gt_boxes"].shape).astype(np.float32)
                pb = np.concatenate([pb, jit]) if len(pb) else jit
                ps = np.concatenate(
                    [ps, np.full(len(jit), 0.5, np.float32)])
                pl = np.concatenate(
                    [pl, s["gt_classes"].astype(pl.dtype)])
            t = TS.assign_roi_targets(
                TS.reorder_to_roi_layout(pb), ps, pl,
                s["gt_boxes"], s["gt_classes"], rng)
            r_params, r_bs, opt_state, loss, cl, rl = train_step(
                # RPN emits (B, C, H, W); the refinement samples (H, W, C)
                r_params, r_bs, opt_state, jnp.transpose(bev[0], (1, 2, 0)),
                jnp.asarray(t["rois"]), jnp.asarray(t["roi_scores"]),
                jnp.asarray(t["cls_labels"]), jnp.asarray(t["gt_of_rois"]),
                jnp.asarray(t["reg_mask"]))
            step += 1
            if step % 10 == 0:
                print(f"e{epoch} s{step} loss={float(loss):.4f} "
                      f"cls={float(cl):.4f} reg={float(rl):.4f} "
                      f"({(time.time()-t0)/step:.2f}s/it)", flush=True)

    os.makedirs(args.run_dir, exist_ok=True)
    save_checkpoint(os.path.join(args.run_dir, "roi_head"),
                    {"params": r_params, "batch_stats": r_bs}, step)
    print(f"saved {args.run_dir}/roi_head ({step} steps)")


if __name__ == "__main__":
    main()
