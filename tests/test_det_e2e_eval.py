"""End-to-end detection eval path: model -> decode -> rotated NMS ->
NDS/mAP metrics, on a tiny grid. Catches seam bugs between the device
decode and host post-processing that unit tests miss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from link_tpu.data import det_pipeline as dp
from link_tpu.models.voxelnet import VoxelNet
from link_tpu.models.center_head import decode_boxes
from link_tpu.ops.nms import rotate_nms_pcdet
from link_tpu.eval import nuscenes_eval as NE

TEST_CFG = dict(
    post_center_limit_range=[-14, -14, -10.0, 14, 14, 10.0],
    nms_pre_max_size=200, nms_post_max_size=40, nms_iou_threshold=0.2,
    score_threshold=0.05, pc_range=[-12, -12], voxel_size=[0.5, 0.5],
    out_size_factor=8,
)


@pytest.mark.slow  # ~186 s CPU full-model compile (round-3 durations)
def test_detection_eval_path_runs():
    rng = np.random.default_rng(60)
    pr = (-12, -12, -2, 12, 12, 2)
    pts = rng.uniform(-11, 11, (4000, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.9, 1.9, 4000)
    voxels, coors, nppv = dp.points_to_voxel(pts, (0.5, 0.5, 0.1), pr,
                                             max_points=5, max_voxels=4000)
    gt_boxes = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0, 0.0, 0.2]],
                        np.float32)
    gt_classes = np.array([1], np.int32)
    batch = dp.collate_det([{"voxels": voxels, "coords_zyx": coors,
                             "num_points": nppv}], 4096, max_points=5)

    model = VoxelNet(num_input_features=5, batch_size=1,
                     grid_shape=(48, 48, 40),
                     capacities=(4096, 2048, 1024, 512))
    num_classes = [len(t) for t in model.tasks]

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["voxels"]),
                           jnp.asarray(batch["coords"]),
                           jnp.asarray(batch["num_points"]),
                           jnp.asarray(batch["nnz"]), False)

    @jax.jit
    def infer(v, voxels, coords, npts, nnz):
        preds = model.apply(v, voxels, coords, npts, nnz, False)
        return decode_boxes(preds, TEST_CFG, num_classes)

    outs = jax.device_get(infer(variables, jnp.asarray(batch["voxels"]),
                                jnp.asarray(batch["coords"]),
                                jnp.asarray(batch["num_points"]),
                                jnp.asarray(batch["nnz"])))
    boxes_l, scores_l, labels_l = [], [], []
    for boxes, scores, labels, mask in outs:
        m = np.asarray(mask[0])
        bx = np.asarray(boxes[0])[m]
        sc = np.asarray(scores[0])[m]
        lb = np.asarray(labels[0])[m]
        if not len(bx):
            continue
        keep = rotate_nms_pcdet(bx[:, [0, 1, 2, 3, 4, 5, 8]], sc,
                                thresh=0.2, pre_maxsize=200,
                                post_max_size=40)
        boxes_l.append(bx[keep])
        scores_l.append(sc[keep])
        labels_l.append(lb[keep])

    if boxes_l:
        pb = np.concatenate(boxes_l)
        ps = np.concatenate(scores_l)
        pl = np.concatenate(labels_l)
    else:  # untrained model may produce nothing over threshold — force one
        pb = np.zeros((0, 9))
        ps = np.zeros(0)
        pl = np.zeros(0, np.int64)

    assert pb.shape[1] == 9 if len(pb) else True
    samples = [{"gt_boxes": gt_boxes, "gt_classes": gt_classes,
                "pred_boxes": pb, "pred_scores": ps, "pred_labels": pl}]
    gt_c, pr_c, sc_c, at_c = NE.group_by_class(samples)
    m = NE.evaluate_nuscenes(gt_c, pr_c, sc_c, attrs_by_class=at_c)
    assert 0.0 <= m["nds"] <= 1.0
    assert 0.0 <= m["mean_ap"] <= 1.0


@pytest.mark.slow
def test_voxelnet_bev_feeds_two_stage():
    """Seam test: VoxelNet(return_bev=True) output, transposed to
    (H, W, C), must drive TwoStageRefinement without shape errors (the
    RPN emits channels-first; round-2 caught a silent layout mismatch
    here)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from link_tpu.data import det_pipeline as dp
    from link_tpu.models.voxelnet import VoxelNet
    from link_tpu.models import two_stage as TS

    rng = np.random.default_rng(5)
    pr = (-12, -12, -2, 12, 12, 2)
    pts = rng.uniform(-11, 11, (2000, 5)).astype(np.float32)
    voxels, coors, nppv = dp.points_to_voxel(pts, (0.5, 0.5, 0.1), pr,
                                             max_points=5, max_voxels=4000)
    batch = dp.collate_det([{"voxels": voxels, "coords_zyx": coors,
                             "num_points": nppv}], 4096, max_points=5)
    model = VoxelNet(num_input_features=5, batch_size=1,
                     grid_shape=(48, 48, 40),
                     capacities=(4096, 2048, 1024, 512), return_bev=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["voxels"]),
                           jnp.asarray(batch["coords"]),
                           jnp.asarray(batch["num_points"]),
                           jnp.asarray(batch["nnz"]), False)
    _, bev = model.apply(variables, jnp.asarray(batch["voxels"]),
                         jnp.asarray(batch["coords"]),
                         jnp.asarray(batch["num_points"]),
                         jnp.asarray(batch["nnz"]), False)
    assert bev.ndim == 4                       # (B, C, H', W')
    bev0 = jnp.transpose(bev[0], (1, 2, 0))    # -> (H', W', C)
    refine = TS.TwoStageRefinement(
        bev_channels=int(bev0.shape[-1]), num_point=5, code_size=9,
        pc_start=(-12.0, -12.0), voxel_size=(0.5, 0.5), out_stride=4)
    rois = jnp.zeros((8, 9)).at[:, 3:6].set(1.0)
    rv = refine.init(jax.random.PRNGKey(1), bev0, rois, jnp.zeros((8,)),
                     False)
    iou, reg = refine.apply(rv, bev0, rois, jnp.zeros((8,)), False)
    assert iou.shape == (8,) and reg.shape == (8, 9)
    assert np.isfinite(np.asarray(iou)).all()
