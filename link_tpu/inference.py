"""Single-frame detection inference API.

The reference exposes online inference only through ROS nodes
(detection/tools/single_infernece_ros.py:92-170,
multi_sweep_inference_ros.py) that voxelize one cloud, run the
detector, decode + NMS, and filter with per-class score thresholds.
This module packages that loop as a reusable predictor class —
`tools/stream_inference.py` drives it over files/directories (and over
ROS topics when rospy exists).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

DEFAULT_TEST_CFG = dict(
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

# per-class score floors from the reference ROS node
# (single_infernece_ros.py:42-52); keys are global label ids
NUSC_CLASS_SCORE_FLOOR = {
    0: 0.4, 1: 0.4, 2: 0.4, 3: 0.3, 4: 0.4,
    5: 0.4, 6: 0.15, 7: 0.15, 8: 0.10, 9: 0.10,
}


class SingleFramePredictor:
    """Voxelize -> VoxelNet forward -> decode -> rotated NMS for one
    point cloud at a time. The jitted forward is compiled once on the
    first call (static capacities), then every frame reuses it."""

    def __init__(self, config: Optional[str] = None,
                 checkpoint: Optional[str] = None,
                 max_voxels: int = 160000,
                 class_score_floor: Optional[Dict[int, float]] = None,
                 seed: int = 0, capacity: int = 163840,
                 grid_shape=(1440, 1440, 40),
                 test_cfg: Optional[Dict] = None,
                 device_nms: bool = False):
        import jax
        import jax.numpy as jnp
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(os.path.dirname(
                               os.path.dirname(os.path.abspath(__file__))),
                               ".jax_cache")))
        from link_tpu.models.voxelnet import VoxelNet
        from link_tpu.models.center_head import decode_boxes
        from link_tpu.train import trainer as T
        from link_tpu.train.checkpoint import load_checkpoint

        self.cfg = dict(DEFAULT_TEST_CFG)
        if config:
            from link_tpu.utils.config import load_py_config
            c = load_py_config(config)
            t = c.test_cfg
            self.cfg.update(
                post_center_limit_range=list(t.post_center_limit_range),
                max_per_img=t.max_per_img,
                nms_pre_max_size=t.nms.nms_pre_max_size,
                nms_post_max_size=t.nms.nms_post_max_size,
                nms_iou_threshold=t.nms.nms_iou_threshold,
                score_threshold=t.score_threshold,
                pc_range=list(t.pc_range), voxel_size=list(t.voxel_size),
                out_size_factor=t.out_size_factor)
        if test_cfg:
            self.cfg.update(test_cfg)
        self.score_floor = (NUSC_CLASS_SCORE_FLOOR
                            if class_score_floor is None
                            else class_score_floor)
        self.voxel_size = (self.cfg["voxel_size"][0],
                           self.cfg["voxel_size"][1], 0.2)
        self.point_range = (self.cfg["pc_range"][0], self.cfg["pc_range"][1],
                            -5.0, -self.cfg["pc_range"][0],
                            -self.cfg["pc_range"][1], 3.0)
        self.max_voxels = max_voxels

        cap = capacity
        self.cap = cap
        self.model = VoxelNet(num_input_features=5, batch_size=1,
                              grid_shape=tuple(grid_shape),
                              capacities=(cap, cap // 2, cap // 4, cap // 8))
        num_classes = [len(t) for t in self.model.tasks]
        self._jnp = jnp

        self.device_nms = device_nms

        def fwd(params, bstats, voxels, coords, npts, nnz):
            preds = self.model.apply(
                {"params": params, "batch_stats": bstats},
                voxels, coords, npts, nnz, False)
            outs = decode_boxes(preds, self.cfg, num_classes)
            if device_nms:
                # fully on-device path (SURVEY §7.8): suppression runs in
                # the same jit program; the host only reads final keeps
                from link_tpu.models.center_head import device_nms as dnms
                outs = dnms(outs, self.cfg)
            return outs

        self._fwd = jax.jit(fwd)
        self._vars = None
        self._checkpoint = checkpoint
        self._T = T
        self._load_checkpoint = load_checkpoint
        self._rng = jax.random.PRNGKey(seed)

    def _ensure_vars(self, b):
        import jax.numpy as jnp
        if self._vars is not None:
            return
        variables = self.model.init(
            self._rng, jnp.asarray(b["voxels"]), jnp.asarray(b["coords"]),
            jnp.asarray(b["num_points"]), jnp.asarray(b["nnz"]), False)
        params, bstats = variables["params"], variables["batch_stats"]
        if self._checkpoint:
            import optax
            template = self._T.TrainState(
                step=0, params=params, batch_stats=bstats,
                opt_state=optax.sgd(0.1).init(params))
            st = self._load_checkpoint(self._checkpoint, template)
            params, bstats = st.params, st.batch_stats
        self._params, self._bstats = params, bstats

    def predict(self, points: np.ndarray) -> Dict[str, np.ndarray]:
        """points (N, >=5) float32 -> {box3d_lidar, scores, label_preds}
        after NMS and per-class score floors."""
        import jax.numpy as jnp
        from link_tpu.data import det_pipeline as dp
        from link_tpu.ops.nms import rotate_nms_pcdet

        if points.shape[1] < 5:
            pad = np.zeros((len(points), 5 - points.shape[1]), np.float32)
            points = np.concatenate([points.astype(np.float32), pad], 1)
        from link_tpu import native
        if native.available() and len(points):
            # one native pass emits the device-ready batch (no (V, ...)
            # intermediates, no collate copies) — serving host path
            vs = np.asarray(self.voxel_size, np.float32)
            pr = np.asarray(self.point_range, np.float32)
            grid = np.round((pr[3:6] - pr[:3]) / vs).astype(np.int32)
            b = native.voxelize_collated(points, vs, pr, grid, 10,
                                         self.max_voxels, self.cap,
                                         num_feats=points.shape[1])
        else:
            voxels, coords_zyx, nppv = dp.points_to_voxel(
                points, self.voxel_size, self.point_range, 10,
                self.max_voxels)
            b = dp.collate_det([{"voxels": voxels, "coords_zyx": coords_zyx,
                                 "num_points": nppv}], self.cap)
        self._ensure_vars(b)
        task_outs = self._fwd(self._params, self._bstats,
                              jnp.asarray(b["voxels"]),
                              jnp.asarray(b["coords"]),
                              jnp.asarray(b["num_points"]),
                              jnp.asarray(b["nnz"]))
        import jax
        task_outs = jax.device_get(task_outs)

        boxes_l, scores_l, labels_l = [], [], []
        for boxes, scores, labels, mask in task_outs:
            m = np.asarray(mask[0])
            bx, sc, lb = (np.asarray(boxes[0])[m], np.asarray(scores[0])[m],
                          np.asarray(labels[0])[m])
            if len(bx) == 0:
                continue
            if self.device_nms:
                # mask is already the post-NMS keep computed on device
                boxes_l.append(bx)
                scores_l.append(sc)
                labels_l.append(lb)
                continue
            b7 = bx[:, [0, 1, 2, 3, 4, 5, 8]]
            keep = rotate_nms_pcdet(
                b7, sc, thresh=self.cfg["nms_iou_threshold"],
                pre_maxsize=self.cfg["nms_pre_max_size"],
                post_max_size=self.cfg["nms_post_max_size"])
            boxes_l.append(bx[keep])
            scores_l.append(sc[keep])
            labels_l.append(lb[keep])
        if not boxes_l:
            return {"box3d_lidar": np.zeros((0, 9), np.float32),
                    "scores": np.zeros(0, np.float32),
                    "label_preds": np.zeros(0, np.int64)}
        pb = np.concatenate(boxes_l)
        ps = np.concatenate(scores_l)
        pl = np.concatenate(labels_l)
        if self.score_floor:
            floors = np.asarray([self.score_floor.get(int(l), 0.0)
                                 for l in pl])
            keep = ps >= floors
            pb, ps, pl = pb[keep], ps[keep], pl[keep]
        return {"box3d_lidar": pb, "scores": ps, "label_preds": pl}
