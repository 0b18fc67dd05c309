"""nuScenes detection dataset: info-pkl driven, CBGS, 10-sweep loading.

Reference: detection/det3d/datasets/nuscenes/nuscenes.py:29-347 (dataset +
CBGS class-balanced resampling), pipelines/loading.py:110-183 (sweep
accumulation), nusc_common.py:354-548 (info generation — requires the
nuscenes-devkit, gated import here).

Info pickle format (one dict per keyframe):
  lidar_path, token, sweeps[{lidar_path, transform_matrix, time_lag}],
  gt_boxes (N, 9) [x y z w l h vx vy rot], gt_names, gt_boxes_velocity.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from . import det_pipeline as dp
from .det_pipeline import NUSC_CLASSES

GENERAL_TO_DETECTION = {
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.wheelchair": "ignore",
    "human.pedestrian.stroller": "ignore",
    "human.pedestrian.personal_mobility": "ignore",
    "human.pedestrian.police_officer": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "animal": "ignore",
    "vehicle.car": "car",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.truck": "truck",
    "vehicle.construction": "construction_vehicle",
    "vehicle.emergency.ambulance": "ignore",
    "vehicle.emergency.police": "ignore",
    "vehicle.trailer": "trailer",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic_cone",
    "movable_object.pushable_pullable": "ignore",
    "movable_object.debris": "ignore",
    "static_object.bicycle_rack": "ignore",
}


def read_file(path: str) -> np.ndarray:
    """Raw nuScenes .bin: (N, 5) float32, keep (x, y, z, intensity)
    (loading.py:23-37)."""
    points = np.fromfile(path, dtype=np.float32).reshape(-1, 5)[:, :4]
    return points


def remove_close(points: np.ndarray, radius: float = 1.0) -> np.ndarray:
    """Drop ego-vehicle returns (loading.py:66-74)."""
    keep = ~((np.abs(points[:, 0]) < radius) & (np.abs(points[:, 1]) < radius))
    return points[keep]


def read_sweep(sweep: Dict) -> (np.ndarray, np.ndarray):
    """Re-project one sweep into the keyframe frame (loading.py:77-90)."""
    points_sweep = read_file(str(sweep["lidar_path"])).T  # (4, N)
    nbr = points_sweep.shape[1]
    if sweep["transform_matrix"] is not None:
        tm = sweep["transform_matrix"]
        points_sweep[:3, :] = tm.dot(
            np.vstack((points_sweep[:3, :], np.ones(nbr))))[:3, :]
    points_sweep = remove_close(points_sweep.T)
    times = sweep["time_lag"] * np.ones((points_sweep.shape[0], 1))
    return points_sweep, times


def load_sweeps(info: Dict, nsweeps: int,
                rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """(N, 5) = (x, y, z, intensity, time_lag) combined cloud."""
    points = read_file(info["lidar_path"])
    pts_list = [points]
    times_list = [np.zeros((points.shape[0], 1), np.float32)]
    sweeps = info.get("sweeps", [])
    if len(sweeps) > 0:
        gen = rng or np.random.default_rng()
        for i in gen.choice(len(sweeps), min(nsweeps - 1, len(sweeps)),
                            replace=False):
            ps, ts = read_sweep(sweeps[i])
            pts_list.append(ps)
            times_list.append(ts)
    pts = np.concatenate(pts_list).astype(np.float32)
    times = np.concatenate(times_list).astype(np.float32)
    return np.hstack([pts, times])


def cbgs_resample(infos: List[Dict], class_names: Sequence[str],
                  rng: Optional[np.random.Generator] = None) -> List[Dict]:
    """Class-balanced resampling (nuscenes.py:86-121)."""
    gen = rng or np.random.default_rng()
    cls_infos = {n: [] for n in class_names}
    for info in infos:
        for name in set(info["gt_names"]):
            if name in class_names:
                cls_infos[name].append(info)
    dup = sum(len(v) for v in cls_infos.values())
    dist = {k: len(v) / max(dup, 1) for k, v in cls_infos.items()}
    frac = 1.0 / len(class_names)
    out = []
    for name in class_names:
        v = cls_infos[name]
        ratio = frac / max(dist[name], 1e-9)
        if len(v):
            picks = gen.choice(len(v), int(len(v) * ratio))
            out += [v[i] for i in picks]
    return out


class NuScenesDataset:
    def __init__(self, info_path: str, root_path: str = "",
                 nsweeps: int = 10, class_names=NUSC_CLASSES,
                 mode: str = "train", use_cbgs: bool = True,
                 pc_range=(-54, -54, -5.0, 54, 54, 3.0),
                 voxel_size=(0.075, 0.075, 0.2), max_points_in_voxel=10,
                 max_voxels=(120000, 160000), out_size_factor=8,
                 db_sampler=None, seed: int = 0,
                 tt_rotation: float = 0.0, double_flip: bool = False):
        with open(info_path, "rb") as f:
            infos = pickle.load(f)
        if isinstance(infos, dict):
            merged = []
            for v in infos.values():
                merged += v
            infos = merged
        self.rng = np.random.default_rng(seed)
        if mode == "train" and use_cbgs:
            infos = cbgs_resample(infos, class_names, self.rng)
        self.infos = infos
        self.root_path = root_path
        self.nsweeps = nsweeps
        self.class_names = list(class_names)
        self.mode = mode
        self.pc_range = pc_range
        self.voxel_size = voxel_size
        self.max_points_in_voxel = max_points_in_voxel
        self.max_voxels = max_voxels[0] if mode == "train" else max_voxels[1]
        self.out_size_factor = out_size_factor
        self.db_sampler = db_sampler
        self.tt_rotation = tt_rotation   # radians, val-mode TTA input rot
        self.double_flip = double_flip   # val-mode 4-flip TTA

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index: int) -> Dict:
        info = self.infos[index]
        points = load_sweeps(info, self.nsweeps, self.rng)
        sample = {"token": info.get("token", str(index))}

        if self.mode == "train":
            names = np.asarray(info["gt_names"]).reshape(-1)
            boxes = np.asarray(info["gt_boxes"], np.float32).reshape(-1, 9)
            keep = ~np.isin(names, ["DontCare", "ignore", "UNKNOWN"])
            boxes, names = boxes[keep], names[keep]

            in_cls = np.isin(names, self.class_names)
            if self.db_sampler is not None:
                sampled = self.db_sampler.sample_all(boxes, names, self.rng)
                if sampled is not None:
                    names = np.concatenate([names, sampled["gt_names"]])
                    boxes = np.concatenate([boxes, sampled["gt_boxes"]])
                    in_cls = np.concatenate(
                        [in_cls, np.ones(len(sampled["gt_names"]), bool)])
                    points = np.concatenate([sampled["points"], points])

            boxes, names = boxes[in_cls], names[in_cls]
            classes = np.array(
                [self.class_names.index(n) + 1 for n in names], np.int32)

            points, boxes = dp.global_augment(points, boxes, self.rng)
            self.rng.shuffle(points)

            targets = dp.assign_label(
                boxes, classes, pc_range=self.pc_range,
                voxel_size=self.voxel_size,
                out_size_factor=self.out_size_factor)
            sample["targets"] = targets
            sample["gt_boxes"] = boxes
            sample["gt_classes"] = classes

        if self.mode != "train" and "gt_boxes" in info:
            # unaugmented GT passthrough for the internal devkit-free
            # evaluator (eval/nuscenes_eval.py) — the reference instead
            # reloads GT through the devkit at eval time (nuscenes.py:208)
            names = np.asarray(info["gt_names"]).reshape(-1)
            boxes = np.asarray(info["gt_boxes"], np.float32).reshape(-1, 9)
            keep = np.isin(names, self.class_names)
            sample["gt_boxes"] = boxes[keep]
            sample["gt_classes"] = np.array(
                [self.class_names.index(n) + 1 for n in names[keep]],
                np.int32)
            if "gt_attributes" in info:
                sample["gt_attributes"] = np.asarray(
                    info["gt_attributes"], object)[keep]
            if "gt_num_pts" in info:
                sample["gt_num_pts"] = np.asarray(info["gt_num_pts"])[keep]

        if self.mode != "train" and self.tt_rotation != 0.0:
            # TTA input rotation, reference sense (preprocess.py:153-157:
            # rotation_points_single_angle on the raw points)
            from ..ops.box_np import rotation_points_single_angle
            points = points.copy()
            points[:, :3] = rotation_points_single_angle(
                points[:, :3], self.tt_rotation, axis=2)

        voxels, coords_zyx, nppv = dp.points_to_voxel(
            points, self.voxel_size, self.pc_range,
            self.max_points_in_voxel, self.max_voxels)
        sample.update({"voxels": voxels, "coords_zyx": coords_zyx,
                       "num_points": nppv})

        if self.mode != "train" and self.double_flip:
            sample["flip_variants"] = make_double_flip_variants(
                points, self.voxel_size, self.pc_range,
                self.max_points_in_voxel, self.max_voxels)
        return sample


def make_double_flip_variants(points, voxel_size, pc_range,
                              max_points_in_voxel, max_voxels):
    """4-flip TTA input construction (pipelines/test_aug.py:8-32 DoubleFlip
    + Voxelization double_flip branch preprocess.py:219-267): returns the
    [y-flip, x-flip, xy-flip] voxelizations (the unflipped one is the
    sample itself). Order matches models/center_head.double_flip_fuse."""
    variants = []
    for fy, fx in ((True, False), (False, True), (True, True)):
        p = points.copy()
        if fy:
            p[:, 1] = -p[:, 1]
        if fx:
            p[:, 0] = -p[:, 0]
        voxels, coords_zyx, nppv = dp.points_to_voxel(
            p, voxel_size, pc_range, max_points_in_voxel, max_voxels)
        variants.append({"voxels": voxels, "coords_zyx": coords_zyx,
                         "num_points": nppv})
    return variants


class SyntheticNuScenes:
    """Synthetic stand-in when nuScenes data is absent (tests, bench)."""

    def __init__(self, length: int = 8, mode: str = "train", seed: int = 0,
                 n_points: int = 200000,
                 pc_range=(-54, -54, -5.0, 54, 54, 3.0),
                 voxel_size=(0.075, 0.075, 0.2), max_points_in_voxel=10,
                 max_voxels=120000, out_size_factor=8,
                 tt_rotation: float = 0.0, double_flip: bool = False):
        self.length = length
        self.mode = mode
        self.seed = seed
        self.n_points = n_points
        self.pc_range = pc_range
        self.voxel_size = voxel_size
        self.max_points_in_voxel = max_points_in_voxel
        self.max_voxels = max_voxels
        self.out_size_factor = out_size_factor
        self.tt_rotation = tt_rotation
        self.double_flip = double_flip

    def __len__(self):
        return self.length

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng(self.seed + index)
        n = self.n_points
        r = np.sqrt(rng.uniform(1, 54 ** 2, n))
        th = rng.uniform(0, 2 * np.pi, n)
        z = rng.normal(-1.0, 0.8, n)
        pts = np.stack([r * np.cos(th), r * np.sin(th), z,
                        rng.uniform(0, 255, n), rng.uniform(0, 0.45, n)],
                       1).astype(np.float32)
        n_obj = rng.integers(5, 40)
        boxes = np.zeros((n_obj, 9), np.float32)
        boxes[:, 0:2] = rng.uniform(-50, 50, (n_obj, 2))
        boxes[:, 2] = rng.uniform(-1.5, 0.5, n_obj)
        boxes[:, 3:6] = rng.uniform(0.5, 4.0, (n_obj, 3))
        boxes[:, 6:8] = rng.normal(0, 2, (n_obj, 2))
        boxes[:, 8] = rng.uniform(-np.pi, np.pi, n_obj)
        classes = rng.integers(1, 11, n_obj).astype(np.int32)

        sample = {"token": f"synthetic_{index}"}
        if self.mode == "train":
            sample["targets"] = dp.assign_label(
                boxes, classes, pc_range=self.pc_range,
                voxel_size=self.voxel_size,
                out_size_factor=self.out_size_factor)
            sample["gt_boxes"] = boxes
            sample["gt_classes"] = classes
        # synthetic TTA: points rotate, GT stays in the original frame
        # (mirrors the reference val semantics where GT is never rotated
        # and predictions are rotated back)
        if self.tt_rotation != 0.0:
            from ..ops.box_np import rotation_points_single_angle
            pts[:, :3] = rotation_points_single_angle(
                pts[:, :3], self.tt_rotation, axis=2)
        voxels, coords_zyx, nppv = dp.points_to_voxel(
            pts, self.voxel_size, self.pc_range, self.max_points_in_voxel,
            self.max_voxels)
        sample.update({"voxels": voxels, "coords_zyx": coords_zyx,
                       "num_points": nppv})
        if self.double_flip:
            sample["flip_variants"] = make_double_flip_variants(
                pts, self.voxel_size, self.pc_range,
                self.max_points_in_voxel, self.max_voxels)
        return sample
