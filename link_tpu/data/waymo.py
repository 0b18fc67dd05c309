"""Waymo Open Dataset detection support (secondary in the reference —
nuScenes is the LinK result; SURVEY §2.4).

Reference: detection/det3d/datasets/waymo/waymo.py + waymo_common.py. The
reference consumes TFRecord-derived pickles (one per frame: dict with
'lidars' point clouds and 'objects' labels), produced by its converter
which requires the `waymo-open-dataset` toolkit (not available here; the
converter entry is gated the same way the nuScenes devkit is).

Frame pickle schema (waymo_decoder.py):
  {'lidars': {'points_xyz': (N,3), 'points_feature': (N,2)},
   'objects': [{'box': 9-dof [x y z l w h vx vy heading], 'label': int,
                'name': str}], ...}

Info pickle: list of {'path': frame pkl, 'token', 'sweeps': [...]}.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from . import det_pipeline as dp

WAYMO_CLASSES = ("VEHICLE", "PEDESTRIAN", "CYCLIST")
WAYMO_TASKS = (("VEHICLE",), ("PEDESTRIAN",), ("CYCLIST",))


def read_frame(path: str) -> Dict:
    """Lidar frame pickle -> (N, 5) points [x y z intensity elongation],
    intensity tanh-normalized (reference loading.py:71-80
    read_single_waymo). GT lives in the info pkls (det3d convention,
    converted at info time by tools/create_data_waymo.py, mirroring
    waymo_common.py:260-276)."""
    with open(path, "rb") as f:
        frame = pickle.load(f)
    feat = frame["lidars"]["points_feature"].astype(np.float32).copy()
    feat[:, 0] = np.tanh(feat[:, 0])   # intensity normalization
    pts = np.concatenate(
        [frame["lidars"]["points_xyz"].astype(np.float32), feat], axis=1)
    return {"points": pts}


def load_waymo_sweeps(info: Dict, root_path: str, nsweeps: int) -> Dict:
    """Multi-sweep accumulation with a time-lag channel (reference
    pipelines/loading.py:71-101 read_single_waymo[_sweep]): sweeps are
    re-projected into the keyframe vehicle frame via the stored
    transform_matrix; points become (N, 6) = (x y z intensity elongation
    time)."""
    frame = read_frame(os.path.join(root_path, info["path"]))
    points = frame["points"]
    pts_list = [points]
    times = [np.zeros((len(points), 1), np.float32)]
    for sweep in info.get("sweeps", [])[:max(0, nsweeps - 1)]:
        with open(os.path.join(root_path, sweep["path"]), "rb") as f:
            obj = pickle.load(f)
        feat = obj["lidars"]["points_feature"].astype(np.float32).copy()
        feat[:, 0] = np.tanh(feat[:, 0])
        ps = np.concatenate(
            [obj["lidars"]["points_xyz"].astype(np.float32), feat], axis=1)
        tm = sweep.get("transform_matrix")
        if tm is not None:
            xyz1 = np.concatenate(
                [ps[:, :3], np.ones((len(ps), 1), np.float32)], axis=1)
            ps[:, :3] = (xyz1 @ np.asarray(tm, np.float32).T)[:, :3]
        pts_list.append(ps)
        times.append(np.full((len(ps), 1), sweep["time_lag"], np.float32))
    if nsweeps > 1:
        frame["points"] = np.concatenate(
            [np.concatenate(pts_list), np.concatenate(times)], axis=1)
    return frame


class WaymoDataset:
    def __init__(self, info_path: str, root_path: str = "",
                 mode: str = "train", nsweeps: int = 1,
                 class_names=WAYMO_CLASSES,
                 pc_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
                 voxel_size=(0.1, 0.1, 0.15), max_points_in_voxel=5,
                 max_voxels=(150000, 200000), out_size_factor=8,
                 db_sampler=None, seed: int = 0):
        with open(info_path, "rb") as f:
            self.infos = pickle.load(f)
        self.root_path = root_path
        self.nsweeps = nsweeps
        self.mode = mode
        self.class_names = list(class_names)
        self.pc_range = pc_range
        self.voxel_size = voxel_size
        self.max_points_in_voxel = max_points_in_voxel
        self.max_voxels = max_voxels[0] if mode == "train" else max_voxels[1]
        self.out_size_factor = out_size_factor
        self.db_sampler = db_sampler
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index: int) -> Dict:
        info = self.infos[index]
        frame = load_waymo_sweeps(info, self.root_path, self.nsweeps)
        points = frame["points"]
        sample = {"token": info.get("token", str(index))}

        gt_boxes = np.asarray(info.get("gt_boxes",
                                       np.zeros((0, 9))), np.float32)
        gt_names = np.asarray(info.get("gt_names", [])).reshape(-1)

        if self.mode != "train":
            # unaugmented GT passthrough for eval/waymo_eval.py
            keep = np.isin(gt_names, self.class_names)
            sample["gt_boxes"] = gt_boxes[keep]
            sample["gt_classes"] = np.array(
                [self.class_names.index(n) + 1
                 for n in gt_names[keep]], np.int32)
            if "gt_num_pts" in info:
                sample["gt_num_pts"] = np.asarray(
                    info["gt_num_pts"])[keep]

        if self.mode == "train":
            boxes, names = gt_boxes, gt_names
            keep = np.isin(names, self.class_names)
            boxes, names = boxes[keep], names[keep]
            if self.db_sampler is not None:
                sampled = self.db_sampler.sample_all(boxes, names, self.rng)
                if sampled is not None:
                    names = np.concatenate([names, sampled["gt_names"]])
                    boxes = np.concatenate([boxes, sampled["gt_boxes"]])
                    points = np.concatenate([sampled["points"], points])
            classes = np.array(
                [self.class_names.index(n) + 1 for n in names], np.int32)
            points, boxes = dp.global_augment(points, boxes, self.rng)
            self.rng.shuffle(points)
            sample["targets"] = dp.assign_label(
                boxes, classes, tasks=WAYMO_TASKS,
                class_names=self.class_names, pc_range=self.pc_range,
                voxel_size=self.voxel_size,
                out_size_factor=self.out_size_factor)
            sample["gt_boxes"] = boxes
            sample["gt_classes"] = classes

        voxels, coords_zyx, nppv = dp.points_to_voxel(
            points, self.voxel_size, self.pc_range,
            self.max_points_in_voxel, self.max_voxels)
        sample.update({"voxels": voxels, "coords_zyx": coords_zyx,
                       "num_points": nppv})
        return sample
