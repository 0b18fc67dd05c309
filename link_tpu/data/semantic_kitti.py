"""SemanticKITTI dataset: host-side NumPy pipeline.

Reference: segmentation/core/datasets/semantic_kitti.py:99-344
(SemanticKITTIInternal). Semantics preserved:
  * sequence splits train 00-10 \\ 08 / val 08 / test 11-21;
  * label remap LUT (raw & 0xFFFF -> 20 classes, moving classes folded);
  * train aug: random z-rotation, scale U[0.95, 1.05], 4-way flip;
  * voxelization: round(xyz / voxel_size), subtract per-scan min,
    `sparse_quantize` dedup keeping the first point per voxel;
  * train cap `num_points` (80k) voxels via random choice;
  * per-scan outputs: voxel feats/coords/labels + full-point labels and
    inverse map for point-level eval.

Output is plain NumPy dicts; `collate` pads to fixed capacity for XLA.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

# semantic-kitti.yaml learning_map (reference semantic_kitti.py:16-93).
LEARNING_MAP = {
    0: 0, 1: 0, 10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5, 30: 6,
    31: 7, 32: 8, 40: 9, 44: 10, 48: 11, 49: 12, 50: 13, 51: 14, 52: 0,
    60: 9, 70: 15, 71: 16, 72: 17, 80: 18, 81: 19, 99: 0, 252: 1, 253: 7,
    254: 6, 255: 8, 256: 5, 257: 5, 258: 4, 259: 5,
}

CLASS_NAMES = [
    "unlabeled", "car", "bicycle", "motorcycle", "truck", "other-vehicle",
    "person", "bicyclist", "motorcyclist", "road", "parking", "sidewalk",
    "other-ground", "building", "fence", "vegetation", "trunk", "terrain",
    "pole", "traffic-sign",
]

NUM_CLASSES = 20
IGNORE_LABEL = 0

TRAIN_SEQS = ["00", "01", "02", "03", "04", "05", "06", "07", "09", "10"]
VAL_SEQS = ["08"]
TEST_SEQS = ["11", "12", "13", "14", "15", "16", "17", "18", "19", "20", "21"]

# Static coordinate-domain bound in METERS for the (min-shifted, so
# nonnegative) quantized coords process_scan emits. KITTI's HDL-64E spans
# <= 2 * 80 m * 1.05 (augment scale) = 168 m horizontally; the z spread
# (terrain + sensor height) stays far below 22 m. The bound backs the
# dense RankGrid join index (sparse/coords.py): collate_scans drops the
# (never seen in practice) voxels beyond it — the same silent-domain
# contract pack_coords already applies at its 2^14/2^12 packing bounds.
GRID_EXTENT_M = (179.2, 179.2, 22.4)


def grid_extent(voxel_size: float = 0.05, batch_size: int = 1):
    """(nx, ny, nz, nb) static domain bound for SparseTensor.grid_extent
    at a given quantization, e.g. (3584, 3584, 448, 1) at 0.05 m."""
    return tuple(int(np.ceil(m / voxel_size)) for m in GRID_EXTENT_M) + (
        int(batch_size),)


def build_label_map() -> np.ndarray:
    lut = np.full(260, 255, np.int64)
    for k, v in LEARNING_MAP.items():
        lut[k] = v
    return lut


def ravel_hash(x: np.ndarray) -> np.ndarray:
    """torchsparse utils/quantize.py:10-21."""
    assert x.ndim == 2
    x = x - np.min(x, axis=0)
    x = x.astype(np.uint64, copy=False)
    xmax = np.max(x, axis=0).astype(np.uint64) + 1
    h = np.zeros(x.shape[0], dtype=np.uint64)
    for k in range(x.shape[1] - 1):
        h += x[:, k]
        h *= xmax[k + 1]
    h += x[:, -1]
    return h


def sparse_quantize(coords: np.ndarray):
    """Dedup int voxel coords; returns (coords, index, inverse)
    (quantize.py:24-47 at voxel_size 1 on pre-divided int coords)."""
    _, indices, inverse = np.unique(ravel_hash(coords), return_index=True,
                                    return_inverse=True)
    return coords[indices], indices, inverse


def augment(points: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random z-rot + global scale + 4-way flip (semantic_kitti.py:199-218)."""
    theta = rng.uniform(0, 2 * np.pi)
    scale = rng.uniform(0.95, 1.05)
    rot = np.array([[np.cos(theta), np.sin(theta), 0],
                    [-np.sin(theta), np.cos(theta), 0],
                    [0, 0, 1]])
    out = points.copy()
    out[:, :3] = out[:, :3] @ rot * scale
    flip = rng.choice(4)
    if flip == 1:
        out[:, 0] = -out[:, 0]
    elif flip == 2:
        out[:, 1] = -out[:, 1]
    elif flip == 3:
        out[:, :2] = -out[:, :2]
    return out


def process_scan(points: np.ndarray, labels: np.ndarray, voxel_size: float,
                 num_points: int, train: bool,
                 rng: Optional[np.random.Generator] = None) -> Dict:
    """points (N, 4) float32 [x y z intensity]; labels (N,) int remapped."""
    if train:
        points = augment(points, rng or np.random.default_rng())
    pc = np.round(points[:, :3] / voxel_size).astype(np.int32)
    pc -= pc.min(0, keepdims=True)

    coords, inds, inverse = sparse_quantize(pc)
    subsampled = train and len(inds) > num_points
    if subsampled:
        inds = (rng or np.random.default_rng()).choice(
            inds, num_points, replace=False)
        coords = pc[inds]

    # Emit voxels in pack-key order (batch, z, y, x) — the SparseTensor
    # invariant that unlocks bracketed joins / windowed gathers on device
    # (sparse/coords.py). Pure reordering: voxel selection is unchanged.
    perm = np.lexsort((coords[:, 0], coords[:, 1], coords[:, 2]))
    coords = coords[perm]
    inds = inds[perm]
    if not subsampled:
        # remap point -> voxel-row indices to the new row order (the
        # subsampled train path leaves inverse stale, like the reference)
        rank = np.empty(len(perm), np.int32)
        rank[perm] = np.arange(len(perm), dtype=np.int32)
        inverse = rank[inverse]
    return {
        "feats": points[inds].astype(np.float32),
        "coords": coords.astype(np.int32),
        "labels": labels[inds].astype(np.int32),
        "point_labels": labels.astype(np.int32),
        "inverse_map": inverse.astype(np.int32),
    }


class SemanticKITTI:
    def __init__(self, root: str, split: str = "train",
                 voxel_size: float = 0.05, num_points: int = 80000,
                 sample_stride: int = 1):
        self.root = root
        self.split = split
        self.voxel_size = voxel_size
        self.num_points = num_points
        seqs = {"train": TRAIN_SEQS, "val": VAL_SEQS, "test": TEST_SEQS}[split]
        self.files: List[str] = []
        for seq in seqs:
            d = os.path.join(root, seq, "velodyne")
            if not os.path.isdir(d):
                continue
            self.files.extend(os.path.join(d, f) for f in sorted(os.listdir(d)))
        if sample_stride > 1:
            self.files = self.files[::sample_stride]
        self.label_map = build_label_map()

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int, rng=None) -> Dict:
        points = np.fromfile(self.files[index], np.float32).reshape(-1, 4)
        if self.split != "test":
            lf = self.files[index].replace("velodyne", "labels").replace(
                ".bin", ".label")
            if os.path.exists(lf):
                raw = np.fromfile(lf, np.int32)
                labels = self.label_map[raw & 0xFFFF]
            else:
                labels = np.zeros(len(points), np.int64)
        else:
            labels = np.zeros(len(points), np.int64)
        out = process_scan(points, labels, self.voxel_size, self.num_points,
                           self.split == "train", rng)
        out["file_name"] = self.files[index]
        return out


def synthetic_scan(rng: np.random.Generator, n_points: int = 120000,
                   voxel_size: float = 0.05) -> Dict:
    """Synthetic LiDAR scan with real beam geometry (64 elevation rings x
    azimuth grid, HDL-64-like) so that voxel occupancy has the same
    multi-scale sparsity profile as SemanticKITTI — essential for honest
    capacity schedules and benchmarks. Downward beams hit the ground plane
    (denser rings near the sensor), some rays hit vertical 'walls'/objects
    at sampled ranges."""
    n_az = max(64, n_points // 64)
    az = np.linspace(0, 2 * np.pi, n_az, endpoint=False)
    el = np.deg2rad(np.linspace(-24.8, 2.0, 64))
    az_g, el_g = np.meshgrid(az, el)
    az_g = (az_g + rng.normal(0, 1e-3, az_g.shape)).ravel()
    el_g = el_g.ravel()

    sensor_z = 1.73
    # default: ground intersection for downward beams, far clip for upward
    with np.errstate(divide="ignore"):
        r_ground = np.where(el_g < -1e-3, sensor_z / np.tan(-el_g), 120.0)
    # random obstacles: 25% of rays hit a vertical surface earlier
    hit_obj = rng.random(el_g.shape) < 0.25
    r_obj = np.exp(rng.uniform(np.log(2.5), np.log(60.0), el_g.shape))
    r = np.where(hit_obj, np.minimum(r_obj, r_ground), r_ground)
    r = np.clip(r + rng.normal(0, 0.02, r.shape), 2.0, 80.0)

    x = r * np.cos(el_g) * np.cos(az_g)
    y = r * np.cos(el_g) * np.sin(az_g)
    z = sensor_z + r * np.sin(el_g) - 1.73
    keep = rng.random(x.shape) < min(1.0, n_points / x.size)
    xyz = np.stack([x, y, z], 1)[keep].astype(np.float32)
    intensity = rng.uniform(0, 1, (len(xyz), 1)).astype(np.float32)
    points = np.concatenate([xyz, intensity], 1)
    labels = np.where(hit_obj[keep], rng.integers(1, 20, len(xyz)),
                      9).astype(np.int64)
    return {"points": points, "labels": labels}


class SyntheticSemanticKITTI:
    """Drop-in synthetic stand-in for SemanticKITTI."""

    def __init__(self, length: int = 64, voxel_size: float = 0.05,
                 num_points: int = 80000, split: str = "train", seed: int = 0,
                 n_raw_points: int = 120000):
        self.length = length
        self.voxel_size = voxel_size
        self.num_points = num_points
        self.split = split
        self.seed = seed
        self.n_raw = n_raw_points

    def __len__(self):
        return self.length

    def __getitem__(self, index: int, rng=None) -> Dict:
        gen = np.random.default_rng(self.seed + index)
        scan = synthetic_scan(gen, self.n_raw, self.voxel_size)
        out = process_scan(scan["points"], scan["labels"], self.voxel_size,
                           self.num_points, self.split == "train",
                           rng or gen)
        out["file_name"] = f"synthetic/{index:06d}.bin"
        return out
