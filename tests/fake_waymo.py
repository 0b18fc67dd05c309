"""Fabricated Waymo toolkit implementing the slice of
tensorflow + waymo-open-dataset that tools/create_data_waymo.py's
`decode` step consumes (VERDICT r3 #9: the TFRecord converter had never
executed).

Unlike the toolkit fakes, the TFRecord CONTAINER is the real wire
format — [uint64 length | masked crc32c(length) | payload |
masked crc32c(payload)] with the Castagnoli polynomial and TFRecord's
crc masking — so the fixture exercises genuine record framing, not a
self-consistent stand-in. Only the Frame proto (replaced by a pickled
dict) and the range-image -> point-cloud math (points carried verbatim
in the payload) are faked; every line of the converter itself runs.

Reference formats: waymo_decoder.py (frame/annos schema),
tensorflow/core/lib/io/record_writer (TFRecord framing).
"""

from __future__ import annotations

import glob
import os
import pickle
import struct
import sys
import types

import numpy as np

# ---------------------------------------------------------------- crc32c
_POLY = 0x82F63B78
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (_POLY if _c & 1 else 0)
    _TABLE.append(_c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ _TABLE[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    """TFRecord's rotated+offset crc mask."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def write_tfrecord(path: str, payloads) -> None:
    with open(path, "wb") as f:
        for p in payloads:
            ln = struct.pack("<Q", len(p))
            f.write(ln)
            f.write(struct.pack("<I", masked_crc(ln)))
            f.write(p)
            f.write(struct.pack("<I", masked_crc(p)))


def read_tfrecord(path: str):
    out = []
    with open(path, "rb") as f:
        while True:
            ln = f.read(8)
            if not ln:
                break
            (n,) = struct.unpack("<Q", ln)
            (lc,) = struct.unpack("<I", f.read(4))
            if lc != masked_crc(ln):
                raise IOError(f"{path}: length crc mismatch")
            p = f.read(n)
            (pc,) = struct.unpack("<I", f.read(4))
            if pc != masked_crc(p):
                raise IOError(f"{path}: payload crc mismatch")
            out.append(p)
    return out


# ------------------------------------------------------- fake Frame proto
def _ns(**kw):
    return types.SimpleNamespace(**kw)


class Frame:
    """Stands in for dataset_pb2.Frame: ParseFromString unpickles the
    payload dict and exposes the attribute paths decode_frame /
    decode_annos read."""

    def ParseFromString(self, data: bytes) -> None:
        d = pickle.loads(bytes(data))
        self.context = _ns(name=d["name"])
        self.timestamp_micros = int(d["timestamp_micros"])
        self.pose = _ns(transform=list(np.asarray(d["pose"], float).ravel()))
        self.laser_labels = []
        for lb in d["labels"]:
            box = lb["box"]
            self.laser_labels.append(_ns(
                id=lb["id"], type=int(lb["type"]),
                box=_ns(center_x=box[0], center_y=box[1], center_z=box[2],
                        length=box[3], width=box[4], height=box[5],
                        heading=box[6]),
                metadata=_ns(speed_x=lb["speed"][0], speed_y=lb["speed"][1]),
                num_lidar_points_in_box=int(lb["num_pts"])))
        # polar-feature point rows (range, intensity, elongation, x, y, z)
        self._points0 = [np.asarray(p, np.float32) for p in d["points0"]]
        self._points1 = [np.asarray(p, np.float32) for p in d["points1"]]


class _FakeFrameUtils(types.ModuleType):
    @staticmethod
    def parse_range_image_and_camera_projection(frame):
        return ("ri", "cp", None, "rip")

    @staticmethod
    def convert_range_image_to_point_cloud(frame, ri, cp, rip, ri_index=0,
                                           keep_polar_features=False):
        assert keep_polar_features, "converter relies on polar rows"
        assert (ri, cp, rip) == ("ri", "cp", "rip")
        pts = frame._points1 if ri_index == 1 else frame._points0
        return pts, [np.zeros((len(p), 6), np.int32) for p in pts]


class _Records:
    def __init__(self, path, compression_type=""):
        assert compression_type == ""
        self._payloads = read_tfrecord(path)

    def __iter__(self):
        for p in self._payloads:
            yield _ns(numpy=lambda p=p: p)


def install(monkeypatch) -> None:
    """Register the fake tensorflow / waymo_open_dataset modules."""
    tf = types.ModuleType("tensorflow.compat.v2")
    tf.enable_v2_behavior = lambda: None
    tf.data = _ns(TFRecordDataset=_Records)
    tf_root = types.ModuleType("tensorflow")
    tf_compat = types.ModuleType("tensorflow.compat")
    tf_compat.v2 = tf
    tf_root.compat = tf_compat
    wod = types.ModuleType("waymo_open_dataset")
    pb2 = types.ModuleType("waymo_open_dataset.dataset_pb2")
    pb2.Frame = Frame
    wod.dataset_pb2 = pb2
    utils = types.ModuleType("waymo_open_dataset.utils")
    fu = _FakeFrameUtils("waymo_open_dataset.utils.frame_utils")
    utils.frame_utils = fu
    wod.utils = utils
    for name, mod in [("tensorflow", tf_root),
                      ("tensorflow.compat", tf_compat),
                      ("tensorflow.compat.v2", tf),
                      ("waymo_open_dataset", wod),
                      ("waymo_open_dataset.dataset_pb2", pb2),
                      ("waymo_open_dataset.utils", utils),
                      ("waymo_open_dataset.utils.frame_utils", fu)]:
        monkeypatch.setitem(sys.modules, name, mod)


# ------------------------------------------------------- fixture world
def _pose(yaw: float, tx: float, ty: float) -> np.ndarray:
    m = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    m[:2, :2] = [[c, -s], [s, c]]
    m[:3, 3] = [tx, ty, 0.0]
    return m


def build_world(records_dir: str, n_seq: int = 2, n_frames: int = 3):
    """Write n_seq .tfrecord files of n_frames each. The ego translates
    +2 m in x and yaws +0.1 rad per frame; each frame carries two boxes
    (VEHICLE with 30 in-box points + velocity, PEDESTRIAN with
    num_pts=0 so the info builder must drop it) plus background points.
    Returns the per-(seq, frame) poses for geometry assertions."""
    os.makedirs(records_dir, exist_ok=True)
    rng = np.random.default_rng(11)
    poses = {}
    for seq in range(n_seq):
        payloads = []
        for fid in range(n_frames):
            pose = _pose(0.1 * fid, 2.0 * fid + 10.0 * seq, 0.5 * fid)
            poses[(seq, fid)] = pose
            veh_box = np.array([6.0 + fid, 1.0, 0.5, 4.2, 1.9, 1.6, 0.25],
                               np.float32)
            in_box = veh_box[:3] + rng.uniform(-0.5, 0.5, (30, 3))
            bg = rng.uniform(-40, 40, (400, 3))
            xyz = np.concatenate([in_box, bg]).astype(np.float32)
            polar = np.concatenate(
                [np.linalg.norm(xyz, axis=1, keepdims=True),
                 rng.uniform(0, 1, (len(xyz), 2)).astype(np.float32),
                 xyz], axis=1).astype(np.float32)
            payloads.append(pickle.dumps({
                "name": f"ctx_{seq}",
                "timestamp_micros": 1_000_000 * (fid + 1) + 137 * seq,
                "pose": pose,
                "labels": [
                    {"id": f"v{seq}", "type": 1,
                     "box": np.concatenate([veh_box[:6], veh_box[6:]]),
                     "speed": (3.0, 1.0), "num_pts": 30},
                    {"id": f"p{seq}", "type": 2,
                     "box": np.array([-5, -5, 0.2, 0.8, 0.8, 1.7, 1.0]),
                     "speed": (0.0, 0.0), "num_pts": 0},
                ],
                # split across two return lists to exercise the concat
                "points0": [polar[:200], polar[200:]],
                "points1": [polar[:0]],
            }))
        write_tfrecord(os.path.join(records_dir, f"seg{seq}.tfrecord"),
                       payloads)
    return poses
