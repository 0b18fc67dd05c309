"""Native (C++) host-side kernels, built on demand with g++ via ctypes.

Build: `make -C link_tpu/native` or automatic on first import (falls back
to the NumPy implementations in ops/box_np.py + ops/nms.py when no
compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    so = os.path.join(here, "libnms.so")
    srcs = [os.path.join(here, "nms.cpp"),
            os.path.join(here, "voxelize.cpp")]
    try:
        if (not os.path.exists(so)
                or any(os.path.getmtime(so) < os.path.getmtime(s)
                       for s in srcs)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *srcs,
                 "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.rotate_nms.restype = ctypes.c_int64
        lib.rotate_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.bev_iou_matrix.restype = None
        lib.bev_iou_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.iou3d_matrix.restype = None
        lib.iou3d_matrix.argtypes = lib.bev_iou_matrix.argtypes
        lib.voxelize.restype = ctypes.c_int64
        lib.voxelize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rotate_nms_sorted(boxes: np.ndarray, thresh: float,
                      post_max: int = 0) -> np.ndarray:
    """boxes (N, 7) float32, already sorted by score desc. Returns kept
    indices."""
    lib = _build_and_load()
    assert lib is not None
    boxes = np.ascontiguousarray(boxes, np.float32)
    keep = np.empty(len(boxes), np.int64)
    n = lib.rotate_nms(_fptr(boxes), len(boxes), ctypes.c_float(thresh),
                       post_max or 0,
                       keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:n]


def voxelize_points(points: np.ndarray, voxel_size, pc_range, grid,
                    max_points: int, max_voxels: int):
    """Hash-grid hard voxelization (voxelize.cpp). Returns (voxels
    (V, max_points, F), coords (V, 3) zyx, nppv (V,)) in pack-key (z, y,
    x) row order — reference truncation semantics (first max_voxels
    voxels / first max_points points by appearance)."""
    lib = _build_and_load()
    assert lib is not None
    pts = np.ascontiguousarray(points, np.float32)
    n, f = pts.shape
    vs = np.ascontiguousarray(voxel_size, np.float32)
    pr = np.ascontiguousarray(pc_range, np.float32)
    gr = np.ascontiguousarray(grid, np.int32)
    voxels = np.zeros((max_voxels, max_points, f), np.float32)
    coords = np.empty((max_voxels, 3), np.int32)
    nppv = np.zeros((max_voxels,), np.int32)
    i32 = ctypes.POINTER(ctypes.c_int32)
    nv = lib.voxelize(_fptr(pts), n, f, _fptr(vs), _fptr(pr),
                      gr.ctypes.data_as(i32), max_points, max_voxels,
                      _fptr(voxels), coords.ctypes.data_as(i32),
                      nppv.ctypes.data_as(i32), 0, 0)
    return voxels[:nv], coords[:nv], nppv[:nv]


def voxelize_collated(points: np.ndarray, voxel_size, pc_range, grid,
                      max_points: int, max_voxels: int, capacity: int,
                      num_feats: int = 5, batch_idx: int = 0):
    """Single-frame voxelize + collate in one native pass: emits the
    device-ready batch dict (voxels (cap, mp, F) zero-padded, coords
    (cap, 4) (x, y, z, b) with INVALID pad, num_points, nnz) with no
    intermediate (V, ...) arrays or host-side copies — the serving path
    (inference.SingleFramePredictor)."""
    lib = _build_and_load()
    assert lib is not None
    assert capacity >= max_voxels
    pts = np.ascontiguousarray(points, np.float32)
    n, f = pts.shape
    assert f == num_feats
    vs = np.ascontiguousarray(voxel_size, np.float32)
    pr = np.ascontiguousarray(pc_range, np.float32)
    gr = np.ascontiguousarray(grid, np.int32)
    voxels = np.zeros((capacity, max_points, f), np.float32)
    coords = np.full((capacity, 4), -(2 ** 20), np.int32)
    nppv = np.zeros((capacity,), np.int32)
    i32 = ctypes.POINTER(ctypes.c_int32)
    nv = lib.voxelize(_fptr(pts), n, f, _fptr(vs), _fptr(pr),
                      gr.ctypes.data_as(i32), max_points, max_voxels,
                      _fptr(voxels), coords.ctypes.data_as(i32),
                      nppv.ctypes.data_as(i32), 1, batch_idx)
    return {"voxels": voxels, "coords": coords, "num_points": nppv,
            "nnz": np.int32(nv)}


def bev_iou(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    lib = _build_and_load()
    assert lib is not None
    a = np.ascontiguousarray(boxes_a, np.float32)
    b = np.ascontiguousarray(boxes_b, np.float32)
    out = np.empty((len(a), len(b)), np.float32)
    lib.bev_iou_matrix(_fptr(a), len(a), _fptr(b), len(b), _fptr(out))
    return out


def iou3d(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    lib = _build_and_load()
    assert lib is not None
    a = np.ascontiguousarray(boxes_a, np.float32)
    b = np.ascontiguousarray(boxes_b, np.float32)
    out = np.empty((len(a), len(b)), np.float32)
    lib.iou3d_matrix(_fptr(a), len(a), _fptr(b), len(b), _fptr(out))
    return out
