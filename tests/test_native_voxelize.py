"""Native voxelizer: NumPy parity + thread-safety.

The C++ kernel (native/voxelize.cpp) is called through ctypes, which
releases the GIL — a loader worker thread and a serving thread can run it
concurrently (data/loader.py PrefetchLoader vs
inference.SingleFramePredictor). Scratch state is thread_local; the
concurrency test here stress-pins that (with shared globals it corrupts
voxel ids or segfaults).
"""

import concurrent.futures as cf
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from link_tpu import native
from link_tpu.data import det_pipeline as dp

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")

VS = (0.25, 0.25, 0.2)
PR = (-20.0, -20.0, -3.0, 20.0, 20.0, 3.0)


def _cloud(seed, n=60000):
    rng = np.random.default_rng(seed)
    pts = np.concatenate(
        [rng.uniform(-21, 21, (n, 3)), rng.uniform(0, 1, (n, 2))],
        axis=1).astype(np.float32)
    return pts


def _numpy_path(pts, max_points, max_voxels):
    avail = native.available
    try:
        native.available = lambda: False
        return dp.points_to_voxel(pts, VS, PR, max_points=max_points,
                                  max_voxels=max_voxels)
    finally:
        native.available = avail


def test_native_matches_numpy_path():
    pts = _cloud(0)
    v_n, c_n, p_n = dp.points_to_voxel(pts, VS, PR, max_points=6,
                                       max_voxels=8192)
    v_p, c_p, p_p = _numpy_path(pts, 6, 8192)
    np.testing.assert_array_equal(c_n, c_p)
    np.testing.assert_array_equal(p_n, p_p)
    np.testing.assert_allclose(v_n, v_p)


def test_concurrent_calls_match_serial():
    clouds = [_cloud(s, 40000) for s in range(8)]
    serial = [dp.points_to_voxel(p, VS, PR, max_points=5, max_voxels=4096)
              for p in clouds]
    for _ in range(3):                       # repeat to give races a chance
        with cf.ThreadPoolExecutor(max_workers=4) as ex:
            conc = list(ex.map(
                lambda p: dp.points_to_voxel(p, VS, PR, max_points=5,
                                             max_voxels=4096), clouds))
        for (vs_, cs, ps), (vc, cc, pc) in zip(serial, conc):
            np.testing.assert_array_equal(cs, cc)
            np.testing.assert_array_equal(ps, pc)
            np.testing.assert_allclose(vs_, vc)
