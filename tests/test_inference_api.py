"""SingleFramePredictor: the online-inference API must voxelize, run the
detector, and emit NMS'd per-class-thresholded detections for raw point
clouds (tiny shapes; the full-size path is the same code)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_predictor_end_to_end():
    from link_tpu.inference import SingleFramePredictor
    pred = SingleFramePredictor(
        capacity=4096, grid_shape=(48, 48, 40), max_voxels=4000,
        class_score_floor={},
        test_cfg=dict(pc_range=[-12, -12], voxel_size=[0.5, 0.5],
                      post_center_limit_range=[-15, -15, -10, 15, 15, 10],
                      nms_pre_max_size=200, nms_post_max_size=40,
                      max_per_img=100, score_threshold=0.05))
    rng = np.random.default_rng(0)
    n = 5000
    pts = np.stack([rng.uniform(-11, 11, n), rng.uniform(-11, 11, n),
                    rng.uniform(-1.9, 1.9, n), rng.uniform(0, 255, n),
                    np.zeros(n)], 1).astype(np.float32)
    out = pred.predict(pts)
    assert set(out) == {"box3d_lidar", "scores", "label_preds"}
    assert out["box3d_lidar"].shape[1] == 9
    assert len(out["scores"]) == len(out["box3d_lidar"])
    assert np.isfinite(out["box3d_lidar"]).all()
    # second frame reuses the compiled forward (different cloud)
    out2 = pred.predict(pts + 0.5)
    assert len(out2["scores"]) >= 0


def test_predictor_narrow_points_padded():
    """predict() pads (N, 3) clouds to the 5-feature layout."""
    from link_tpu.inference import SingleFramePredictor
    pred = SingleFramePredictor(
        capacity=4096, grid_shape=(48, 48, 40), max_voxels=4000,
        class_score_floor={},
        test_cfg=dict(pc_range=[-12, -12], voxel_size=[0.5, 0.5],
                      post_center_limit_range=[-15, -15, -10, 15, 15, 10],
                      nms_pre_max_size=200, nms_post_max_size=40,
                      max_per_img=100, score_threshold=0.05))
    rng = np.random.default_rng(1)
    pts = rng.uniform(-11, 11, (2000, 3)).astype(np.float32)
    out = pred.predict(pts)
    assert out["box3d_lidar"].shape[1] == 9
