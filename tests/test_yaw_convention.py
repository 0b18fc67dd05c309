"""Yaw-convention consistency tests.

The repo stores detection yaw in the reference det3d convention
(yaw_det3d = -yaw_devkit - pi/2, nusc_common.py:505) end-to-end. These
tests pin (a) numeric parity of the rotation helpers with the reference
formulas (box_np_ops.py:182-220), (b) geometric self-consistency
(corners <-> point containment <-> augmentation), and (c) the devkit
back-conversion at the submission boundary (nusc_common.py:160-178).
"""

import numpy as np
import pytest

from link_tpu.ops import box_np
from link_tpu.data import det_pipeline as dp


def ref_rotation_points_single_angle(points, angle, axis=2):
    """Verbatim reference math (box_np_ops.py:182-204)."""
    rot_sin, rot_cos = np.sin(angle), np.cos(angle)
    if axis == 1:
        rot_mat_T = np.array(
            [[rot_cos, 0, -rot_sin], [0, 1, 0], [rot_sin, 0, rot_cos]])
    elif axis == 2 or axis == -1:
        rot_mat_T = np.array(
            [[rot_cos, -rot_sin, 0], [rot_sin, rot_cos, 0], [0, 0, 1]])
    elif axis == 0:
        rot_mat_T = np.array(
            [[1, 0, 0], [0, rot_cos, -rot_sin], [0, rot_sin, rot_cos]])
    return points @ rot_mat_T


def ref_corners_2d(centers, dims, angles):
    """Reference corners_nd + rotation_2d (box_np_ops.py:92-140, 207-220)."""
    corners_norm = (np.array([[0, 0], [0, 1], [1, 1], [1, 0]], np.float64)
                    - 0.5)
    corners = dims[:, None, :] * corners_norm[None]
    rot_sin, rot_cos = np.sin(angles), np.cos(angles)
    rot_mat_T = np.stack([[rot_cos, -rot_sin], [rot_sin, rot_cos]])
    rotated = np.einsum("aij,jka->aik", corners, rot_mat_T)
    return rotated + centers[:, None, :]


class TestRotationParity:
    @pytest.mark.parametrize("axis", [0, 1, 2])
    def test_matches_reference_formula(self, axis):
        rng = np.random.default_rng(0)
        pts = rng.normal(0, 10, (50, 3))
        for ang in (-1.2, 0.3, 2.9):
            np.testing.assert_allclose(
                box_np.rotation_points_single_angle(pts, ang, axis=axis),
                ref_rotation_points_single_angle(pts, ang, axis=axis),
                atol=1e-12)

    def test_corners_match_reference_rectangles(self):
        rng = np.random.default_rng(1)
        n = 20
        centers = rng.uniform(-10, 10, (n, 2))
        dims = rng.uniform(0.5, 4, (n, 2))
        angles = rng.uniform(-np.pi, np.pi, n)
        ours = box_np.center_to_corner_box2d(centers, dims, angles)
        ref = ref_corners_2d(centers, dims, angles)
        # corner ORDER differs (our template is CCW, reference's is CW);
        # the rectangles must be identical as point sets
        for i in range(n):
            a = ours[i][np.lexsort((ours[i][:, 1], ours[i][:, 0]))]
            b = ref[i][np.lexsort((ref[i][:, 1], ref[i][:, 0]))]
            np.testing.assert_allclose(a, b, atol=1e-9)


class TestGeometricConsistency:
    def _random_boxes(self, rng, n):
        boxes = np.zeros((n, 9))
        boxes[:, :2] = rng.uniform(-20, 20, (n, 2))
        boxes[:, 2] = rng.uniform(-1, 1, n)
        boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
        boxes[:, 6:8] = rng.normal(0, 3, (n, 2))
        boxes[:, 8] = rng.uniform(-np.pi, np.pi, n)
        return boxes

    def _points_inside(self, rng, boxes, k=32):
        """Sample points uniformly inside each rotated box, built FROM the
        corner parameterization (so containment tests corners vs crop)."""
        pts = []
        for b in boxes:
            corners = box_np.center_to_corner_box2d(
                b[None, :2], b[None, 3:5], np.array([b[8]]))[0]
            u = rng.uniform(0.05, 0.95, (k, 2))
            xy = (corners[0]
                  + u[:, :1] * (corners[1] - corners[0])
                  + u[:, 1:] * (corners[3] - corners[0]))
            z = b[2] + (rng.uniform(0.05, 0.95, (k, 1)) - 0.5) * b[5]
            pts.append(np.concatenate([xy, z], 1))
        return np.concatenate(pts)

    def test_points_in_rbbox_matches_corners(self):
        rng = np.random.default_rng(2)
        boxes = self._random_boxes(rng, 6)
        pts = self._points_inside(rng, boxes)
        mask = box_np.points_in_rbbox(pts, boxes)
        # each block of 32 points lies in its own box
        for j in range(len(boxes)):
            assert mask[32 * j:32 * (j + 1), j].all()
        # far-away points in none
        far = pts.copy()
        far[:, 0] += 100.0
        assert not box_np.points_in_rbbox(far, boxes).any()

    def test_global_augment_preserves_containment(self):
        """ADVICE item: corners of augmented gt still enclose the rotated
        object points — pins the point-rotation sense vs the yaw update."""

        class ScriptedRng:
            """Deterministic stand-in driving both flip branches on."""

            def __init__(self, theta):
                self.theta = theta
                self._flips = iter([0.2, 0.2])  # both < 0.5 -> both flips

            def random(self):
                return next(self._flips)

            def uniform(self, lo, hi):
                if lo == 0.9:      # scale_noise branch
                    return 1.07
                return self.theta  # rot_noise branch

            def normal(self, mu, std, size):
                return np.full(size, 0.31)

        rng = np.random.default_rng(3)
        boxes = self._random_boxes(rng, 5)
        pts = self._points_inside(rng, boxes)
        n_pts = len(pts)
        pts5 = np.concatenate(
            [pts, rng.uniform(0, 1, (n_pts, 2))], 1).astype(np.float64)

        for theta in (-0.6, 0.0, 0.45):
            p2, b2 = dp.global_augment(pts5.copy(), boxes.copy(),
                                       ScriptedRng(theta))
            mask = box_np.points_in_rbbox(p2[:, :3], b2)
            for j in range(len(b2)):
                assert mask[32 * j:32 * (j + 1), j].all(), (
                    f"theta={theta}: augmented box {j} lost its points")

    def test_flip_heading_physical(self):
        """y-mirror maps the physical (devkit) heading phi -> -phi; the
        det3d update yaw -> -yaw + pi (preprocess.py:810) encodes exactly
        that under yaw = -phi - pi/2."""
        yaw = 0.7
        phi = -yaw - np.pi / 2
        yaw_flipped = -yaw + np.pi
        phi_flipped = -yaw_flipped - np.pi / 2
        # compare direction vectors (mod 2pi safe)
        np.testing.assert_allclose(
            [np.cos(phi_flipped), np.sin(phi_flipped)],
            [np.cos(-phi), np.sin(-phi)], atol=1e-12)


class TestSubmissionYaw:
    def test_quaternion_encodes_devkit_yaw(self, tmp_path):
        import json
        from link_tpu.eval.submission import write_submission

        phi = 0.9                      # physical devkit yaw
        yaw_det3d = -phi - np.pi / 2   # what the model predicts
        boxes = np.zeros((1, 9))
        boxes[0, 3:6] = 1.0
        boxes[0, 8] = yaw_det3d
        out = str(tmp_path / "sub.json")
        write_submission([{"token": "t0", "pred_boxes": boxes,
                           "pred_scores": np.array([0.9]),
                           "pred_labels": np.array([0])}], out)
        with open(out) as f:
            sub = json.load(f)
        q = sub["results"]["t0"][0]["rotation"]
        np.testing.assert_allclose(
            q, [np.cos(phi / 2), 0, 0, np.sin(phi / 2)], atol=1e-9)

    def test_global_conversion_adds_yaw_shift_to_devkit(self):
        from link_tpu.eval.submission import (boxes_lidar_to_global,
                                              det3d_to_devkit_yaw)
        shift = 0.4
        c, s = np.cos(shift), np.sin(shift)
        rot = np.array([[c, -s, 0, 0], [s, c, 0, 0],
                        [0, 0, 1, 0], [0, 0, 0, 1.0]])
        info = {"ref_from_car": np.linalg.inv(rot), "car_from_global": np.eye(4)}
        phi = -0.3
        boxes = np.zeros((1, 9))
        boxes[0, 8] = -phi - np.pi / 2
        g = boxes_lidar_to_global(det3d_to_devkit_yaw(boxes), info)
        np.testing.assert_allclose(g[0, 8], phi + shift, atol=1e-9)
