"""CenterPoint velocity tracker: identity persistence, velocity gating,
coasting, and the end-to-end nuScenes/Waymo driver plumbing."""

import json
import pickle

import numpy as np

from link_tpu.tracking import (CenterTracker, greedy_assignment,
                               WAYMO_TRACKING_NAMES)


def det(x, y, vx, vy, name="car", score=0.9):
    return {"translation": [x, y, 0.0], "size": [2, 4, 1.5],
            "rotation": [1, 0, 0, 0], "velocity": [vx, vy],
            "detection_name": name, "detection_score": score}


def test_greedy_assignment_prefers_nearest():
    dist = np.array([[0.5, 3.0], [2.0, 0.2]])
    m = greedy_assignment(dist)
    assert {(int(a), int(b)) for a, b in m} == {(0, 0), (1, 1)}
    # gated entries never match
    assert len(greedy_assignment(np.full((2, 2), 1e18))) == 0


def test_ids_persist_along_trajectories():
    tr = CenterTracker(max_age=3)
    # two cars moving in +x and +y at 10 m/s, frames 0.5 s apart
    ids = {0: set(), 1: set()}
    for t in range(5):
        frame = [det(10.0 + 5.0 * t, 0.0, 10.0, 0.0),
                 det(0.0, -20.0 + 5.0 * t, 0.0, 10.0)]
        out = tr.step(frame, 0.5 if t else 0.0)
        assert len(out) == 2
        for o in out:
            which = 0 if o["velocity"][0] > 1.0 else 1
            ids[which].add(o["tracking_id"])
    assert len(ids[0]) == 1 and len(ids[1]) == 1
    assert ids[0] != ids[1]


def test_class_and_distance_gating():
    tr = CenterTracker(max_age=0)
    out0 = tr.step([det(0, 0, 0, 0, "car")], 0.0)
    tid = out0[0]["tracking_id"]
    # same place but different class -> new id
    out1 = tr.step([det(0, 0, 0, 0, "truck")], 0.5)
    assert out1[0]["tracking_id"] != tid
    # pedestrian gate is 1 m: a 3 m jump breaks the track
    tr.reset()
    p0 = tr.step([det(0, 0, 0, 0, "pedestrian")], 0.0)
    p1 = tr.step([det(3.0, 0, 0, 0, "pedestrian")], 0.5)
    assert p1[0]["tracking_id"] != p0[0]["tracking_id"]


def test_coasting_rejoins_after_dropout():
    tr = CenterTracker(max_age=3)
    tr.step([det(10, 0, 10, 0)], 0.0)
    a = tr.step([det(15, 0, 10, 0)], 0.5)   # matched: motion learned
    tid = a[0]["tracking_id"]
    # dropout frame: no detections of this object, but a far dummy object
    # keeps the frame non-empty (an empty frame clears all tracks,
    # reference pub_tracker.py:50-52)
    mid = tr.step([det(500, 500, 0, 0, "bus")], 0.5)
    assert any(t["active"] == 0 for t in mid)  # coasted, not emitted
    back = tr.step([det(25.0, 0, 10, 0), det(500, 500, 0, 0, "bus")], 0.5)
    car = [t for t in back if t["detection_name"] == "car" and t["active"]][0]
    assert car["tracking_id"] == tid and car["active"] >= 1


def test_hungarian_matches_greedy_on_easy_case():
    for hung in (False, True):
        tr = CenterTracker(max_age=0, hungarian=hung)
        tr.step([det(0, 0, 0, 0), det(50, 0, 0, 0)], 0.0)
        out = tr.step([det(0.5, 0, 0, 0), det(50.5, 0, 0, 0)], 0.5)
        assert sorted(t["tracking_id"] for t in out) == [1, 2]


def test_nusc_track_tool_end_to_end(tmp_path):
    from tools.nusc_track import run_tracking
    frames = [{"token": f"t{i}", "timestamp": 0.5 * i, "first": i == 0}
              for i in range(4)]
    preds = {f"t{i}": [det(5.0 * i, 0.0, 10.0, 0.0)] for i in range(4)}
    annos = run_tracking(preds, frames)
    ids = {a["tracking_id"] for tok in annos for a in annos[tok]}
    assert len(ids) == 1
    for tok in annos:
        assert annos[tok][0]["tracking_name"] == "car"


def test_waymo_transform_box_roundtrip():
    from tools.waymo_track import transform_box
    rng = np.random.default_rng(3)
    boxes = rng.standard_normal((5, 9)).astype(np.float64)
    th = 0.7
    pose = np.eye(4)
    pose[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    pose[:3, 3] = [10, -4, 2]
    g = transform_box(boxes, pose)
    back = transform_box(g, np.linalg.inv(pose))
    np.testing.assert_allclose(back[:, :8], boxes[:, :8], atol=1e-9)
    np.testing.assert_allclose(np.mod(back[:, 8] - boxes[:, 8], 2 * np.pi),
                               np.zeros(5), atol=1e-9)
