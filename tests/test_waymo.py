"""Waymo pipeline: synthetic frame-pickle tree -> info generation ->
dataset read (sweep re-projection) -> toolkit-free L1/L2 AP evaluation
(VERDICT r1 item 8; reference waymo_common.py / waymo.py)."""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from link_tpu.data.waymo import WaymoDataset, load_waymo_sweeps
from link_tpu.eval import waymo_eval as WE


def _make_tree(root, n_frames=3):
    rng = np.random.default_rng(5)
    os.makedirs(os.path.join(root, "train", "lidar"), exist_ok=True)
    os.makedirs(os.path.join(root, "train", "annos"), exist_ok=True)
    for fid in range(n_frames):
        name = f"seq_0_frame_{fid}.pkl"
        n = 4000
        xyz = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
        feat = rng.uniform(0, 3, (n, 2)).astype(np.float32)
        pose = np.eye(4)
        pose[:3, 3] = [fid * 2.0, 0, 0]           # ego moves +x
        ts = 1000000 * (fid + 1)
        frame = {"scene_name": "s0",
                 "frame_name": f"s0_loc_{ts}",
                 "frame_id": fid,
                 "veh_to_global": pose.reshape(-1),
                 "lidars": {"points_xyz": xyz, "points_feature": feat}}
        objects = []
        for j in range(5):
            # RAW waymo box [x y z l w h vx vy heading]
            objects.append({"id": f"obj{j}", "name": f"obj{j}",
                            "label": 1 + (j % 2),   # VEHICLE / PEDESTRIAN
                            "box": np.array(
                                [j * 5.0, 1.0, 0.5, 4.0, 2.0, 1.6,
                                 0.1, 0.0, 0.3], np.float32),
                            "num_points": 10 if j else 3})
        annos = dict(frame)
        annos.pop("lidars")
        annos["objects"] = objects
        with open(os.path.join(root, "train", "lidar", name), "wb") as f:
            pickle.dump(frame, f)
        with open(os.path.join(root, "train", "annos", name), "wb") as f:
            pickle.dump(annos, f)


def test_waymo_infos_and_dataset(tmp_path):
    root = str(tmp_path)
    _make_tree(root)
    import create_data_waymo as CW

    class A:
        pass
    a = A()
    a.root, a.split, a.nsweeps = root, "train", 2
    CW.fill_infos(a)
    info_path = os.path.join(root, "infos_train_02sweeps.pkl")
    with open(info_path, "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 3
    # det3d conversion happened: dims (w, l) swapped, heading flipped
    b = infos[0]["gt_boxes"][0]
    np.testing.assert_allclose(b[3:6], [2.0, 4.0, 1.6], atol=1e-6)
    np.testing.assert_allclose(b[8], -np.pi / 2 - 0.3, atol=1e-6)
    # zero-point gts stay (num_points 3 > 0); all 5 objects kept
    assert len(infos[0]["gt_boxes"]) == 5

    # sweep re-projection: frame 1's sweep is frame 0 re-projected by the
    # +2m ego displacement
    frame = load_waymo_sweeps(infos[1], root, 2)
    pts = frame["points"]
    assert pts.shape[1] == 6                       # + time channel
    assert (pts[:, 5] != 0).any()                  # sweep rows carry lag

    ds = WaymoDataset(info_path, root, mode="val", nsweeps=1,
                      max_voxels=(10000, 10000))
    s = ds[0]
    assert s["gt_boxes"].shape[1] == 9
    assert len(s["gt_classes"]) == 5
    assert "gt_num_pts" in s

    ds_t = WaymoDataset(info_path, root, mode="train", nsweeps=1,
                        max_voxels=(10000, 10000))
    st = ds_t[0]
    assert "targets" in st and len(st["targets"]["hm"]) == 3  # 3 tasks


def test_waymo_eval_perfect_and_difficulty():
    gt = np.zeros((4, 9))
    gt[:, 0] = [0, 10, 20, 30]
    gt[:, 3:6] = [2, 4, 1.6]
    gt[:, 8] = 0.2
    npts = np.array([10, 10, 3, 10])               # one L2-only gt
    s = {"token": "t", "gt_boxes": gt, "gt_classes": np.ones(4, int),
         "gt_num_pts": npts, "pred_boxes": gt.copy(),
         "pred_scores": np.linspace(0.9, 0.6, 4),
         "pred_labels": np.zeros(4, int)}
    m = WE.evaluate_waymo([s])
    assert m["ap_l2"]["VEHICLE"] == pytest.approx(1.0, abs=1e-6)
    # L1 ignores the 3-point gt but its matched pred must not count as FP
    assert m["ap_l1"]["VEHICLE"] == pytest.approx(1.0, abs=1e-6)
    assert np.isnan(m["ap_l1"]["CYCLIST"])         # no cyclist gt

    # a bad prediction (shifted beyond IoU 0.7) scores below 1
    s2 = dict(s)
    pb = gt.copy()
    pb[0, 0] += 1.5
    s2["pred_boxes"] = pb
    m2 = WE.evaluate_waymo([s2])
    assert m2["ap_l2"]["VEHICLE"] < 1.0

    # perfect headings: APH == AP
    assert m["aph_l2"]["VEHICLE"] == pytest.approx(m["ap_l2"]["VEHICLE"],
                                                   abs=1e-6)


def test_waymo_aph_hand_computed():
    """APH fixture (reference semantics: waymo_common.py:52-115 via the
    official toolkit): TP contributions to precision AND recall scale by
    1 - |wrapped heading error| / pi.

    Two gts, two perfect-box preds; pred 1 heading exact (h = 1), pred 2
    off by pi/2 (h = 0.5). Heading-weighted PR: (r, p) = (0.5, 1.0) then
    (0.75, 0.75); 101-point integration = 51*1.0 + sum_{i=1..25}(1 - i/100)
    = 72.75 points over 101 -> APH = 72.75/101. AP stays 1.0."""
    gt = np.zeros((2, 9))
    gt[:, 0] = [0, 20]
    gt[:, 3:6] = [4, 4, 1.6]      # square footprint: heading error does
    gt[:, 8] = [0.3, 0.3]         # not change the overlap (IoU stays 1)
    pred = gt.copy()
    pred[1, 8] = 0.3 + np.pi / 2
    s = {"token": "t", "gt_boxes": gt, "gt_classes": np.ones(2, int),
         "pred_boxes": pred, "pred_scores": np.array([0.9, 0.8]),
         "pred_labels": np.zeros(2, int)}
    m = WE.evaluate_waymo([s])
    assert m["ap_l2"]["VEHICLE"] == pytest.approx(1.0, abs=1e-6)
    assert m["aph_l2"]["VEHICLE"] == pytest.approx(72.75 / 101, abs=1e-6)
    # heading wrap: a pi error weights 0; 2*pi error weights 1
    pred2 = gt.copy()
    pred2[1, 8] = 0.3 + 2 * np.pi
    s["pred_boxes"] = pred2
    m2 = WE.evaluate_waymo([s])
    assert m2["aph_l2"]["VEHICLE"] == pytest.approx(1.0, abs=1e-6)


def test_waymo_submission_json(tmp_path):
    s = {"token": "t", "pred_boxes": np.array([[1, 2, 0.5, 2, 4, 1.6,
                                                0, 0, -np.pi / 2 - 0.3]]),
         "pred_scores": np.array([0.9]), "pred_labels": np.array([0])}
    out = WE.write_waymo_submission([s], str(tmp_path / "pred.bin"))
    import json
    with open(out) as f:
        e = json.load(f)[0]
    # back to the raw waymo convention: heading 0.3, dims (l, w)
    assert e["heading"] == pytest.approx(0.3)
    assert e["length"] == pytest.approx(4.0)
    assert e["width"] == pytest.approx(2.0)


def test_waymo_decode_tfrecords(tmp_path, monkeypatch):
    """Execute the full converter chain — TFRecord (real wire framing)
    -> decode -> infos -> gt database — against the fabricated toolkit
    (tests/fake_waymo.py), with geometry pinned: sweep transform
    matrices against hand-computed pose algebra and box velocities
    against the vehicle-frame rotation (reference waymo_decoder.py,
    waymo_common.py:_fill_infos)."""
    import fake_waymo
    fake_waymo.install(monkeypatch)
    import create_data_waymo as CW

    records = str(tmp_path / "records")
    root = str(tmp_path / "Waymo")
    poses = fake_waymo.build_world(records)

    class A:
        pass

    a = A()
    a.records = os.path.join(records, "*.tfrecord")
    a.out, a.split = root, "train"
    CW.decode(a)

    lidar_dir = os.path.join(root, "train", "lidar")
    assert sorted(os.listdir(lidar_dir)) == sorted(
        f"seq_{s}_frame_{f}.pkl" for s in range(2) for f in range(3))
    with open(os.path.join(lidar_dir, "seq_0_frame_1.pkl"), "rb") as f:
        fr = pickle.load(f)
    assert fr["lidars"]["points_xyz"].shape == (430, 3)
    assert fr["lidars"]["points_feature"].shape == (430, 2)
    np.testing.assert_allclose(
        np.asarray(fr["veh_to_global"]).reshape(4, 4), poses[(0, 1)])

    # annos: velocity rotated into the vehicle frame by the pose yaw
    with open(os.path.join(root, "train", "annos",
                           "seq_0_frame_1.pkl"), "rb") as f:
        an = pickle.load(f)
    yaw = 0.1
    c, s = np.cos(yaw), np.sin(yaw)
    want_v = np.array([[c, s], [-s, c]]) @ np.array([3.0, 1.0])
    np.testing.assert_allclose(an["objects"][0]["box"][6:8], want_v,
                               rtol=1e-6)

    a2 = A()
    a2.root, a2.split, a2.nsweeps = root, "train", 2
    CW.fill_infos(a2)
    info_path = os.path.join(root, "infos_train_02sweeps.pkl")
    with open(info_path, "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 6
    by_token = {i["token"]: i for i in infos}

    # sweep transform: a global point seen from frame 0 must land at its
    # frame-1 vehicle coordinates after transform_matrix
    info1 = by_token["seq_0_frame_1.pkl"]
    tm = info1["sweeps"][0]["transform_matrix"]
    g = np.array([3.0, -2.0, 1.0, 1.0])
    p_cur = np.linalg.inv(poses[(0, 0)]) @ g
    p_ref = np.linalg.inv(poses[(0, 1)]) @ g
    np.testing.assert_allclose(tm @ p_cur, p_ref, atol=1e-9)
    assert info1["sweeps"][0]["time_lag"] == pytest.approx(1.0)

    # det3d box convention + the num_pts==0 pedestrian dropped
    assert list(info1["gt_names"]) == ["VEHICLE"]
    b = info1["gt_boxes"][0]
    np.testing.assert_allclose(b[3:5], [1.9, 4.2], rtol=1e-6)  # w, l swap
    assert b[8] == pytest.approx(-np.pi / 2 - 0.25)

    # frame 0 has no previous frame: sweep falls back to the keyframe
    info0 = by_token["seq_0_frame_0.pkl"]
    assert info0["sweeps"][0]["transform_matrix"] is None

    a3 = A()
    a3.root, a3.split, a3.nsweeps = root, "train", 2
    CW.gt_db(a3)
    with open(os.path.join(root, "dbinfos_train.pkl"), "rb") as f:
        db = pickle.load(f)
    assert "VEHICLE" in db and len(db["VEHICLE"]) == 6
    rec = db["VEHICLE"][0]
    pts = np.fromfile(os.path.join(root, rec["path"]),
                      np.float32).reshape(-1, 5)
    assert rec["num_points_in_gt"] == len(pts) > 0
    # stored box-centered: cropped cluster stays inside the box extents
    assert (np.abs(pts[:, 0]) <= 4.2 / 2 + 1e-5).all()
    assert (np.abs(pts[:, 1]) <= 1.9 / 2 + 1e-5).all()
