"""End-to-end execution of the devkit/toolkit-gated prep paths over
fabricated fixtures (VERDICT round-2 missing #3 / next #8).

Drives the REAL production code — tools/create_data.nuscenes_data_prep,
build_gt_database, NuScenesDataset, evaluate_nuscenes — with fake_nusc
standing in for the nuscenes-devkit, so schema bugs in the info builder
surface in CI instead of on first contact with the raw dataset.
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fake_nusc


@pytest.fixture(scope="module")
def prepped(tmp_path_factory):
    """Run nuscenes_data_prep once over the fabricated world."""
    root = str(tmp_path_factory.mktemp("nusc"))

    class _MP:
        """module-scoped stand-in for pytest's function-scoped monkeypatch"""
        def setitem(self, d, k, v):
            d[k] = v

    fake_nusc.install(_MP(), root)
    from tools.create_data import nuscenes_data_prep
    train_infos, val_infos = nuscenes_data_prep(root, version="v1.0-mini",
                                                nsweeps=3)
    yield root, train_infos, val_infos
    for m in ("nuscenes", "nuscenes.utils"):
        sys.modules.pop(m, None)


def test_info_schema(prepped):
    root, train_infos, val_infos = prepped
    assert len(train_infos) == 2 and len(val_infos) == 2
    info = train_infos[0]
    for key in ("lidar_path", "token", "sweeps", "ref_from_car",
                "car_from_global", "timestamp", "gt_boxes", "gt_names",
                "gt_boxes_velocity", "gt_attributes", "gt_num_pts"):
        assert key in info, key
    assert info["gt_boxes"].shape == (2, 9)
    assert len(info["sweeps"]) == 2                   # nsweeps - 1
    assert os.path.exists(info["lidar_path"])
    # keyframe 0 has no prev: sweeps fall back to the keyframe itself
    assert info["sweeps"][0]["transform_matrix"] is None
    # keyframe 1 has a real prev sweep with a transform
    info1 = train_infos[1]
    assert info1["sweeps"][0]["transform_matrix"] is not None
    # pkls on disk with the reference naming
    assert os.path.exists(os.path.join(
        root, "infos_train_3sweeps_withvelo_filter_True.pkl"))


def test_info_geometry_roundtrip(prepped):
    """gt boxes in the info are in the lidar frame with det3d yaw; mapping
    them back to global through the info's own matrices must recover the
    fabricated global annotation centers."""
    from link_tpu.eval.submission import (boxes_lidar_to_global,
                                          det3d_to_devkit_yaw)
    root, train_infos, _ = prepped
    nusc = fake_nusc.FakeNuScenes("v1.0-mini", root)
    for info in train_infos:
        samp = next(s for s in nusc.sample if s["token"] == info["token"])
        want = np.asarray(
            [nusc.get("sample_annotation", a)["translation"]
             for a in samp["anns"]], float)
        got = boxes_lidar_to_global(
            det3d_to_devkit_yaw(np.asarray(info["gt_boxes"], float)), info)
        np.testing.assert_allclose(got[:, :3], want, atol=1e-6)


def test_dataset_and_gt_database(prepped):
    root, _, _ = prepped
    from link_tpu.data.nuscenes import NuScenesDataset
    from tools.create_data import build_gt_database

    info_path = os.path.join(root,
                             "infos_train_3sweeps_withvelo_filter_True.pkl")
    ds = NuScenesDataset(info_path, root_path=root, nsweeps=3, mode="train",
                         use_cbgs=False, max_voxels=(20000, 20000))
    s = ds[1]
    assert s["voxels"].shape[1:] == (10, 5)
    assert "targets" in s and len(s["targets"]["hm"]) == 6   # 6 nusc tasks
    total_pos = sum(m.sum() for m in s["targets"]["mask"])
    assert total_pos >= 1                     # car+ped landed in heatmaps

    dsv = NuScenesDataset(
        os.path.join(root, "infos_val_3sweeps_withvelo_filter_True.pkl"),
        root_path=root, nsweeps=3, mode="val", use_cbgs=False,
        max_voxels=(20000, 20000))
    sv = dsv[0]
    assert sv["gt_boxes"].shape[1] == 9

    build_gt_database(root, info_path, nsweeps=3)
    with open(os.path.join(root, "dbinfos_train.pkl"), "rb") as f:
        db = pickle.load(f)
    assert set(db) == {"car", "pedestrian"}
    assert all(e["num_points_in_gt"] > 0 for e in db["car"])
    e0 = db["car"][0]
    pts = np.fromfile(os.path.join(root, e0["path"]),
                      np.float32).reshape(-1, 5)
    # db points are stored box-centered
    assert np.abs(pts[:, :2]).max() < 6.0


def test_eval_on_perfect_predictions(prepped):
    """info pkl -> dataset gt -> evaluate_nuscenes with predictions == gt
    must score ~1.0 AP for the present classes (car, pedestrian)."""
    from link_tpu.eval.nuscenes_eval import (evaluate_nuscenes,
                                             group_by_class)
    root, _, val_infos = prepped
    samples, infos_by_tok = [], {}
    for info in val_infos:
        gt = np.asarray(info["gt_boxes"], float)
        classes = np.asarray(
            [1 if n == "car" else 9 for n in info["gt_names"]])  # 1-based
        samples.append({
            "token": info["token"], "gt_boxes": gt, "gt_classes": classes,
            "gt_attributes": info["gt_attributes"],
            "gt_num_pts": info["gt_num_pts"],
            "pred_boxes": gt.copy(),
            "pred_scores": np.linspace(0.9, 0.6, len(gt)),
            "pred_labels": classes - 1})
        infos_by_tok[info["token"]] = info
    gt_c, pr_c, sc_c, at_c = group_by_class(samples, infos=infos_by_tok)
    res = evaluate_nuscenes(gt_c, pr_c, sc_c, attrs_by_class=at_c)
    assert res["class_aps"]["car"] > 0.99
    assert res["class_aps"]["pedestrian"] > 0.99
    # perfect preds: translation/scale/orientation/velocity errors ~ 0
    assert res["class_tps"]["car"]["trans_err"] < 1e-6
    assert res["class_tps"]["car"]["vel_err"] < 1e-6
    # NDS is diluted by the 8 absent classes (devkit semantics: absent
    # classes contribute AP 0 and TP error 1) -> (5 * 0.2 + ~0)/10
    assert res["nds"] > 0.19


def test_lidarseg_dataset(tmp_path, monkeypatch):
    """NuScenesLidarSeg end-to-end on the fabricated devkit world: scene
    filtering, lidarseg .bin remap (32 raw -> 16 + noise), process_scan
    voxelization, and batch collation — the last devkit-gated path that
    had never executed (VERDICT r2 missing #3)."""
    root = str(tmp_path / "nusc")
    fake_nusc.install(monkeypatch, root)
    # instantiating the fake world writes the bins
    import nuscenes
    nuscenes.NuScenes("v1.0-trainval", root)

    from link_tpu.data.collate import collate_scans
    from link_tpu.data.nuscenes_lidarseg import (NUM_CLASSES,
                                                 NuScenesLidarSeg)

    ds = NuScenesLidarSeg(root, split="train", num_points=1024)
    assert len(ds) == 2          # scene-0001's two keyframes
    rng = np.random.default_rng(0)
    scans = [ds.__getitem__(i, rng) for i in range(len(ds))]
    for s in scans:
        assert s["feats"].shape[1] == 4
        assert s["labels"].min() >= 0
        assert s["labels"].max() < NUM_CLASSES
        assert len(s["feats"]) == len(s["coords"]) == len(s["labels"])
    batch = collate_scans(scans[:1], 2048)
    assert batch["nnz"] <= 2048 and batch["nnz"] > 0

    # val split sees the other scene; test split reads no label files
    assert len(NuScenesLidarSeg(root, split="val", num_points=1024)) == 2
    te = NuScenesLidarSeg(root, split="test", num_points=1024,
                          version="v1.0-trainval")
    assert np.all(te[0]["labels"] == 0)
