"""GT-AUG: database build round-trips through the sampler; collisions
rejected."""

import numpy as np

from link_tpu.data.gt_aug import DataBaseSampler, create_gt_database


class _TinyDS:
    """Two frames with one car + one pedestrian each."""

    def __len__(self):
        return 2

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        boxes = np.array([[5.0 + i, 0.0, 0.0, 2.0, 4.0, 1.5, 0, 0, 0.0],
                          [-5.0, 3.0, 0.0, 0.7, 0.7, 1.8, 0, 0, 0.0]],
                         np.float32)
        pts = []
        for b in boxes:
            p = rng.uniform(-0.3, 0.3, (50, 3)).astype(np.float32) + b[:3]
            pts.append(np.concatenate(
                [p, rng.uniform(0, 1, (50, 2)).astype(np.float32)], 1))
        noise = rng.uniform(-20, 20, (200, 5)).astype(np.float32)
        return {"points": np.concatenate(pts + [noise]),
                "gt_boxes": boxes,
                "gt_names": np.array(["car", "pedestrian"])}


def test_database_and_sampler(tmp_path):
    db = create_gt_database(_TinyDS(), str(tmp_path))
    assert set(db) == {"car", "pedestrian"}
    assert all(i["num_points_in_gt"] >= 40 for i in db["car"])

    sampler = DataBaseSampler(str(tmp_path / "dbinfos_train.pkl"),
                              str(tmp_path),
                              sample_groups=dict(car=2, pedestrian=2),
                              min_points=dict(car=5, pedestrian=5))
    rng = np.random.default_rng(0)
    # empty scene: everything samples
    out = sampler.sample_all(np.zeros((0, 9), np.float32),
                             np.array([], dtype="<U16"), rng)
    assert out is not None
    assert len(out["gt_boxes"]) >= 2
    assert out["points"].shape[1] == 5
    # sampled points sit near their boxes
    for b in out["gt_boxes"]:
        d = np.linalg.norm(out["points"][:, :2] - b[:2], axis=1)
        assert (d < 3.0).any()

    # scene already containing an overlapping car: the colliding candidate
    # must be rejected
    blocker = np.array([[5.0, 0.0, 0.0, 30.0, 30.0, 1.5, 0, 0, 0.0],
                        [-5.0, 3.0, 0.0, 30.0, 30.0, 1.8, 0, 0, 0.0]],
                       np.float32)
    out2 = sampler.sample_all(blocker, np.array(["car", "pedestrian"]), rng)
    assert out2 is None or len(out2["gt_boxes"]) == 0 or not (
        np.linalg.norm(out2["gt_boxes"][:, :2] - [5.0, 0.0], axis=1) < 1.0
    ).any()
