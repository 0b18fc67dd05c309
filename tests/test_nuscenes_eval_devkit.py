"""Devkit faithfulness of the internal nuScenes evaluator on fixtures with
hand-computable metric values (VERDICT r1 item 3): class-range filtering,
per-class TP exclusions, attribute error from the velocity heuristic, and
the NDS composition."""

import numpy as np

from link_tpu.eval import nuscenes_eval as NE


def box(x, y, yaw=0.0, vx=1.0, vy=0.0, wlh=(2.0, 4.0, 1.5), z=0.0):
    return np.array([x, y, z, wlh[0], wlh[1], wlh[2], vx, vy, yaw])


def sample(gt, classes, preds, scores, labels, attrs=None, token="t"):
    s = {"token": token,
         "gt_boxes": np.asarray(gt, float).reshape(-1, 9),
         "gt_classes": np.asarray(classes, int),
         "pred_boxes": np.asarray(preds, float).reshape(-1, 9),
         "pred_scores": np.asarray(scores, float),
         "pred_labels": np.asarray(labels, int)}
    if attrs is not None:
        s["gt_attributes"] = np.asarray(attrs, object)
    return s


def evaluate(samples, class_names=NE.CLASS_NAMES):
    gt_c, pr_c, sc_c, at_c = NE.group_by_class(samples)
    return NE.evaluate_nuscenes(gt_c, pr_c, sc_c, class_names=class_names,
                                attrs_by_class=at_c)


def test_perfect_predictions_give_nds_one():
    gt = [box(0, 0), box(10, 0)]
    s = sample(gt, [1, 1], gt, [0.9, 0.8], [0, 0],
               attrs=["vehicle.moving", "vehicle.moving"])
    # restricted to 'car': a perfect single-class benchmark scores NDS 1
    m = evaluate([s], class_names=("car",))
    assert abs(m["class_aps"]["car"] - 1.0) < 1e-9
    for k in ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err"):
        assert m["class_tps"]["car"][k] == 0.0
    assert abs(m["nds"] - 1.0) < 1e-9
    # full 10-class eval: absent classes score AP 0 and worst-case TP
    # errors 1 (devkit MetricData.no_predictions semantics)
    m10 = evaluate([s])
    assert abs(m10["mean_ap"] - 0.1) < 1e-9
    # trans/scale over 10 classes, orient over 9 (no cone), vel/attr over
    # 8 (no barrier/cone): hand-composed NDS
    want = (5 * 0.1 + (1 - 0.9) * 2 + (1 - 8 / 9) + (1 - 7 / 8) * 2) / 10
    assert abs(m10["nds"] - want) < 1e-9


def test_class_range_filter_drops_far_boxes():
    # a 60 m car (beyond the 50 m class range) must vanish from BOTH sides
    near = [box(0, 0)]
    s = sample(near + [box(60, 0)], [1, 1],
               near + [box(60, 0)], [0.9, 0.8], [0, 0],
               attrs=["vehicle.moving", "vehicle.moving"])
    m = evaluate([s])
    assert abs(m["class_aps"]["car"] - 1.0) < 1e-9  # far pair filtered out
    # a 35 m traffic cone is beyond ITS 30 m range
    s2 = sample([box(35, 0)], [10], [box(35, 0)], [0.9], [9])
    m2 = evaluate([s2])
    assert m2["class_aps"]["traffic_cone"] == 0.0   # no gt survives


def test_barrier_and_cone_exclusions():
    # barrier: orientation folded mod pi; velocity/attr NaN
    gt = [box(0, 0, yaw=0.0, vx=0, vy=0)]
    pred = [box(0, 0, yaw=np.pi, vx=5, vy=5)]   # pi off -> 0 after fold
    s = sample(gt, [6], pred, [0.9], [5])
    m = evaluate([s])
    assert m["class_tps"]["barrier"]["orient_err"] == 0.0
    assert np.isnan(m["class_tps"]["barrier"]["vel_err"])
    assert np.isnan(m["class_tps"]["barrier"]["attr_err"])
    # cone: no orientation metric at all
    s2 = sample([box(0, 0, yaw=0.3)], [10], [box(0, 0, yaw=1.5)], [0.9], [9])
    m2 = evaluate([s2])
    assert np.isnan(m2["class_tps"]["traffic_cone"]["orient_err"])


def test_attribute_error_from_velocity_heuristic():
    # gt says parked, prediction moves at speed 2 -> heuristic says moving
    # -> attr_err 1 for that match
    gt = [box(0, 0, vx=0, vy=0)]
    pred = [box(0, 0, vx=2, vy=0)]
    s = sample(gt, [1], pred, [0.9], [0], attrs=["vehicle.parked"])
    m = evaluate([s])
    assert m["class_tps"]["car"]["attr_err"] == 1.0
    # matching attribute -> 0
    s2 = sample(gt, [1], gt, [0.9], [0], attrs=["vehicle.parked"])
    m2 = evaluate([s2])
    assert m2["class_tps"]["car"]["attr_err"] == 0.0
    # no stored gt attributes -> worst-case 1.0 (devkit cummean returns
    # ones for an all-NaN series), NOT a silent 0 — create_data.py must
    # store gt_attributes for a true NDS
    s3 = sample(gt, [1], pred, [0.9], [0])
    m3 = evaluate([s3])
    assert m3["class_tps"]["car"]["attr_err"] == 1.0


def devkit_accumulate_literal(gt, preds, scores, dist_th):
    """Straight-line transcription of devkit detection/algo.py accumulate
    for a single-sample, single-class fixture (the 'hand computation')."""
    order = np.argsort(-np.asarray(scores))
    taken = set()
    tp, fp, conf, match_conf, ate = [], [], [], [], []
    for j in order:
        pb = preds[j]
        best, best_d = -1, np.inf
        for gi in range(len(gt)):
            if gi in taken:
                continue
            d = np.hypot(pb[0] - gt[gi][0], pb[1] - gt[gi][1])
            if d < best_d:
                best, best_d = gi, d
        if best >= 0 and best_d < dist_th:
            taken.add(best)
            tp.append(1)
            fp.append(0)
            match_conf.append(scores[j])
            ate.append(best_d)
        else:
            tp.append(0)
            fp.append(1)
        conf.append(scores[j])
    if not match_conf:   # devkit MetricData.no_predictions -> AP 0, err 1
        return 0.0, 1.0
    tpc, fpc = np.cumsum(tp).astype(float), np.cumsum(fp).astype(float)
    prec, rec = tpc / (tpc + fpc), tpc / len(gt)
    rec_i = np.linspace(0, 1, 101)
    prec_i = np.interp(rec_i, rec, prec, right=0)
    conf_i = np.interp(rec_i, rec, conf, right=0)
    cm = np.cumsum(ate) / np.arange(1, len(ate) + 1)
    ate_i = np.interp(conf_i[::-1], np.asarray(match_conf)[::-1],
                      cm[::-1])[::-1]
    ap = np.mean(np.maximum(prec_i[11:] - 0.1, 0)) / 0.9
    nz = np.nonzero(conf_i)[0]
    mri = nz[-1] if len(nz) else 0
    tp_err = 1.0 if mri < 11 else float(np.mean(ate_i[11:mri + 1]))
    return float(ap), tp_err


def test_matches_devkit_literal_transcription():
    """Partial-recall fixture: p1 hits at 0.5 m, p2 hits at 1.0 m, p3 is a
    far false positive — AP and ATE must equal the literal devkit math."""
    gt = [box(0, 0), box(10, 0)]
    preds = [box(0.5, 0), box(10, 1.0), box(30, 30)]
    scores = [0.9, 0.8, 0.7]
    s = sample(gt, [1, 1], preds, scores, [0, 0, 0],
               attrs=["vehicle.moving", "vehicle.moving"])
    m = evaluate([s])
    for th in NE.DIST_THS:
        want_ap, want_ate = devkit_accumulate_literal(
            [np.asarray(b) for b in gt], [np.asarray(p) for p in preds],
            scores, th)
        md = NE.accumulate([s["gt_boxes"]], [s["pred_boxes"]],
                           [np.asarray(scores)], th, cls="car",
                           gt_attrs=[s["gt_attributes"]])
        got_ap = NE.calc_ap(md) if md else 0.0
        got_ate = NE.calc_tp(md, "trans_err") if md else 1.0
        np.testing.assert_allclose(got_ap, want_ap, atol=1e-9,
                                   err_msg=f"AP at {th}")
        np.testing.assert_allclose(got_ate, want_ate, atol=1e-9,
                                   err_msg=f"ATE at {th}")
