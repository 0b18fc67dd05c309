"""nuScenes detection metrics (mAP / TP errors / NDS), devkit-free.

The reference calls the official nuscenes-devkit NuScenesEval
(detection/det3d/datasets/nuscenes/nuscenes.py:208-347, nusc_common.py:610).
That devkit isn't available in this environment, so this module implements
the published metric definitions directly (Caesar et al., nuScenes 2019):

  * per-class AP: center-distance matching at thresholds {0.5, 1, 2, 4} m,
    integrated over recall in [0.1, 1] / precision in [0.1, 1] (the
    devkit's 101-point interpolation with 10% clamps);
  * TP errors at the 2 m threshold: ATE (center L2), ASE (1 - 3D IoU of
    aligned boxes), AOE (yaw delta, period pi for barriers), AVE (velocity
    L2), AAE (attribute error — 0 here, no attribute head);
  * NDS = (5 * mAP + sum(1 - min(1, err))) / 10.

Used for val-set scoring of our own predictions; submission JSON writing
lives in eval/submission.py.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

DIST_THS = (0.5, 1.0, 2.0, 4.0)
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")

CLASS_NAMES = ("car", "truck", "construction_vehicle", "bus", "trailer",
               "barrier", "motorcycle", "bicycle", "pedestrian",
               "traffic_cone")
# classes where velocity/attribute are ignored by the devkit
NO_VEL = ("barrier", "traffic_cone")
PERIOD_PI = ("barrier",)


def _aligned_3d_iou(gt_box, pred_box):
    """IoU of aligned (centered, axis-aligned) boxes — devkit scale_iou."""
    inter = np.prod(np.minimum(gt_box[3:6], pred_box[3:6]))
    union = np.prod(gt_box[3:6]) + np.prod(pred_box[3:6]) - inter
    return inter / max(union, 1e-9)


def _yaw_diff(a, b, period=2 * np.pi):
    d = (a - b) % period
    return min(d, period - d)


def accumulate(gt_boxes: List[np.ndarray], pred_boxes: List[np.ndarray],
               pred_scores: List[np.ndarray], dist_th: float):
    """Single-class accumulation over samples. Boxes (N, 9):
    [x y z w l h vx vy yaw]. Returns dict with interpolated precision and
    TP error curves (devkit evaluate.py::accumulate)."""
    npos = sum(len(g) for g in gt_boxes)
    if npos == 0:
        return None
    all_rows = []
    for si, (gts, preds, scores) in enumerate(
            zip(gt_boxes, pred_boxes, pred_scores)):
        for j in range(len(preds)):
            all_rows.append((float(scores[j]), si, j))
    all_rows.sort(key=lambda r: -r[0])

    taken = [set() for _ in gt_boxes]
    tp, fp, conf = [], [], []
    errs = {m: [] for m in TP_METRICS}
    for score, si, j in all_rows:
        pb = pred_boxes[si][j]
        gts = gt_boxes[si]
        best, best_d = -1, float("inf")
        for gi in range(len(gts)):
            if gi in taken[si]:
                continue
            d = np.hypot(pb[0] - gts[gi][0], pb[1] - gts[gi][1])
            if d < best_d:
                best, best_d = gi, d
        if best >= 0 and best_d < dist_th:
            taken[si].add(best)
            tp.append(1)
            fp.append(0)
            g = gts[best]
            errs["trans_err"].append(best_d)
            errs["scale_err"].append(1 - _aligned_3d_iou(g, pb))
            errs["orient_err"].append(_yaw_diff(g[8], pb[8]))
            errs["vel_err"].append(np.hypot(g[6] - pb[6], g[7] - pb[7]))
            errs["attr_err"].append(0.0)
        else:
            tp.append(0)
            fp.append(1)
        conf.append(score)

    if not tp:
        return None
    tp = np.cumsum(tp).astype(float)
    fp = np.cumsum(fp).astype(float)
    prec = tp / (tp + fp)
    rec = tp / npos

    rec_interp = np.linspace(0, 1, 101)
    prec_i = np.interp(rec_interp, rec, prec, right=0)
    out = {"precision": prec_i, "confidence": np.interp(
        rec_interp, rec, conf, right=0)}
    ntp = int(tp[-1])
    for m in TP_METRICS:
        if ntp == 0:
            out[m] = np.ones(101)
        else:
            cum = np.cumsum(errs[m]) / np.arange(1, ntp + 1)
            tp_rec = np.arange(1, ntp + 1) / npos
            out[m] = np.interp(rec_interp, tp_rec, cum,
                               right=cum[-1] if len(cum) else 1.0)
    return out


def calc_ap(md, min_recall=0.1, min_precision=0.1) -> float:
    prec = md["precision"].copy()
    prec = prec[int(min_recall * 100) + 1:]
    prec -= min_precision
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - min_precision)


def calc_tp(md, metric: str, min_recall=0.1) -> float:
    """Mean TP error over recall in (min_recall, max achieved recall]."""
    conf = md["confidence"]
    nonzero = np.nonzero(conf)[0]
    max_recall_ind = nonzero[-1] if len(nonzero) else 0
    first = int(min_recall * 100) + 1
    if max_recall_ind < first:
        return 1.0
    return float(np.mean(md[metric][first:max_recall_ind + 1]))


def evaluate_nuscenes(gt_by_class: Dict[str, List[np.ndarray]],
                      pred_by_class: Dict[str, List[np.ndarray]],
                      score_by_class: Dict[str, List[np.ndarray]],
                      class_names: Sequence[str] = CLASS_NAMES) -> Dict:
    """Compute per-class AP / TP errors + mAP + NDS."""
    aps = {}
    tps = {}
    for cls in class_names:
        mds = {}
        for th in DIST_THS:
            md = accumulate(gt_by_class.get(cls, []),
                            pred_by_class.get(cls, []),
                            score_by_class.get(cls, []), th)
            mds[th] = md
        aps[cls] = np.mean([calc_ap(mds[th]) if mds[th] else 0.0
                            for th in DIST_THS])
        md2 = mds[2.0]
        errs = {}
        for m in TP_METRICS:
            if md2 is None:
                errs[m] = 1.0
            elif cls in NO_VEL and m in ("vel_err", "attr_err"):
                errs[m] = np.nan
            elif cls in PERIOD_PI and m == "orient_err":
                # period pi for barrier orientation
                errs[m] = calc_tp(md2, m)
            else:
                errs[m] = calc_tp(md2, m)
        tps[cls] = errs

    mean_ap = float(np.mean([aps[c] for c in class_names]))
    mean_tps = {}
    for m in TP_METRICS:
        vals = [tps[c][m] for c in class_names
                if not np.isnan(tps[c][m])]
        mean_tps[m] = float(np.mean(vals)) if vals else 1.0
    nds = (5 * mean_ap + sum(max(0.0, 1.0 - min(1.0, mean_tps[m]))
                             for m in TP_METRICS)) / 10.0
    return {"mean_ap": mean_ap, "nds": float(nds), "class_aps": aps,
            "tp_errors": mean_tps, "class_tps": tps}


def group_by_class(samples: List[Dict], class_names=CLASS_NAMES):
    """samples: per-sample dicts with gt_boxes (N, 9), gt_classes (1-based),
    pred_boxes, pred_scores, pred_labels (0-based global). Returns the
    three dicts evaluate_nuscenes wants."""
    gt_c = {c: [] for c in class_names}
    pr_c = {c: [] for c in class_names}
    sc_c = {c: [] for c in class_names}
    for s in samples:
        for ci, cls in enumerate(class_names):
            gsel = s["gt_classes"] == ci + 1
            gt_c[cls].append(s["gt_boxes"][gsel])
            psel = s["pred_labels"] == ci
            pr_c[cls].append(s["pred_boxes"][psel])
            sc_c[cls].append(s["pred_scores"][psel])
    return gt_c, pr_c, sc_c
