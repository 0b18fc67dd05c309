"""Randomized property sweep for the devkit-free nuScenes evaluator.

VERDICT r4 weak-#5: eval/nuscenes_eval.py was pinned only on
hand-computed fixtures (tests/test_nuscenes_eval_devkit.py), so a subtle
deviation from devkit `accumulate` semantics on inputs those fixtures
don't reach (multi-sample confidence interleaving, threshold-boundary
distances, all-FP classes, NaN-bearing attribute series, the per-class
TP exclusions) could shift reported NDS silently. This file sweeps ~40
randomized worlds against `devkit_accumulate_multi` — a straight-line
transcription of devkit detection/algo.py accumulate/calc_ap/calc_tp
extended to multiple samples and all five TP metrics, written with the
devkit's own control flow (per-row greedy match over the globally
confidence-sorted prediction list, cummean over matches, interpolation
onto the 101-grid BY CONFIDENCE).

Scores are drawn UNIQUE: the devkit sorts by -score with an unstable
argsort, so equal-score ordering is unspecified upstream — asserting a
particular tie order would pin noise, not semantics.
"""

import numpy as np
import pytest

from link_tpu.eval import nuscenes_eval as NE


# ---------------------------------------------------------------- oracle

def _cummean(x):
    if np.all(np.isnan(x)):
        return np.ones(len(x))
    return np.nancumsum(x) / np.maximum(np.cumsum(~np.isnan(x)), 1)


def devkit_accumulate_multi(gt_list, pred_list, score_list, dist_th, cls,
                            attrs_list):
    """devkit detection/algo.py accumulate, multi-sample, all TP metrics.
    Returns (ap, {metric: tp_err}) with the devkit's no-gt/no-match
    conventions (None -> AP 0 / err 1 handled by the caller here)."""
    npos = sum(len(g) for g in gt_list)
    if npos == 0:
        return 0.0, {m: 1.0 for m in NE.TP_METRICS}
    rows = []
    for si in range(len(pred_list)):
        for j in range(len(pred_list[si])):
            rows.append((float(score_list[si][j]), si, j))
    rows.sort(key=lambda r: -r[0])

    period = np.pi if cls in NE.PERIOD_PI else 2 * np.pi
    taken = [set() for _ in gt_list]
    tp, fp, conf_all, match_conf = [], [], [], []
    errs = {m: [] for m in NE.TP_METRICS}
    for score, si, j in rows:
        pb = pred_list[si][j]
        best, best_d = -1, np.inf
        for gi in range(len(gt_list[si])):
            if gi in taken[si]:
                continue
            d = np.hypot(pb[0] - gt_list[si][gi][0],
                         pb[1] - gt_list[si][gi][1])
            if d < best_d:
                best, best_d = gi, d
        conf_all.append(score)
        if best < 0 or best_d >= dist_th:       # devkit: strict <
            tp.append(0)
            fp.append(1)
            continue
        taken[si].add(best)
        tp.append(1)
        fp.append(0)
        match_conf.append(score)
        g = gt_list[si][best]
        errs["trans_err"].append(best_d)
        inter = np.prod(np.minimum(g[3:6], pb[3:6]))
        union = np.prod(g[3:6]) + np.prod(pb[3:6]) - inter
        errs["scale_err"].append(1 - inter / union)
        if cls in NE.NO_ORIENT:
            errs["orient_err"].append(np.nan)
        else:
            d = (g[8] - pb[8]) % period
            errs["orient_err"].append(min(d, period - d))
        if cls in NE.NO_VEL:
            errs["vel_err"].append(np.nan)
            errs["attr_err"].append(np.nan)
        else:
            errs["vel_err"].append(np.hypot(g[6] - pb[6], g[7] - pb[7]))
            ga = attrs_list[si][best]
            errs["attr_err"].append(
                np.nan if not ga
                else float(NE._attr_for(cls, pb[6:8]) != ga))

    if not match_conf:
        return 0.0, {m: 1.0 for m in NE.TP_METRICS}
    tpc = np.cumsum(tp).astype(float)
    fpc = np.cumsum(fp).astype(float)
    prec = tpc / (tpc + fpc)
    rec = tpc / npos
    rec_i = np.linspace(0, 1, 101)
    prec_i = np.interp(rec_i, rec, prec, right=0)
    conf_i = np.interp(rec_i, rec, conf_all, right=0)
    ap = float(np.mean(np.maximum(prec_i[11:] - 0.1, 0))) / 0.9

    nz = np.nonzero(conf_i)[0]
    mri = nz[-1] if len(nz) else 0
    out = {}
    mc = np.asarray(match_conf)
    for m in NE.TP_METRICS:
        cm = _cummean(np.asarray(errs[m], float))
        curve = np.interp(conf_i[::-1], mc[::-1], cm[::-1])[::-1]
        out[m] = 1.0 if mri < 11 else float(np.mean(curve[11:mri + 1]))
    return ap, out


# ----------------------------------------------------------- world maker

ATTRS = ("", "vehicle.moving", "vehicle.parked", "vehicle.stopped")


def make_world(rng, n_samples, cls):
    """Adversarial single-class world: clustered centers so matches are
    contested, distances straddling every threshold (incl. exactly at a
    threshold — strict-< must reject), unique scores, random yaw/vel/size,
    empty-gt and empty-pred samples possible."""
    gt_list, pred_list, score_list, attrs_list = [], [], [], []
    n_preds_total = 0
    for _ in range(n_samples):
        ng = int(rng.integers(0, 5))
        npd = int(rng.integers(0, 7))
        n_preds_total += npd
        gt = np.zeros((ng, 9))
        gt[:, :2] = rng.uniform(-15, 15, (ng, 2))
        gt[:, 2] = rng.uniform(-1, 1, ng)
        gt[:, 3:6] = rng.uniform(0.5, 4.0, (ng, 3))
        gt[:, 6:8] = rng.uniform(-3, 3, (ng, 2))
        gt[:, 8] = rng.uniform(-np.pi, np.pi, ng)
        preds = np.zeros((npd, 9))
        for p in range(npd):
            if ng and rng.random() < 0.7:
                # offset from a random gt by a radius that lands below,
                # exactly AT, or above each matching threshold
                base = gt[int(rng.integers(0, ng))]
                r = float(rng.choice([0.05, 0.4, 0.5, 0.99, 1.0, 1.7,
                                      2.0, 3.5, 4.0, 5.5]))
                th = rng.uniform(0, 2 * np.pi)
                preds[p, 0] = base[0] + r * np.cos(th)
                preds[p, 1] = base[1] + r * np.sin(th)
            else:
                preds[p, :2] = rng.uniform(-15, 15, 2)
            preds[p, 2] = rng.uniform(-1, 1)
            preds[p, 3:6] = rng.uniform(0.5, 4.0, 3)
            preds[p, 6:8] = rng.uniform(-3, 3, 2)
            preds[p, 8] = rng.uniform(-np.pi, np.pi)
        gt_list.append(gt)
        pred_list.append(preds)
        attrs_list.append([str(rng.choice(ATTRS)) for _ in range(ng)])
        score_list.append(np.zeros(npd))
    # unique scores across the whole world (devkit tie order is undefined)
    scores = rng.permutation(n_preds_total) / max(n_preds_total, 1) \
        * 0.9 + 0.05
    k = 0
    for s in score_list:
        s[:] = scores[k:k + len(s)]
        k += len(s)
    return gt_list, pred_list, score_list, attrs_list


@pytest.mark.parametrize("cls", ["car", "barrier", "traffic_cone"])
def test_accumulate_matches_devkit_transcription_randomized(cls):
    rng = np.random.default_rng(hash(cls) % 2**32)
    for world in range(40):
        n_samples = int(rng.integers(1, 4))
        gt_l, pr_l, sc_l, at_l = make_world(rng, n_samples, cls)
        for th in NE.DIST_THS:
            want_ap, want_errs = devkit_accumulate_multi(
                gt_l, pr_l, sc_l, th, cls, at_l)
            md = NE.accumulate(gt_l, pr_l, sc_l, th, cls=cls,
                               gt_attrs=at_l)
            got_ap = NE.calc_ap(md) if md else 0.0
            np.testing.assert_allclose(
                got_ap, want_ap, atol=1e-12,
                err_msg=f"AP {cls} world={world} th={th}")
            for m in NE.TP_METRICS:
                got = NE.calc_tp(md, m) if md else 1.0
                np.testing.assert_allclose(
                    got, want_errs[m], atol=1e-12,
                    err_msg=f"{m} {cls} world={world} th={th}")


def test_nds_composition_randomized():
    """evaluate_nuscenes == devkit composition (class means, exclusion
    NaNs, the 1-min(1,err) clamp) on a random 3-class world."""
    rng = np.random.default_rng(7)
    classes = ("car", "barrier", "traffic_cone")
    gt_c, pr_c, sc_c, at_c = {}, {}, {}, {}
    for cls in classes:
        gt_c[cls], pr_c[cls], sc_c[cls], at_c[cls] = \
            make_world(rng, 3, cls)
    res = NE.evaluate_nuscenes(gt_c, pr_c, sc_c, class_names=classes,
                               attrs_by_class=at_c)

    want_aps, want_tp = {}, {c: {} for c in classes}
    for cls in classes:
        per_th = [devkit_accumulate_multi(gt_c[cls], pr_c[cls], sc_c[cls],
                                          th, cls, at_c[cls])
                  for th in NE.DIST_THS]
        want_aps[cls] = float(np.mean([ap for ap, _ in per_th]))
        errs_2m = per_th[NE.DIST_THS.index(2.0)][1]
        for m in NE.TP_METRICS:
            excluded = (cls in NE.NO_VEL and m in ("vel_err", "attr_err")) \
                or (cls in NE.NO_ORIENT and m == "orient_err")
            want_tp[cls][m] = np.nan if excluded else errs_2m[m]

    for cls in classes:
        np.testing.assert_allclose(res["class_aps"][cls], want_aps[cls],
                                   atol=1e-12)
        for m in NE.TP_METRICS:
            if np.isnan(want_tp[cls][m]):
                assert np.isnan(res["class_tps"][cls][m])
            else:
                np.testing.assert_allclose(res["class_tps"][cls][m],
                                           want_tp[cls][m], atol=1e-12)
    mean_ap = float(np.mean(list(want_aps.values())))
    mean_tp = {m: float(np.mean([want_tp[c][m] for c in classes
                                 if not np.isnan(want_tp[c][m])]))
               for m in NE.TP_METRICS}
    nds = (5 * mean_ap + sum(max(0.0, 1.0 - min(1.0, mean_tp[m]))
                             for m in NE.TP_METRICS)) / 10.0
    np.testing.assert_allclose(res["mean_ap"], mean_ap, atol=1e-12)
    np.testing.assert_allclose(res["nds"], nds, atol=1e-12)
