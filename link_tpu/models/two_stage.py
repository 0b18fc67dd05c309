"""Two-stage refinement (CenterPoint2-style), optional in the reference
and OFF in the published LinK configs.

Reference: detection/det3d/models/detectors/two_stage.py:9-156,
second_stage/bird_eye_view.py:10-60, roi_heads/roi_head.py:17. First-stage
proposals (post-NMS, fixed NMS_POST_MAXSIZE) are described by BEV features
bilinearly sampled at 5 box points (center + 4 edge midpoints), then an
MLP RoI head predicts an IoU-style confidence and a box refinement; final
score = sqrt(sigmoid(iou) * first_stage_score).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.modules import Linear


def bilinear_interpolate(fmap: jnp.ndarray, xs: jnp.ndarray,
                         ys: jnp.ndarray) -> jnp.ndarray:
    """fmap (H, W, C); sample at float (xs, ys) in grid units.

    Reference-exact boundary semantics (center_utils.py
    bilinear_interpolate_torch: weights computed from the CLAMPED
    integer corners): a point fully outside the map contributes ZERO —
    the two clamped-equal corners get weights that cancel — rather than
    sampling the edge pixel. Production-relevant: decode's
    post_center_limit_range (±61.2 m) exceeds the ±54 m BEV map, so
    near-range-edge proposals do sample off-map points.
    Golden-pinned in tests/test_golden_det_dense.py."""
    h, w, _ = fmap.shape
    xf = jnp.floor(xs)
    yf = jnp.floor(ys)
    x0 = jnp.clip(xf.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(xf.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(yf.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(yf.astype(jnp.int32) + 1, 0, h - 1)
    wa = ((x1 - xs) * (y1 - ys))[:, None]
    wb = ((x1 - xs) * (ys - y0))[:, None]
    wc = ((xs - x0) * (y1 - ys))[:, None]
    wd = ((xs - x0) * (ys - y0))[:, None]
    return (fmap[y0, x0] * wa + fmap[y1, x0] * wb
            + fmap[y0, x1] * wc + fmap[y1, x1] * wd)


def box_sample_points(boxes: jnp.ndarray, num_point: int = 5) -> jnp.ndarray:
    """(N, >=7) boxes [x y z w l h .. r] -> (num_point*N, 3) sample points:
    center + 4 BEV edge midpoints (two_stage.py:51-76). The midpoints use
    the reference rotation sense — corner midpoints of
    center_to_corner_box2d's rotation_2d (row-vector [[c,-s],[s,c]]:
    (dx, dy) -> (dx·c + dy·s, -dx·s + dy·c)) — and the reference order
    front (c0+c1 = (-w/2, 0)), back, left (0, -l/2), right.
    Golden-pinned in tests/test_golden_det_dense.py."""
    if num_point == 1:
        return boxes[:, :3]
    cx, cy, z = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    hw, hl = boxes[:, 3] / 2, boxes[:, 4] / 2
    r = boxes[:, -1]
    c, s = jnp.cos(r), jnp.sin(r)

    def mid(dx, dy):
        return jnp.stack([cx + dx * c + dy * s, cy - dx * s + dy * c, z], 1)

    zero = 0 * hw
    return jnp.concatenate([
        boxes[:, :3], mid(-hw, zero), mid(hw, zero),
        mid(zero, -hl), mid(zero, hl)], axis=0)


class BEVFeatureExtractor(nn.Module):
    """bird_eye_view.py:10-60."""

    pc_start: Tuple[float, float] = (-54.0, -54.0)
    voxel_size: Tuple[float, float] = (0.075, 0.075)
    out_stride: int = 8

    @nn.compact
    def __call__(self, bev_nhwc: jnp.ndarray, centers: jnp.ndarray,
                 num_point: int = 5) -> jnp.ndarray:
        """bev_nhwc (H, W, C) one sample; centers (P*N, 3)."""
        xs = (centers[:, 0] - self.pc_start[0]) / self.voxel_size[0] \
            / self.out_stride
        ys = (centers[:, 1] - self.pc_start[1]) / self.voxel_size[1] \
            / self.out_stride
        feats = bilinear_interpolate(bev_nhwc, xs, ys)
        if num_point > 1:
            n = feats.shape[0] // num_point
            feats = jnp.concatenate(
                [feats[i * n:(i + 1) * n] for i in range(num_point)], axis=1)
        return feats                                  # (N, C*num_point)


class RoIHead(nn.Module):
    """roi_head.py:17-69: shared FC stack (Conv1d(k=1)+BN+ReLU per layer)
    -> separate CLS_FC / REG_FC stacks ending in linear iou-confidence and
    box-refinement outputs, over per-roi feature vectors. Config defaults
    from the reference two-stage configs (SHARED_FC/CLS_FC/REG_FC
    [256,256], DP_RATIO 0.3 — dropout omitted: inference parity is exact
    and training regularization is config-tunable)."""

    input_channels: int
    code_size: int = 9
    shared_fc: Tuple[int, ...] = (256, 256)
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray, train: bool = False):
        def stack(h, cin, widths, prefix):
            for i, c in enumerate(widths):
                h = Linear(cin, c, use_bias=False, name=f"{prefix}{i}")(h)
                # torch BatchNorm1d defaults (roi_head.py:31,
                # roi_head_template.py:33): eps 1e-5, momentum 0.1
                # (flax decay 0.9) — golden-pinned vs the reference
                # RoIHead in tests/test_golden_det_dense.py
                h = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f"{prefix}{i}_bn")(h)
                h = jax.nn.relu(h)
                cin = c
            return h, cin

        h, cin = stack(roi_feats, self.input_channels, self.shared_fc,
                       "shared")
        hc, cc = stack(h, cin, self.cls_fc, "cls_fc")
        hr, cr = stack(h, cin, self.reg_fc, "reg_fc")
        iou = Linear(cc, 1, name="cls")(hc)[:, 0]
        reg = Linear(cr, self.code_size, name="reg")(hr)
        return iou, reg


def second_stage_score(iou_logits: jnp.ndarray,
                       first_scores: jnp.ndarray) -> jnp.ndarray:
    """two_stage.py:139: sqrt(sigmoid(iou) * roi_score)."""
    return jnp.sqrt(jax.nn.sigmoid(iou_logits) * first_scores)


# --------------------------------------------------------------------------
# Proposal-target assignment (host-side NumPy).
#
# Reference: roi_heads/target_assigner/proposal_target_layer.py:14-181 +
# roi_head_template.py:43-86 (canonical-frame residual targets). Like NMS,
# this is tiny (<=500 rois) control-heavy sampling logic — host NumPy is
# the right tier; only the RoI-head MLP runs on device.
# --------------------------------------------------------------------------

# reference two-stage config (configs/waymo/voxelnet/two_stage/*.py:63-92)
ROI_SAMPLER_DEFAULTS = dict(
    ROI_PER_IMAGE=128, FG_RATIO=0.5, CLS_SCORE_TYPE="roi_iou",
    CLS_FG_THRESH=0.75, CLS_BG_THRESH=0.25, CLS_BG_THRESH_LO=0.1,
    HARD_BG_RATIO=0.8, REG_FG_THRESH=0.55)


def reorder_to_roi_layout(boxes_det3d: "np.ndarray") -> "np.ndarray":
    """[x y z w l h vx vy r] -> roi layout [x y z w l h r vx vy]
    (two_stage.py:107: rotation moved to position 6)."""
    return boxes_det3d[:, [0, 1, 2, 3, 4, 5, 8, 6, 7]]


def roi_layout_to_det3d(boxes_roi: "np.ndarray"):
    """Inverse of reorder_to_roi_layout (two_stage.py post_process:
    [0,1,2,3,4,5,7,8,6])."""
    return boxes_roi[..., [0, 1, 2, 3, 4, 5, 7, 8, 6]]


def _rotate_rows_z(rows, angle):
    """Reference box_torch_ops.rotate_points_along_z (row form, det3d
    sense): rotates rows[:, :2] by `angle` per row."""
    import numpy as np
    c, s = np.cos(angle), np.sin(angle)
    x = rows[:, 0] * c + rows[:, 1] * s
    y = -rows[:, 0] * s + rows[:, 1] * c
    out = rows.copy()
    out[:, 0], out[:, 1] = x, y
    return out


def _subsample_rois(max_overlaps, cfg, rng):
    """proposal_target_layer.subsample_rois:137-180."""
    import numpy as np
    n_roi = cfg["ROI_PER_IMAGE"]
    fg_per_image = int(np.round(cfg["FG_RATIO"] * n_roi))
    fg_thresh = min(cfg["REG_FG_THRESH"], cfg["CLS_FG_THRESH"])
    fg = np.flatnonzero(max_overlaps >= fg_thresh)
    easy_bg = np.flatnonzero(max_overlaps < cfg["CLS_BG_THRESH_LO"])
    hard_bg = np.flatnonzero((max_overlaps < cfg["REG_FG_THRESH"])
                             & (max_overlaps >= cfg["CLS_BG_THRESH_LO"]))

    def sample_bg(k):
        if len(hard_bg) and len(easy_bg):
            nh = min(int(k * cfg["HARD_BG_RATIO"]), len(hard_bg))
            ne = k - nh
            return np.concatenate([
                hard_bg[rng.integers(0, len(hard_bg), nh)],
                easy_bg[rng.integers(0, len(easy_bg), ne)]])
        pool = hard_bg if len(hard_bg) else easy_bg
        return pool[rng.integers(0, len(pool), k)]

    if len(fg) and (len(easy_bg) + len(hard_bg)):
        nf = min(fg_per_image, len(fg))
        fg = fg[rng.permutation(len(fg))[:nf]]
        bg = sample_bg(n_roi - nf)
        return np.concatenate([fg, bg])
    if len(fg):
        return fg[np.floor(rng.random(n_roi) * len(fg)).astype(int)]
    if len(easy_bg) + len(hard_bg):
        return sample_bg(n_roi)
    return np.zeros(0, np.int64)


def assign_roi_targets(rois, roi_scores, roi_labels, gt_boxes, gt_classes,
                       rng, cfg=None):
    """One sample's proposal-target assignment + canonical residual
    targets. rois (N, 9) in ROI layout [x y z w l h r vx vy]; gt_boxes
    (M, 9) det3d layout. Returns dict of fixed-(ROI_PER_IMAGE) arrays:
    rois, sampled_inds (into the input rois, for gathering features),
    roi_scores, roi_labels, gt_of_rois (canonical targets, code_size 9),
    gt_iou, reg_mask, cls_labels."""
    import numpy as np
    from ..ops.box_np import boxes_iou3d, limit_period

    cfg = {**ROI_SAMPLER_DEFAULTS, **(cfg or {})}
    n_out = cfg["ROI_PER_IMAGE"]
    gt_roi = reorder_to_roi_layout(np.asarray(gt_boxes, np.float64)) \
        if len(gt_boxes) else np.zeros((1, 9))

    if len(rois):
        iou = boxes_iou3d(rois[:, :7], gt_roi[:, :7])      # (N, M)
        max_overlaps = iou.max(axis=1) if iou.shape[1] else \
            np.zeros(len(rois))
        gt_assign = iou.argmax(axis=1) if iou.shape[1] else \
            np.zeros(len(rois), np.int64)
        sampled = _subsample_rois(max_overlaps, cfg, rng)
    else:
        sampled = np.zeros(0, np.int64)
        max_overlaps = np.zeros(0)
        gt_assign = np.zeros(0, np.int64)

    out = {
        "rois": np.zeros((n_out, 9), np.float32),
        "sampled_inds": np.zeros(n_out, np.int64),
        "roi_scores": np.zeros(n_out, np.float32),
        "roi_labels": np.zeros(n_out, np.int64),
        "gt_of_rois": np.zeros((n_out, 9), np.float32),
        "gt_iou": np.zeros(n_out, np.float32),
        "reg_mask": np.zeros(n_out, np.float32),
        "cls_labels": np.full(n_out, -1.0, np.float32),
    }
    k = min(len(sampled), n_out)
    if k == 0:
        return out
    sel = sampled[:k]
    r = rois[sel]
    ious = max_overlaps[sel]
    gts = gt_roi[gt_assign[sel]]

    # canonical residuals (roi_head_template.py:52-84)
    roi_ry = limit_period(r[:, 6], offset=0.5, period=2 * np.pi)
    tgt = gts.copy()
    tgt[:, :6] -= r[:, :6]
    tgt[:, 6] -= roi_ry
    tgt = _rotate_rows_z(tgt, -roi_ry)
    tgt[:, 7:9] -= r[:, 7:9]
    heading = tgt[:, 6] % (2 * np.pi)
    opp = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading[opp] = (heading[opp] + np.pi) % (2 * np.pi)
    heading = np.where(heading > np.pi, heading - 2 * np.pi, heading)
    tgt[:, 6] = np.clip(heading, -np.pi / 2, np.pi / 2)

    # roi_iou soft classification labels (proposal_target_layer.py:51-64)
    fg = ious > cfg["CLS_FG_THRESH"]
    bg = ious < cfg["CLS_BG_THRESH"]
    soft = (ious - cfg["CLS_BG_THRESH"]) / (cfg["CLS_FG_THRESH"]
                                            - cfg["CLS_BG_THRESH"])
    cls_labels = np.where(fg, 1.0, np.where(bg, 0.0, soft))

    out["rois"][:k] = r
    out["sampled_inds"][:k] = sel
    out["roi_scores"][:k] = roi_scores[sel]
    out["roi_labels"][:k] = roi_labels[sel] + 1
    out["gt_of_rois"][:k] = tgt
    out["gt_iou"][:k] = ious
    out["reg_mask"][:k] = (ious > cfg["REG_FG_THRESH"]).astype(np.float32)
    out["cls_labels"][:k] = cls_labels
    return out


def generate_refined_boxes(rois: jnp.ndarray,
                           reg: jnp.ndarray) -> jnp.ndarray:
    """Canonical refinement -> world boxes (roi_head_template.py:
    generate_predicted_boxes:157-183). rois/reg (R, 9) in ROI layout."""
    roi_ry = rois[:, 6]
    local = rois.at[:, 0:3].set(0.0)
    pred = reg + local
    c, s = jnp.cos(roi_ry), jnp.sin(roi_ry)
    # exact inverse of the canonical rotation f_{-ry} used in
    # assign_roi_targets (_rotate_rows_z): f_{+ry}
    x = pred[:, 0] * c + pred[:, 1] * s
    y = -pred[:, 0] * s + pred[:, 1] * c
    pred = pred.at[:, 0].set(x + rois[:, 0])
    pred = pred.at[:, 1].set(y + rois[:, 1])
    pred = pred.at[:, 2].add(rois[:, 2])
    return pred


def roi_losses(iou_logits: jnp.ndarray, reg: jnp.ndarray,
               cls_labels: jnp.ndarray, reg_targets: jnp.ndarray,
               reg_mask: jnp.ndarray,
               code_weights: Sequence[float] = (1.0,) * 9,
               cls_weight: float = 1.0, reg_weight: float = 1.0):
    """RoI losses (roi_head_template.py:88-147): binary-CE on the iou
    confidence against the soft roi_iou labels (entries with label -1
    masked out), and code-weighted L1 on the canonical residuals,
    normalized by the foreground count."""
    valid = (cls_labels >= 0).astype(jnp.float32)
    t = jnp.clip(cls_labels, 0.0, 1.0)
    bce = (jnp.maximum(iou_logits, 0) - iou_logits * t
           + jnp.log1p(jnp.exp(-jnp.abs(iou_logits))))
    cls_loss = jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    cw = jnp.asarray(code_weights, reg.dtype)
    l1 = jnp.abs(reg - reg_targets) * cw
    reg_loss = jnp.sum(l1 * reg_mask[:, None]) \
        / jnp.maximum(jnp.sum(reg_mask), 1.0)
    return cls_weight * cls_loss, reg_weight * reg_loss


class TwoStageRefinement(nn.Module):
    """Second stage: BEV 5-point feature pooling + RoI head, composing
    the reference TwoStageDetector's per-batch flow (two_stage.py:159-199)
    after the host-side NMS/proposal step. Operates on ONE sample's BEV
    map and its fixed-size padded proposal set."""

    bev_channels: int
    num_point: int = 5
    code_size: int = 9
    add_box_param: bool = True
    pc_start: Tuple[float, float] = (-54.0, -54.0)
    voxel_size: Tuple[float, float] = (0.075, 0.075)
    out_stride: int = 8

    @nn.compact
    def __call__(self, bev_nhwc: jnp.ndarray, rois: jnp.ndarray,
                 roi_scores: jnp.ndarray, train: bool = False):
        """bev_nhwc (H, W, C); rois (R, 9) ROI layout; roi_scores (R,).
        Returns (iou_logits (R,), reg (R, code_size))."""
        centers = box_sample_points(rois[:, [0, 1, 2, 3, 4, 5, 6]],
                                    self.num_point)
        feats = BEVFeatureExtractor(
            pc_start=self.pc_start, voxel_size=self.voxel_size,
            out_stride=self.out_stride, name="bev_extractor")(
                bev_nhwc, centers, self.num_point)
        cin = self.bev_channels * self.num_point
        if self.add_box_param:   # roi_head.py:85 add_box_param
            feats = jnp.concatenate(
                [feats, rois, roi_scores[:, None]], axis=1)
            cin += rois.shape[1] + 1
        return RoIHead(input_channels=cin, code_size=self.code_size,
                       name="roi_head")(feats, train)
