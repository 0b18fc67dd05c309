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
    """fmap (H, W, C); sample at float (xs, ys) in grid units."""
    h, w, _ = fmap.shape
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
    dx = jnp.clip(xs - x0, 0.0, 1.0)[:, None]
    dy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    f00 = fmap[y0, x0]
    f01 = fmap[y0, x0 + 1]
    f10 = fmap[y0 + 1, x0]
    f11 = fmap[y0 + 1, x0 + 1]
    return (f00 * (1 - dx) * (1 - dy) + f01 * dx * (1 - dy)
            + f10 * (1 - dx) * dy + f11 * dx * dy)


def box_sample_points(boxes: jnp.ndarray, num_point: int = 5) -> jnp.ndarray:
    """(N, >=7) boxes [x y z w l h .. r] -> (num_point*N, 3) sample points:
    center + 4 BEV edge midpoints (two_stage.py:51-76)."""
    if num_point == 1:
        return boxes[:, :3]
    cx, cy, z = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    hw, hl = boxes[:, 3] / 2, boxes[:, 4] / 2
    r = boxes[:, -1]
    c, s = jnp.cos(r), jnp.sin(r)

    def mid(dx, dy):
        return jnp.stack([cx + dx * c - dy * s, cy + dx * s + dy * c, z], 1)

    return jnp.concatenate([
        boxes[:, :3], mid(hw, 0 * hw), mid(-hw, 0 * hw),
        mid(0 * hw, hl), mid(0 * hw, -hl)], axis=0)


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
    """roi_head.py:17: shared FC stack -> iou-confidence + box refinement
    branches over per-roi feature vectors."""

    input_channels: int
    code_size: int = 9
    shared_fc: Tuple[int, ...] = (256, 256)
    dropout: float = 0.3

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray, train: bool = False):
        h = roi_feats
        cin = self.input_channels
        for i, c in enumerate(self.shared_fc):
            h = Linear(cin, c, name=f"shared{i}")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             name=f"shared{i}_bn")(h)
            h = jax.nn.relu(h)
            cin = c
        iou = Linear(cin, 1, name="cls")(h)[:, 0]
        reg = Linear(cin, self.code_size, name="reg")(h)
        return iou, reg


def second_stage_score(iou_logits: jnp.ndarray,
                       first_scores: jnp.ndarray) -> jnp.ndarray:
    """two_stage.py:139: sqrt(sigmoid(iou) * roi_score)."""
    return jnp.sqrt(jax.nn.sigmoid(iou_logits) * first_scores)


def roi_losses(iou_logits: jnp.ndarray, reg: jnp.ndarray,
               rois: jnp.ndarray, gt_iou: jnp.ndarray,
               reg_targets: jnp.ndarray, reg_mask: jnp.ndarray):
    """RoI losses (roi_head train path): binary-CE on the IoU score
    (targets = clipped/scaled best-gt IoU) + masked smooth-L1 on the box
    residuals."""
    cls_t = jnp.clip(2 * gt_iou - 0.5, 0.0, 1.0)
    cls_loss = jnp.mean(
        jnp.maximum(iou_logits, 0) - iou_logits * cls_t
        + jnp.log1p(jnp.exp(-jnp.abs(iou_logits))))
    diff = (reg - reg_targets) * reg_mask[:, None]
    sm = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff ** 2,
                   jnp.abs(diff) - 0.5)
    reg_loss = jnp.sum(sm) / jnp.maximum(jnp.sum(reg_mask), 1.0)
    return cls_loss, reg_loss
