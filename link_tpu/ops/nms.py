"""NMS: host rotated NMS + jittable circle NMS.

Reference: detection/det3d/ops/iou3d_nms (CUDA bitmask rotated NMS, used
via box_torch_ops.rotate_nms_pcdet at core/bbox/box_torch_ops.py:248-276)
and core/utils/circle_nms_jit.py:5-28 (numba center-distance NMS).

The rotated variant runs host-side on the (<= nms_pre_max_size) decoded
candidates — the same split as the reference (decode on device, NMS
kernel). circle NMS additionally has an on-device jittable form.
"""

from __future__ import annotations

import numpy as np

from .box_np import center_to_corner_box2d, rotated_box_overlap


def rotate_nms_pcdet(boxes: np.ndarray, scores: np.ndarray,
                     thresh: float, pre_maxsize: int = None,
                     post_max_size: int = None) -> np.ndarray:
    """boxes (N, 7) [x y z w l h r] (pcdet convention — rotate_nms_pcdet
    transforms then calls nms_gpu; overlap is BEV rotated IoU). Returns kept
    indices into the input order. Uses the native C++ kernel when built
    (link_tpu/native/nms.cpp), NumPy otherwise."""
    order = np.argsort(-scores, kind="stable")
    if pre_maxsize is not None:
        order = order[:pre_maxsize]

    from .. import native
    if native.available() and len(order):
        kept = native.rotate_nms_sorted(boxes[order], float(thresh),
                                        post_max_size or 0)
        return order[kept]

    b = boxes[order]
    n = len(b)
    if n == 0:
        return np.zeros((0,), np.int64)
    corners = center_to_corner_box2d(b[:, :2], b[:, 3:5], b[:, 6])
    areas = b[:, 3] * b[:, 4]
    rad = 0.5 * np.hypot(b[:, 3], b[:, 4])
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        if post_max_size is not None and len(keep) >= post_max_size:
            break
        d = np.hypot(b[i + 1:, 0] - b[i, 0], b[i + 1:, 1] - b[i, 1])
        cand = np.flatnonzero((d <= rad[i] + rad[i + 1:])
                              & ~suppressed[i + 1:]) + i + 1
        for j in cand:
            inter = rotated_box_overlap(corners[i], corners[j])
            union = areas[i] + areas[j] - inter
            if union > 0 and inter / union > thresh:
                suppressed[j] = True
    return order[np.asarray(keep, np.int64)]


def circle_nms(boxes: np.ndarray, thresh: float,
               post_max_size: int = 83) -> np.ndarray:
    """Center-distance NMS (circle_nms_jit.py:5-28). boxes (N, 3):
    [x, y, score], assumed score-sorted descending."""
    n = len(boxes)
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(i)
        dx = boxes[i + 1:, 0] - boxes[i, 0]
        dy = boxes[i + 1:, 1] - boxes[i, 1]
        suppressed[i + 1:] |= (dx * dx + dy * dy) < thresh
    return np.asarray(keep[:post_max_size], np.int64)


def circle_nms_jax(xy, scores, valid, min_radius: float, max_keep: int):
    """On-device circle NMS over fixed-size candidate sets: returns a keep
    mask. O(N^2) masked suppression sweep — jit/TPU friendly (no dynamic
    shapes)."""
    import jax
    import jax.numpy as jnp

    n = xy.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    xy_s = xy[order]
    valid_s = valid[order]
    d2 = jnp.sum((xy_s[:, None, :] - xy_s[None, :, :]) ** 2, -1)
    close = (d2 < min_radius) & valid_s[None, :] & valid_s[:, None]

    def body(i, supp):
        alive = ~supp[i]
        newly = close[i] & (jnp.arange(n) > i) & alive
        return supp | newly

    suppressed = jax.lax.fori_loop(0, n, body, ~valid_s)
    keep_sorted = ~suppressed & valid_s
    # cap at max_keep
    rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
    keep_sorted = keep_sorted & (rank < max_keep)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep
