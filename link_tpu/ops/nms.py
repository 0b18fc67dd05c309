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


def _corners_bev_jax(boxes):
    """jnp twin of box_np.center_to_corner_box2d for (N, 5) [x y w l r]."""
    import jax.numpy as jnp
    centers, dims, angles = boxes[:, :2], boxes[:, 2:4], boxes[:, 4]
    tmpl = jnp.asarray([[-1, -1], [1, -1], [1, 1], [-1, 1]],
                       boxes.dtype) * 0.5
    corners = tmpl[None, :, :] * dims[:, None, :]           # (N, 4, 2)
    c, s = jnp.cos(angles), jnp.sin(angles)
    rot = jnp.stack([jnp.stack([c, s], -1),
                     jnp.stack([-s, c], -1)], axis=1)       # R(-angle)
    return jnp.einsum("nij,nkj->nki", rot, corners) + centers[:, None, :]


def rotated_iou_bev_jax(boxes):
    """All-pairs rotated BEV IoU of (N, 5) [x y w l r] boxes, on device.

    Exact rectangle-intersection area without sequential clipping (TPU
    has no per-pair control flow): the intersection of two convex quads
    is the convex hull of <= 24 CANDIDATE VERTICES — corners of A inside
    B, corners of B inside A, and the 16 edge-pair crossings. Candidates
    are computed vectorized for all N^2 pairs, hull order comes from an
    angle sort around the candidate centroid (valid candidates of a
    convex region are in convex position), and the area from a masked
    shoelace. Replaces the reference's per-pair polygon clipping loops
    (det3d/ops/iou3d_nms/src/iou3d_nms_kernel.cu inter() / box_overlap).
    """
    import jax.numpy as jnp

    n = boxes.shape[0]
    co = _corners_bev_jax(boxes)                            # (N, 4, 2)
    area = boxes[:, 2] * boxes[:, 3]

    def cross(o, a, b):
        return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
                - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))

    # corners-in-other-box tests: corner P of A is inside B iff it is
    # left of all 4 CCW edges of B
    ca = co[:, None, :, None, :]                            # (N,1,4,1,2)
    eb0 = co[None, :, None, :, :]                           # (1,N,1,4,2)
    eb1 = jnp.roll(co, -1, axis=1)[None, :, None, :, :]
    in_ab = jnp.all(cross(eb0, eb1, ca) >= -1e-6, axis=-1)  # (N,N,4)
    cb = co[None, :, None, :, :].swapaxes(2, 3)             # (1,N,4,1,2)
    ea0 = co[:, None, None, :, :]
    ea1 = jnp.roll(co, -1, axis=1)[:, None, None, :, :]
    in_ba = jnp.all(cross(ea0, ea1, cb) >= -1e-6, axis=-1)  # (N,N,4)

    # edge-edge crossings: segment (a0, a1) x (b0, b1) for all 4x4 pairs
    a0 = co[:, None, :, None, :]
    a1 = jnp.roll(co, -1, axis=1)[:, None, :, None, :]
    b0 = co[None, :, None, :, :]
    b1 = jnp.roll(co, -1, axis=1)[None, :, None, :, :]
    d1 = a1 - a0
    d2 = b1 - b0
    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]
    db = b0 - a0
    t = (db[..., 0] * d2[..., 1] - db[..., 1] * d2[..., 0]) \
        / jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    u = (db[..., 0] * d1[..., 1] - db[..., 1] * d1[..., 0]) \
        / jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    ok = ((jnp.abs(denom) >= 1e-9) & (t >= 0) & (t <= 1)
          & (u >= 0) & (u <= 1))                            # (N,N,4,4)
    px = a0 + t[..., None] * d1                             # (N,N,4,4,2)

    pts = jnp.concatenate([
        jnp.broadcast_to(co[:, None], (n, n, 4, 2)),
        jnp.broadcast_to(co[None, :], (n, n, 4, 2)),
        px.reshape(n, n, 16, 2),
    ], axis=2)                                              # (N,N,24,2)
    msk = jnp.concatenate([in_ab, in_ba, ok.reshape(n, n, 16)], axis=2)

    k = jnp.sum(msk.astype(jnp.int32), axis=-1)             # (N,N)
    cnt = jnp.maximum(k, 1).astype(boxes.dtype)
    ctr = (jnp.sum(jnp.where(msk[..., None], pts, 0.0), axis=2)
           / cnt[..., None])                                # (N,N,2)
    ang = jnp.arctan2(pts[..., 1] - ctr[..., None, 1],
                      pts[..., 0] - ctr[..., None, 0])
    ang = jnp.where(msk, ang, jnp.inf)                      # invalid last
    order = jnp.argsort(ang, axis=-1)
    sp = jnp.take_along_axis(pts, order[..., None], axis=2)  # sorted pts
    idx = jnp.arange(24, dtype=jnp.int32)
    nxt = jnp.where(idx[None, None, :] == k[..., None] - 1, 0,
                    idx[None, None, :] + 1)
    sn = jnp.take_along_axis(sp, nxt[..., None], axis=2)
    contrib = (sp[..., 0] * sn[..., 1] - sn[..., 0] * sp[..., 1])
    contrib = jnp.where(idx[None, None, :] < k[..., None], contrib, 0.0)
    inter = 0.5 * jnp.abs(jnp.sum(contrib, axis=-1))
    inter = jnp.where(k >= 3, inter, 0.0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def rotate_nms_jax(boxes, scores, valid, thresh: float, max_keep: int):
    """On-device rotated NMS over a fixed-size candidate set (SURVEY §7.8:
    the reference runs rotated NMS on-GPU, iou3d_nms_kernel.cu nms_gpu).

    boxes (N, 5) [x y w l r] pcdet BEV layout, scores (N,), valid (N,)
    mask. Returns a keep mask in INPUT order (at most max_keep kept,
    score-descending priority) — numerically equivalent to
    rotate_nms_pcdet over the valid rows."""
    import jax
    import jax.numpy as jnp

    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b_s = boxes[order]
    valid_s = valid[order]
    iou = rotated_iou_bev_jax(b_s)
    over = (iou > thresh) & valid_s[None, :] & valid_s[:, None]

    def body(i, supp):
        alive = ~supp[i]
        newly = over[i] & (jnp.arange(n) > i) & alive
        return supp | newly

    suppressed = jax.lax.fori_loop(0, n, body, ~valid_s)
    keep_sorted = ~suppressed & valid_s
    rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
    keep_sorted = keep_sorted & (rank < max_keep)
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


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
