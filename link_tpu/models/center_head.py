"""CenterHead: CenterPoint multi-task detection head + losses + decode.

Reference: detection/det3d/models/bbox_heads/center_head.py:67-514 and
losses/centernet_loss.py:6-62. Six task groups over nuScenes classes; per
task a SepHead with branches reg(2)/height(1)/dim(3)/rot(2)/vel(2)/hm(C),
each branch = Conv3x3+BN+ReLU -> Conv3x3 (hm final bias -2.19). Loss =
FastFocal(hm) + weight * sum(code_weights * masked L1). Decode maps grid
peaks to metric boxes; NMS happens outside (ops/nms.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

HEAD_NORM = dict(epsilon=1e-5, momentum=0.9)


class HeadBranch(nn.Module):
    out_channels: int
    num_conv: int
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: Optional[float] = None
    bn_axis: Optional[str] = None
    dtype: str = "float32"     # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.dtype(self.dtype)
        h = x
        for i in range(self.num_conv - 1):
            h = nn.Conv(self.head_conv,
                        (self.final_kernel, self.final_kernel),
                        padding=self.final_kernel // 2, dtype=dt,
                        use_bias=True, name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             axis_name=self.bn_axis, **HEAD_NORM,
                             dtype=dt, name=f"bn{i}")(h)
            h = jax.nn.relu(h)
        bias_init = (nn.initializers.constant(self.init_bias)
                     if self.init_bias is not None else nn.initializers.zeros)
        h = nn.Conv(self.out_channels,
                    (self.final_kernel, self.final_kernel),
                    padding=self.final_kernel // 2, use_bias=True, dtype=dt,
                    bias_init=bias_init, name="final")(h)
        return h


class CenterHead(nn.Module):
    in_channels: int = 512
    tasks: Tuple[Tuple[str, ...], ...] = (
        ("car",), ("truck", "construction_vehicle"), ("bus", "trailer"),
        ("barrier",), ("motorcycle", "bicycle"),
        ("pedestrian", "traffic_cone"))
    common_heads: Tuple[Tuple[str, Tuple[int, int]], ...] = (
        ("reg", (2, 2)), ("height", (1, 2)), ("dim", (3, 2)),
        ("rot", (2, 2)), ("vel", (2, 2)))
    share_conv_channel: int = 64
    num_hm_conv: int = 2
    init_bias: float = -2.19
    weight: float = 0.25
    code_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2,
                                       0.2, 1.0, 1.0)
    bn_axis: Optional[str] = None
    # reference center_head.py:221-238: dcn_head=True swaps each task's
    # SepHead for a DCNSepHead (deformable feature adaption, final_kernel
    # 3). Off in every published LinK config (BASELINE.md).
    dcn_head: bool = False
    dtype: str = "float32"     # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> List[Dict[str, jnp.ndarray]]:
        """x: (B, C, H, W) -> per-task dicts of NHWC maps."""
        dt = jnp.dtype(self.dtype)
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(dt)
        h = nn.Conv(self.share_conv_channel, (3, 3), padding=1,
                    use_bias=True, dtype=dt, name="shared_conv")(h)
        h = nn.BatchNorm(use_running_average=not train,
                         axis_name=self.bn_axis, **HEAD_NORM,
                         dtype=dt, name="shared_bn")(h)
        h = jax.nn.relu(h)

        if self.dcn_head:
            from .dcn import DCNSepHead
            return [DCNSepHead(heads=self.common_heads,
                               num_cls=len(classes), bn_axis=self.bn_axis,
                               init_bias=self.init_bias, dtype=self.dtype,
                               name=f"task{t}_dcn")(h, train)
                    for t, classes in enumerate(self.tasks)]

        ret = []
        for t, classes in enumerate(self.tasks):
            out = {}
            for name, (ch, ncv) in self.common_heads:
                out[name] = HeadBranch(ch, ncv, bn_axis=self.bn_axis,
                                       dtype=self.dtype,
                                       name=f"task{t}_{name}")(h, train)
            out["hm"] = HeadBranch(len(classes), self.num_hm_conv,
                                   init_bias=self.init_bias,
                                   bn_axis=self.bn_axis, dtype=self.dtype,
                                   name=f"task{t}_hm")(h, train)
            ret.append(out)
        return ret


def _gather_feat(fmap: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """fmap (B, H*W, C), ind (B, M) -> (B, M, C)."""
    return jax.vmap(lambda f, i: f[i])(fmap, ind)


def fast_focal_loss(out, target, ind, mask, cat):
    """CornerNet focal loss (centernet_loss.py:26-54). out/target: (B, H, W,
    C) with out already sigmoid-clamped; ind/mask/cat: (B, M)."""
    gt = jnp.power(1 - target, 4)
    neg_loss = jnp.sum(jnp.log(1 - out) * jnp.square(out) * gt)

    b, h, w, c = out.shape
    flat = out.reshape(b, h * w, c)
    pos_pix = _gather_feat(flat, ind)                     # (B, M, C)
    pos_pred = jnp.take_along_axis(pos_pix, cat[..., None], axis=2)[..., 0]
    m = mask.astype(jnp.float32)
    num_pos = jnp.sum(m)
    pos_loss = jnp.sum(jnp.log(jnp.maximum(pos_pred, 1e-12))
                       * jnp.square(1 - pos_pred) * m)
    return jnp.where(num_pos == 0, -neg_loss,
                     -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def reg_loss(output, mask, ind, target):
    """Masked per-channel L1 (centernet_loss.py:6-24). output: (B, H, W, D);
    returns (D,) per-channel loss."""
    b, h, w, d = output.shape
    pred = _gather_feat(output.reshape(b, h * w, d), ind)  # (B, M, D)
    m = mask.astype(jnp.float32)[..., None]
    loss = jnp.abs(pred * m - target * m)
    loss = loss / (jnp.sum(m) + 1e-4)
    return jnp.sum(loss, axis=(0, 1))


def center_head_loss(preds: List[Dict], example: Dict, weight: float = 0.25,
                     code_weights=(1.0,) * 6 + (0.2, 0.2, 1.0, 1.0)):
    """center_head.py:252-293. example holds per-task stacked targets:
    hm[t] (B, H, W, C_t), anno_box[t] (B, M, 10), ind/mask/cat[t] (B, M)."""
    cw = jnp.asarray(code_weights)
    total = 0.0
    logs = {}
    for t, pd in enumerate(preds):
        hm = jnp.clip(jax.nn.sigmoid(pd["hm"]), 1e-4, 1 - 1e-4)
        hm_loss = fast_focal_loss(hm, example["hm"][t], example["ind"][t],
                                  example["mask"][t], example["cat"][t])
        anno = jnp.concatenate(
            [pd["reg"], pd["height"], pd["dim"], pd["vel"], pd["rot"]],
            axis=-1)
        box_loss = reg_loss(anno, example["mask"][t], example["ind"][t],
                            example["anno_box"][t])
        loc_loss = jnp.sum(box_loss * cw)
        total = total + hm_loss + weight * loc_loss
        logs[f"hm_loss_{t}"] = hm_loss
        logs[f"loc_loss_{t}"] = loc_loss
    logs["loss"] = total
    return total, logs


def double_flip_fuse(pd: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Fuse predictions from a batch ordered in groups of 4:
    [original, y-flip, x-flip, xy-flip] (center_head.py:320-416).

    Maps are NHWC. Flips: group 1 flips H (y), group 2 flips W (x), group 3
    both; regression offsets/vectors are sign-corrected, then all four are
    averaged."""
    out = {}
    b4, h, w, _ = pd["hm"].shape
    b = b4 // 4

    def regroup(v):
        v = v.reshape(b, 4, h, w, v.shape[-1])
        return jnp.stack([
            v[:, 0],
            jnp.flip(v[:, 1], axis=1),
            jnp.flip(v[:, 2], axis=2),
            jnp.flip(v[:, 3], axis=(1, 2)),
        ], axis=1)

    # hm averaged in probability space, dim in metric space
    # (center_head.py:345-355: sigmoid/exp applied before the flip means)
    hm = regroup(jax.nn.sigmoid(pd["hm"]))
    hei = regroup(pd["height"])
    dim = regroup(jnp.exp(pd["dim"]))
    out["hm"] = jnp.mean(hm, axis=1)
    out["height"] = jnp.mean(hei, axis=1)
    out["dim"] = jnp.mean(dim, axis=1)

    reg = regroup(pd["reg"])
    reg = reg.at[:, 1, ..., 1].set(1 - reg[:, 1, ..., 1])
    reg = reg.at[:, 2, ..., 0].set(1 - reg[:, 2, ..., 0])
    reg = reg.at[:, 3, ..., 0].set(1 - reg[:, 3, ..., 0])
    reg = reg.at[:, 3, ..., 1].set(1 - reg[:, 3, ..., 1])
    out["reg"] = jnp.mean(reg, axis=1)

    rot = regroup(pd["rot"])
    rots, rotc = rot[..., 0:1], rot[..., 1:2]
    rotc = rotc.at[:, 1].multiply(-1)
    rots = rots.at[:, 2].multiply(-1)
    rots = rots.at[:, 3].multiply(-1)
    rotc = rotc.at[:, 3].multiply(-1)
    out["rot"] = jnp.concatenate([jnp.mean(rots, 1), jnp.mean(rotc, 1)], -1)

    if "vel" in pd:
        vel = regroup(pd["vel"])
        vel = vel.at[:, 1, ..., 1].multiply(-1)
        vel = vel.at[:, 2, ..., 0].multiply(-1)
        vel = vel.at[:, 3].multiply(-1)
        out["vel"] = jnp.mean(vel, axis=1)
    return out


def decode_boxes(preds: List[Dict], test_cfg: Dict,
                 num_classes: Sequence[int], double_flip: bool = False):
    """center_head.py:296-446 decode (no NMS): per task returns
    (boxes (B, H*W, 9), scores (B, H*W), labels (B, H*W), mask (B, H*W)).
    Labels are offset to global class ids."""
    out = []
    pc_range = test_cfg["pc_range"]
    voxel_size = test_cfg["voxel_size"]
    osf = test_cfg["out_size_factor"]
    post_range = jnp.asarray(test_cfg["post_center_limit_range"])
    score_thr = test_cfg["score_threshold"]
    class_offset = 0
    # decode in f32 regardless of the model compute dtype: box centers /
    # exp(dim) / atan2 need the mantissa (bf16 quantizes 180-cell grid
    # coordinates to ~1 cell)
    preds = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), preds)
    for t, pd in enumerate(preds):
        if double_flip:
            pd = double_flip_fuse(pd)
            hm = pd["hm"]
            dim_map = pd["dim"]
        else:
            hm = jax.nn.sigmoid(pd["hm"])
            dim_map = jnp.exp(pd["dim"])
        b, h, w, c = hm.shape
        dim = dim_map.reshape(b, h * w, 3)
        rots = pd["rot"][..., 0:1].reshape(b, h * w, 1)
        rotc = pd["rot"][..., 1:2].reshape(b, h * w, 1)
        rot = jnp.arctan2(rots, rotc)
        reg = pd["reg"].reshape(b, h * w, 2)
        hei = pd["height"].reshape(b, h * w, 1)
        vel = pd["vel"].reshape(b, h * w, 2)
        hm_flat = hm.reshape(b, h * w, c)

        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        xs = xs.reshape(1, h * w, 1) + reg[:, :, 0:1]
        ys = ys.reshape(1, h * w, 1) + reg[:, :, 1:2]
        xs = xs * osf * voxel_size[0] + pc_range[0]
        ys = ys * osf * voxel_size[1] + pc_range[1]

        boxes = jnp.concatenate([xs, ys, hei, dim, vel, rot], axis=2)
        scores = jnp.max(hm_flat, axis=-1)
        labels = jnp.argmax(hm_flat, axis=-1) + class_offset
        in_range = (jnp.all(boxes[..., :3] >= post_range[:3], -1)
                    & jnp.all(boxes[..., :3] <= post_range[3:6], -1))
        mask = (scores > score_thr) & in_range
        out.append((boxes, scores, labels.astype(jnp.int32), mask))
        class_offset += num_classes[t]
    return out


def device_nms(task_outs, test_cfg: Dict, pre_max: Optional[int] = None):
    """On-device rotated NMS over decode_boxes outputs (SURVEY §7.8: the
    reference runs rotated NMS on-GPU, iou3d_nms_kernel.cu; this is the
    TPU equivalent — nothing leaves the device between backbone and
    boxes). Per task: top-k to `pre_max` candidates (the reference's
    nms_pre_max_size cap, box_torch_ops.rotate_nms_pcdet), masked O(K^2)
    suppression via ops.nms.rotate_nms_jax, keep capped at
    nms_post_max_size. Returns per task (boxes (B, K, 9), scores, labels,
    keep-mask) — same tuple contract as decode_boxes, with the mask now
    being the post-NMS keep."""
    from ..ops.nms import rotate_nms_jax

    # default to the config's pre-NMS cap (reference nms_pre_max_size,
    # rotate_nms_pcdet) so this path keeps parity with the host NMS;
    # pre_max is an optional EXTRA cap for latency-bound serving
    pre = int(test_cfg.get("nms_pre_max_size", 1000))
    if pre_max is not None:
        pre = min(pre_max, pre)
    post = int(test_cfg.get("nms_post_max_size", 83))
    th = float(test_cfg.get("nms_iou_threshold", 0.2))
    out = []
    for boxes, scores, labels, mask in task_outs:
        b_, n_, _ = boxes.shape
        k = min(pre, n_)
        sc = jnp.where(mask, scores, -jnp.inf)
        top_sc, top_idx = jax.lax.top_k(sc, k)
        bx = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
        lb = jnp.take_along_axis(labels, top_idx, axis=1)
        vm = jnp.take_along_axis(mask, top_idx, axis=1)
        keeps, scs = [], []
        for bi in range(b_):                    # B is static (1 serving)
            bev = bx[bi][:, [0, 1, 3, 4, 8]]
            keeps.append(rotate_nms_jax(bev, top_sc[bi], vm[bi], th, post))
            scs.append(jnp.where(vm[bi], top_sc[bi], 0.0))
        out.append((bx, jnp.stack(scs), lb, jnp.stack(keeps)))
    return out
