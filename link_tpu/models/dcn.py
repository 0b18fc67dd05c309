"""Deformable convolution (DCN v1) + DCNSepHead, TPU-native.

Reference semantics: detection/det3d/models/bbox_heads/center_head.py:27-66
(FeatureAdaption: offsets from a zero-init 1x1 conv, DCN v1 with 4
deformable groups, ReLU) and :114-162 (DCNSepHead: separate adapted
features for the heatmap and regression branches); sampling rules from
det3d/ops/dcn/src/deform_conv_cuda_kernel.cu (bilinear interpolation, a
sample contributes only where its corner lies inside the map — implicit
zero padding; `deformable_group` partitions the INPUT channels, each
partition reading its own offset field).

The reference is a 2,468-LoC CUDA im2col + GEMM. The TPU shape of the same
op needs none of that: K static taps, each tap a bilinear sample of the
(flattened) BEV map — four corner gathers per deformable group, with the
two x-adjacent corners fetched from one 2-wide shifted-window row so a
sample costs two descriptor-plateau gathers, not four — followed by one
(C, Co) matmul on the MXU per tap. Offset/feature/weight gradients come
from plain autodiff (the bilinear weights are differentiable in the
offsets, matching deform_conv_cuda_kernel.cu's analytic coordinate
gradient).

Every published LinK config runs `dcn_head=False` (BASELINE.md recipes);
this head exists for non-LinK CenterPoint configs that enable it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .center_head import HEAD_NORM, HeadBranch


def _bilinear_sample_k(xwg: jnp.ndarray, ly: jnp.ndarray, lx: jnp.ndarray,
                       h: int, w: int) -> jnp.ndarray:
    """Bilinear sample of one deformable group's channels at all K taps.

    `xwg` (B, H*W, 2*Cg) is the group's slice of the 2-wide window table:
    row p holds map rows p and p+1 side by side, so the (x0, x0+1) corner
    pair of one sample is a single gathered row — two gathers total for
    the four corners. `ly`/`lx` are (B, H*W, K) fractional coordinates.
    Corners outside the map contribute zero
    (deform_conv_cuda_kernel.cu's `h_im > -1 && h_im < height` guard).
    Returns (B, H*W, K, Cg) in f32.
    """
    b, m, k = ly.shape
    cg = xwg.shape[2] // 2
    y0 = jnp.floor(ly)
    x0 = jnp.floor(lx)
    wy = (ly - y0)[..., None]                       # weight of y0+1
    wx = (lx - x0)[..., None]                       # weight of x0+1
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    xv0 = (x0i >= 0) & (x0i <= w - 1)
    xv1 = (x0i + 1 >= 0) & (x0i + 1 <= w - 1)
    # row-start column: the gathered window holds map columns (xc, xc+1).
    # For x0 >= 0 that is (x0, x0+1); for x0 = -1 it clamps to (0, 1), so
    # the still-valid x0+1 = 0 corner lives in the FIRST half.
    xc = jnp.clip(x0i, 0, w - 1)
    x1_in_p0 = (x0i < 0)[..., None]

    out = jnp.zeros((b, m, k, cg), jnp.float32)
    for dy, wrow in ((0, 1.0 - wy), (1, wy)):
        yy = y0i + dy
        yv = (yy >= 0) & (yy <= h - 1)
        idx = (jnp.clip(yy, 0, h - 1) * w + xc).reshape(b, m * k, 1)
        rows = jnp.take_along_axis(xwg, idx, axis=1)   # (B, M*K, 2Cg)
        rows = rows.reshape(b, m, k, 2 * cg)
        p0 = rows[..., :cg]
        p1 = rows[..., cg:]
        c1v = jnp.where(x1_in_p0, p0, p1)
        v = (jnp.where((yv & xv0)[..., None], p0, 0) * (1.0 - wx)
             + jnp.where((yv & xv1)[..., None], c1v, 0) * wx)
        out = out + v.astype(jnp.float32) * wrow
    return out


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, weight: jnp.ndarray,
                  kernel_size: int = 3, deformable_groups: int = 4,
                  padding: Optional[int] = None) -> jnp.ndarray:
    """DCN v1 forward. x (B, H, W, C); offset (B, H, W, G*K*2) laid out as
    (group, tap, (dy, dx)) with taps in row-major (ky, kx) order — the
    reference CUDA kernel's `data_offset_ptr[2 * (i * kernel_w + j)]`
    layout; weight (K, C, Co). Returns (B, H, W, Co) in x.dtype.

    Vectorized over taps (two gathers per deformable group total, one per
    y-corner pair), looped only over the G groups — keeps the traced HLO
    small enough that a 6-task DCN head compiles in seconds, not minutes.
    """
    b, h, w, c = x.shape
    ks = kernel_size
    k = ks * ks
    g = deformable_groups
    co = weight.shape[2]
    if padding is None:
        padding = (ks - 1) // 2
    assert c % g == 0 and offset.shape[-1] == g * k * 2
    cg = c // g
    m = h * w
    # sampling coordinates stay f32: at BEV scale (x up to ~180) bf16's
    # 8-bit mantissa cannot represent the fractional part at all
    off = offset.astype(jnp.float32).reshape(b, m, g, k, 2)

    # 2-wide window table: one bandwidth-bound copy, halves the gather
    # descriptors of every sample (x-adjacent corners share a row)
    xf = x.reshape(b, m, c)
    shift = jnp.concatenate([xf[:, 1:], jnp.zeros_like(xf[:, :1])], axis=1)
    xw = jnp.concatenate([xf, shift], axis=-1)      # (B, M, 2C)

    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    gy = gy.reshape(1, m, 1)
    gx = gx.reshape(1, m, 1)
    kky = jnp.asarray(np.arange(k) // ks - padding, jnp.float32)
    kkx = jnp.asarray(np.arange(k) % ks - padding, jnp.float32)

    acc = jnp.zeros((b, m, co), jnp.float32)
    for gi in range(g):
        ly = gy + kky + off[:, :, gi, :, 0]         # (B, M, K)
        lx = gx + kkx + off[:, :, gi, :, 1]
        xwg = jnp.concatenate([xw[..., gi * cg:(gi + 1) * cg],
                               xw[..., c + gi * cg:c + (gi + 1) * cg]],
                              axis=-1)              # (B, M, 2Cg)
        s = _bilinear_sample_k(xwg, ly, lx, h, w)   # (B, M, K, Cg) f32
        acc = acc + jnp.einsum(
            "bmkc,kcd->bmd", s.astype(x.dtype),
            weight[:, gi * cg:(gi + 1) * cg, :].astype(x.dtype),
            preferred_element_type=jnp.float32)
    return acc.reshape(b, h, w, co).astype(x.dtype)


class FeatureAdaption(nn.Module):
    """Offsets from a zero-init 1x1 conv -> DCN v1 -> ReLU
    (center_head.py:27-66; DeformConv carries no bias in the reference)."""
    out_channels: int
    kernel_size: int = 3
    deformable_groups: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size * self.kernel_size
        # offsets computed in f32 regardless of the feature dtype: they are
        # coordinates, and bf16 quantizes fractional positions too coarsely.
        # init parity: the reference init_offset() zeroes only the WEIGHT
        # (center_head.py:46-48); the bias keeps torch Conv2d's default
        # uniform(+-1/sqrt(fan_in)) draw, so from-scratch offsets start
        # slightly nonzero. fan_in of the 1x1 conv = in_channels.
        def _torch_bias(key, shape, dtype=jnp.float32):
            bound = 1.0 / np.sqrt(x.shape[-1])
            return jax.random.uniform(key, shape, dtype, -bound, bound)
        off = nn.Conv(self.deformable_groups * k * 2, (1, 1), use_bias=True,
                      kernel_init=nn.initializers.zeros,
                      bias_init=_torch_bias, dtype=jnp.float32,
                      name="conv_offset")(x)
        # param stays f32 like every other weight in the stack (optimizer
        # master copy + checkpoint tree dtype); deform_conv2d casts to the
        # compute dtype at use
        weight = self.param(
            "deform_weight",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (k, x.shape[-1], self.out_channels), jnp.float32)
        y = deform_conv2d(x, off, weight,
                          kernel_size=self.kernel_size,
                          deformable_groups=self.deformable_groups)
        return jax.nn.relu(y)


class DCNSepHead(nn.Module):
    """Separate deformable feature adaption for the heatmap and the
    regression branches (center_head.py:114-162): hm <- cls_head(adapt_cls
    (x)), every other branch <- its HeadBranch over adapt_reg(x)."""
    heads: Tuple[Tuple[str, Tuple[int, int]], ...]
    num_cls: int
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    bn_axis: Optional[str] = None
    dtype: str = "float32"     # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        dt = jnp.dtype(self.dtype)
        c = x.shape[-1]
        cls_feat = FeatureAdaption(c, name="feature_adapt_cls")(x)
        reg_feat = FeatureAdaption(c, name="feature_adapt_reg")(x)

        # cls head: Conv3x3 + BN + ReLU + Conv3x3(init_bias)
        h = nn.Conv(self.head_conv, (3, 3), padding=1, use_bias=True,
                    dtype=dt, name="cls0")(cls_feat.astype(dt))
        h = nn.BatchNorm(use_running_average=not train,
                         axis_name=self.bn_axis, **HEAD_NORM,
                         dtype=dt, name="cls_bn")(h)
        h = jax.nn.relu(h)
        hm = nn.Conv(self.num_cls, (3, 3), padding=1, use_bias=True, dtype=dt,
                     bias_init=nn.initializers.constant(self.init_bias),
                     name="cls1")(h)

        out = {}
        for name, (ch, ncv) in self.heads:
            out[name] = HeadBranch(ch, ncv, head_conv=self.head_conv,
                                   final_kernel=self.final_kernel,
                                   bn_axis=self.bn_axis, dtype=self.dtype,
                                   name=name)(reg_feat.astype(dt), train)
        out["hm"] = hm
        return out
