"""Detection sparse backbones: SpMiddleResNetFHD (+ ELKv3 variant).

Reference: detection/det3d/models/backbones/scn.py:155-627. spconv ResNet:
SubM stem (num_input_features -> 16), 4 stages of 2 SparseBasicBlocks at
planes [16, 32, 64, 128] with SparseConv3d(k3, s2, p1) downsamples
([41,1440,1440] -> [21,720,720] -> [11,360,360] -> [5,180,180] with down4
z-padding 0), an extra z-compress SparseConv3d((3,1,1),(2,1,1)) -> D=2, and
.dense() -> (B, C*D, H, W) BEV. The ELKv3 variant adds a parallel
TSELKBlock (cos basis, block_sz 7, r 3) + SubM tail per stage, fused with
add + ReLU (scn.py:453-627) — mirroring the segmentation topology.

Spatial shapes here are (x, y, z) = (W, H, D); reference input_shape is
reversed and z gets +1 (scn.py:571: sparse_shape = input_shape[::-1] +
[1,0,0]).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.modules import SparseBatchNorm, SparseConv3d
from ..sparse.dense_grid import (DenseGrid, dense_spconv, dense_to_bev,
                                 to_dense_grid)
from ..sparse.spconv_engine import (ensure_level_table, spconv3d,
                                    spconv_out_shape, to_dense_bev)
from ..sparse.tensor import SparseTensor, make_sparse_tensor
from .elk import ELKBlock

DET_CAPACITIES = (163840, 81920, 40960, 20480)
DET_NORM = dict(eps=1e-3, momentum=0.01)


class SpConvDown(nn.Module):
    """SparseConv3d(k, s, p) + BN + ReLU downsample block."""

    inc: int
    outc: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    out_capacity: int
    bn_axis: Optional[str] = None
    batch_size: Optional[int] = None   # static; enables dense-grid dedup

    @nn.compact
    def __call__(self, x, in_shape, train: bool = False):
        import numpy as np
        from ..nn.modules import _conv_kernel_init
        kv = int(np.prod(self.kernel_size))
        std = 1.0 / (self.inc * kv) ** 0.5
        w = self.param("kernel", _conv_kernel_init(std), (kv, self.inc, self.outc))
        if isinstance(x, DenseGrid):
            y = dense_spconv(x, w, self.kernel_size, self.stride,
                             self.padding)
            out_shape = spconv_out_shape(in_shape, self.kernel_size,
                                         self.stride, self.padding)
        else:
            y, out_shape = spconv3d(x, w, self.kernel_size, in_shape,
                                    stride=self.stride, padding=self.padding,
                                    out_capacity=self.out_capacity,
                                    batch_size=self.batch_size)
        y = SparseBatchNorm(self.outc, axis_name=self.bn_axis,
                            **DET_NORM)(y, train)
        return y.replace(feats=jax.nn.relu(y.feats)), out_shape


class SparseBasicBlock(nn.Module):
    """scn.py:62-106: SubM(3, bias) + BN + ReLU + SubM(3, bias) + BN +
    identity + ReLU."""

    planes: int
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = False) -> SparseTensor:
        y = SparseConv3d(self.planes, self.planes, 3, use_bias=True,
                         prefer_window=True)(x)
        y = SparseBatchNorm(self.planes, axis_name=self.bn_axis,
                            **DET_NORM)(y, train)
        y = y.replace(feats=jax.nn.relu(y.feats))
        y = SparseConv3d(self.planes, self.planes, 3, use_bias=True,
                         prefer_window=True)(y)
        y = SparseBatchNorm(self.planes, axis_name=self.bn_axis,
                            **DET_NORM)(y, train)
        return y.replace(feats=jax.nn.relu(y.feats + x.feats))


class SpMiddleResNetFHDELKv3(nn.Module):
    num_input_features: int = 5
    elk: bool = True
    block_sz: int = 7
    elk_r: int = 3
    capacities: Tuple[int, ...] = DET_CAPACITIES
    batch_size: int = 1
    bn_axis: Optional[str] = None
    # collate_det emits voxels in pack-key order (det_pipeline.collate_det);
    # set False only when feeding coords from another source
    coords_sorted: bool = True
    # compute dtype for the whole sparse path (params stay f32); bf16
    # halves every feature-row gather's bytes and the MXU time — the
    # sparse modules follow feats.dtype, same discipline as the seg stack
    dtype: str = "float32"
    # Hybrid sparse->dense execution: levels >= this index run on a
    # masked DENSE grid (sparse/dense_grid.py — exact spconv semantics,
    # MXU-bound instead of gather-descriptor-bound), INCLUDING that
    # level's strided down (the conversion scatters the level-(L-1)
    # rows, so the down skips the sparse 27N-candidate dedup). None =
    # fully sparse. Occupancy at the 160k-voxel nuScenes caps:
    # lvl1 0.75%, lvl2 2.9%, lvl3 13%.
    dense_from_level: Optional[int] = None

    @nn.compact
    def __call__(self, voxel_features: jnp.ndarray, coords: jnp.ndarray,
                 nnz: jnp.ndarray, input_shape: Tuple[int, int, int],
                 train: bool = False):
        """input_shape = (W, H, D) grid extents, e.g. (1440, 1440, 40)."""
        planes = [16, 32, 64, 128]
        caps = self.capacities
        ax = self.bn_axis
        shape = (input_shape[0], input_shape[1], input_shape[2] + 1)

        voxel_features = voxel_features.astype(jnp.dtype(self.dtype))
        st = make_sparse_tensor(voxel_features, coords, nnz=nnz, stride=1,
                                base_sorted=self.coords_sorted)
        if self.coords_sorted:
            ensure_level_table(st, shape, self.batch_size)
        st = SparseConv3d(self.num_input_features, planes[0], 3,
                          prefer_window=True, name="conv_input")(st)
        st = SparseBatchNorm(planes[0], axis_name=ax, name="conv_input_bn",
                             **DET_NORM)(st, train)
        st = st.replace(feats=jax.nn.relu(st.feats))

        multi_scale = {}
        for lvl in range(4):
            c = planes[lvl]
            if lvl > 0:
                zpad = 1 if lvl < 3 else 0
                st, shape = SpConvDown(planes[lvl - 1], c, (3, 3, 3),
                                       (2, 2, 2), (1, 1, zpad),
                                       out_capacity=caps[lvl], bn_axis=ax,
                                       batch_size=self.batch_size,
                                       name=f"down{lvl+1}")(st, shape, train)
                if isinstance(st, SparseTensor):
                    ensure_level_table(st, shape, self.batch_size)
            # the dense conversion happens AFTER level L's strided down, on
            # the level-L grid (8x fewer cells than the pre-down grid —
            # converting before the down measured WORSE, 2.18 vs 2.38 fps:
            # the 10.9M-cell level-1 grid materialization costs more than
            # the ~20 ms sparse 27N-candidate dedup it saves)
            if (self.dense_from_level is not None
                    and lvl >= self.dense_from_level
                    and isinstance(st, SparseTensor)):
                st = to_dense_grid(st, shape, self.batch_size)
            y = SparseBasicBlock(c, bn_axis=ax, name=f"conv{lvl+1}_0")(st, train)
            y = SparseBasicBlock(c, bn_axis=ax, name=f"conv{lvl+1}_1")(y, train)
            if self.elk:
                y = SparseConv3d(c, c, 3, use_bias=False, prefer_window=True,
                                 name=f"conv{lvl+1}_tail")(y)
                y = SparseBatchNorm(c, axis_name=ax,
                                    name=f"conv{lvl+1}_tail_bn",
                                    **DET_NORM)(y, train)
                lk = ELKBlock(c, aux_capacity=caps[lvl], baseop="cos",
                              det_grouping=True, name=f"elk{lvl+1}")(
                                  st, self.block_sz, self.elk_r, train)
                lk = SparseConv3d(c, c, 3, use_bias=False, prefer_window=True,
                                  name=f"elk{lvl+1}_tail")(lk)
                lk = SparseBatchNorm(c, axis_name=ax,
                                     name=f"elk{lvl+1}_tail_bn",
                                     **DET_NORM)(lk, train)
                st = y.replace(feats=jax.nn.relu(y.feats + lk.feats))
            else:
                st = y
            multi_scale[f"conv{lvl+1}"] = st

        from ..nn.modules import _conv_kernel_init
        std = 1.0 / (planes[3] * 3) ** 0.5
        w = self.param("extra_conv_kernel", _conv_kernel_init(std),
                       (3, planes[3], planes[3]))
        if isinstance(st, DenseGrid):
            st = dense_spconv(st, w, (1, 1, 3), (1, 1, 2), (0, 0, 0))
            shape = spconv_out_shape(shape, (1, 1, 3), (1, 1, 2), (0, 0, 0))
        else:
            st, shape = spconv3d(st, w, (1, 1, 3), shape, stride=(1, 1, 2),
                                 padding=(0, 0, 0), out_capacity=caps[3],
                                 batch_size=self.batch_size)
        st = SparseBatchNorm(planes[3], axis_name=ax, name="extra_conv_bn",
                             **DET_NORM)(st, train)
        st = st.replace(feats=jax.nn.relu(st.feats))

        if isinstance(st, DenseGrid):
            bev = dense_to_bev(st)
        else:
            bev = to_dense_bev(st, shape, self.batch_size)
        return bev, multi_scale


class SpMiddleResNetFHD(SpMiddleResNetFHDELKv3):
    """Plain (no-ELK) backbone (scn.py:155-264)."""

    elk: bool = False
