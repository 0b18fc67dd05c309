"""SPVCNN baseline: point-voxel UNet (reference:
segmentation/core/models/semantic_kitti/spvcnn.py:82-235).

Voxel UNet trunk + point branch crossing at 4 junctions via
voxel_to_point / point_to_voxel trilinear transforms, with point MLPs
(Linear + BN + ReLU) on the skip path and dropout 0.3 before the two
mid-decoder re-voxelizations.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.modules import Linear, SparseBatchNorm, SparseConv3d
from ..ops.point import (PointTensor, initial_voxelize, make_point_tensor,
                         point_to_voxel, voxel_to_point)
from ..sparse.tensor import SparseTensor, cat
from .blocks import BasicConvolutionBlock, BasicDeconvolutionBlock, ResidualBlock
from .linkunet import DEFAULT_CAPACITIES


class PointMLP(nn.Module):
    """Linear + (masked) BatchNorm1d + ReLU point transform
    (spvcnn.py:166-182)."""

    inc: int
    outc: int
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, feats: jnp.ndarray, valid: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        h = Linear(self.inc, self.outc)(feats)
        # reuse SparseBatchNorm over a pseudo sparse tensor view
        from ..sparse import coords as coordlib
        dummy_coords = jnp.where(
            valid[:, None], jnp.zeros((feats.shape[0], 4), jnp.int32),
            jnp.int32(coordlib.INVALID_COORD))
        st = SparseTensor(feats=h, coords=dummy_coords,
                          nnz=jnp.sum(valid.astype(jnp.int32)))
        st = SparseBatchNorm(self.outc, axis_name=self.bn_axis)(st, train)
        return jax.nn.relu(st.feats)


class SPVCNN(nn.Module):
    num_classes: int
    cr: float = 1.0
    pres: float = 0.05
    vres: float = 0.05
    in_channels: int = 4
    capacities: Tuple[int, ...] = DEFAULT_CAPACITIES
    dropout_rate: float = 0.3
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = False):
        cs = [int(self.cr * c) for c in [32, 32, 64, 128, 256, 256, 128, 96, 96]]
        caps = self.capacities
        ax = self.bn_axis

        z = make_point_tensor(x.feats, x.coords.astype(jnp.float32), nnz=x.nnz)
        x0, _ = initial_voxelize(z, self.pres, self.vres, caps[0])

        st = SparseConv3d(self.in_channels, cs[0], 3, name="stem0")(x0)
        st = SparseBatchNorm(cs[0], axis_name=ax, name="stem0_bn")(st, train)
        st = st.replace(feats=jax.nn.relu(st.feats))
        st = SparseConv3d(cs[0], cs[0], 3, name="stem1")(st)
        st = SparseBatchNorm(cs[0], axis_name=ax, name="stem1_bn")(st, train)
        x0 = st.replace(feats=jax.nn.relu(st.feats))

        z0 = voxel_to_point(x0, z)
        pvalid = z0.valid_mask()

        st = point_to_voxel(x0, z0)
        enc = [x0]
        for lvl in range(4):
            cin, cout = cs[lvl], cs[lvl + 1]
            st = BasicConvolutionBlock(cin, cin, ks=2, stride=2,
                                       out_capacity=caps[lvl + 1], bn_axis=ax,
                                       name=f"down{lvl+1}")(st, train)
            st = ResidualBlock(cin, cout, bn_axis=ax,
                               name=f"stage{lvl+1}_0")(st, train)
            st = ResidualBlock(cout, cout, bn_axis=ax,
                               name=f"stage{lvl+1}_1")(st, train)
            enc.append(st)
        _, x1, x2, x3, x4 = enc

        z1 = voxel_to_point(x4, z0)
        z1 = z1.replace(feats=z1.feats + PointMLP(cs[0], cs[4], ax,
                                                  name="pt0")(z0.feats, pvalid,
                                                              train))

        def drop(f):
            if not train or self.dropout_rate == 0:
                return f
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1 - self.dropout_rate, f.shape)
            return jnp.where(keep, f / (1 - self.dropout_rate), 0)

        y1 = point_to_voxel(x4, z1)
        y1 = y1.replace(feats=drop(y1.feats))
        y1 = BasicDeconvolutionBlock(cs[4], cs[5], ks=2, stride=2, bn_axis=ax,
                                     name="up1_deconv")(y1, train)
        y1 = cat([y1, x3])
        y1 = ResidualBlock(cs[5] + cs[3], cs[5], bn_axis=ax,
                           name="up1_res0")(y1, train)
        y1 = ResidualBlock(cs[5], cs[5], bn_axis=ax, name="up1_res1")(y1, train)

        y2 = BasicDeconvolutionBlock(cs[5], cs[6], ks=2, stride=2, bn_axis=ax,
                                     name="up2_deconv")(y1, train)
        y2 = cat([y2, x2])
        y2 = ResidualBlock(cs[6] + cs[2], cs[6], bn_axis=ax,
                           name="up2_res0")(y2, train)
        y2 = ResidualBlock(cs[6], cs[6], bn_axis=ax, name="up2_res1")(y2, train)
        z2 = voxel_to_point(y2, z1)
        z2 = z2.replace(feats=z2.feats + PointMLP(cs[4], cs[6], ax,
                                                  name="pt1")(z1.feats, pvalid,
                                                              train))

        y3 = point_to_voxel(y2, z2)
        y3 = y3.replace(feats=drop(y3.feats))
        y3 = BasicDeconvolutionBlock(cs[6], cs[7], ks=2, stride=2, bn_axis=ax,
                                     name="up3_deconv")(y3, train)
        y3 = cat([y3, x1])
        y3 = ResidualBlock(cs[7] + cs[1], cs[7], bn_axis=ax,
                           name="up3_res0")(y3, train)
        y3 = ResidualBlock(cs[7], cs[7], bn_axis=ax, name="up3_res1")(y3, train)

        y4 = BasicDeconvolutionBlock(cs[7], cs[8], ks=2, stride=2, bn_axis=ax,
                                     name="up4_deconv")(y3, train)
        y4 = cat([y4, x0])
        y4 = ResidualBlock(cs[8] + cs[0], cs[8], bn_axis=ax,
                           name="up4_res0")(y4, train)
        y4 = ResidualBlock(cs[8], cs[8], bn_axis=ax, name="up4_res1")(y4, train)
        z3 = voxel_to_point(y4, z2)
        z3 = z3.replace(feats=z3.feats + PointMLP(cs[6], cs[8], ax,
                                                  name="pt2")(z2.feats, pvalid,
                                                              train))

        return Linear(cs[8], self.num_classes, name="classifier")(z3.feats)
