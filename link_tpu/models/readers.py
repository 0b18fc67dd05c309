"""Voxel/pillar feature readers.

Reference: detection/det3d/models/readers/{voxel_encoder.py,
pillar_encoder.py, dynamic_voxel_encoder.py}. VoxelFeatureExtractorV3 (the
LinK config's reader) lives in models/voxelnet.py; this module adds the
alternative readers: PillarFeatureNet (+ PointPillarsScatter BEV) and the
dynamic (scatter-mean) voxel encoder.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.modules import Linear


class PFNLayer(nn.Module):
    """pillar_encoder.py:15-55: Linear -> BN -> ReLU -> max-pool over the
    pillar's points (+ concat broadcast when not last)."""

    in_channels: int
    out_channels: int
    last_layer: bool = False
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, point_mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        units = self.out_channels if self.last_layer else self.out_channels // 2
        h = Linear(self.in_channels, units, use_bias=False)(x)
        # masked BN over real points
        from ..nn.modules import SparseBatchNorm
        from ..sparse import coords as coordlib
        n, p, c = h.shape
        flat = h.reshape(n * p, c)
        dummy = jnp.where(point_mask.reshape(-1, 1),
                          jnp.zeros((n * p, 4), jnp.int32),
                          jnp.int32(coordlib.INVALID_COORD))
        from ..sparse.tensor import SparseTensor
        st = SparseTensor(feats=flat, coords=dummy,
                          nnz=jnp.sum(point_mask.astype(jnp.int32)))
        st = SparseBatchNorm(units, eps=1e-3, momentum=0.01,
                             axis_name=self.bn_axis)(st, train)
        h = jax.nn.relu(st.feats.reshape(n, p, units))
        h = jnp.where(point_mask[..., None], h, 0.0)
        h_max = jnp.max(h, axis=1, keepdims=True)
        if self.last_layer:
            return h_max
        return jnp.concatenate(
            [h, jnp.broadcast_to(h_max, h.shape)], axis=-1)


class PillarFeatureNet(nn.Module):
    """pillar_encoder.py:59-160: decorate points with cluster/center
    offsets, run PFN layers, max-pool to one feature per pillar."""

    num_input_features: int = 5
    num_filters: Tuple[int, ...] = (64,)
    with_distance: bool = False
    voxel_size: Tuple[float, float] = (0.2, 0.2)
    pc_range: Tuple[float, float] = (-54.0, -54.0)
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, voxels: jnp.ndarray, num_points: jnp.ndarray,
                 coords: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """voxels (N, P, F); coords (N, 4) = (x, y, z, b) grid indices."""
        n, p, f = voxels.shape
        point_mask = (jnp.arange(p)[None, :]
                      < jnp.maximum(num_points, 0)[:, None])
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[:, None, None]
        mean = jnp.sum(jnp.where(point_mask[..., None], voxels[..., :3], 0),
                       axis=1, keepdims=True) / denom
        f_cluster = voxels[..., :3] - mean

        vx, vy = self.voxel_size
        cx = coords[:, 0].astype(voxels.dtype) * vx + vx / 2 + self.pc_range[0]
        cy = coords[:, 1].astype(voxels.dtype) * vy + vy / 2 + self.pc_range[1]
        f_center = jnp.stack([voxels[..., 0] - cx[:, None],
                              voxels[..., 1] - cy[:, None]], axis=-1)

        feats = [voxels, f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                         keepdims=True))
        h = jnp.concatenate(feats, axis=-1)
        h = jnp.where(point_mask[..., None], h, 0.0)

        cin = f + 5 + (1 if self.with_distance else 0)
        dims = [cin] + list(self.num_filters)
        for i in range(len(dims) - 1):
            h = PFNLayer(dims[i] if i == 0 else dims[i] * 1, dims[i + 1],
                         last_layer=(i == len(dims) - 2),
                         bn_axis=self.bn_axis, name=f"pfn{i}")(
                             h, point_mask, train)
        return h[:, 0, :]


def point_pillars_scatter(feats: jnp.ndarray, coords: jnp.ndarray,
                          nnz: jnp.ndarray, grid_hw: Tuple[int, int],
                          batch_size: int) -> jnp.ndarray:
    """Scatter pillar features to a dense BEV map (B, C, H, W)
    (pillar_encoder.py:163-220)."""
    w, h = grid_hw
    c = feats.shape[1]
    xx, yy, bb = coords[:, 0], coords[:, 1], coords[:, 3]
    valid = ((jnp.arange(feats.shape[0]) < nnz) & (xx >= 0) & (xx < w)
             & (yy >= 0) & (yy < h) & (bb >= 0) & (bb < batch_size))
    flat = jnp.where(valid, (bb * h + yy) * w + xx, batch_size * h * w)
    dense = jnp.zeros((batch_size * h * w + 1, c), feats.dtype)
    dense = dense.at[flat].set(jnp.where(valid[:, None], feats, 0.0))
    dense = dense[:-1].reshape(batch_size, h, w, c)
    return jnp.transpose(dense, (0, 3, 1, 2))


def dynamic_voxel_encoder(points: jnp.ndarray, valid: jnp.ndarray,
                          voxel_size, pc_range, grid,
                          capacity: int):
    """Scatter-mean dynamic voxelization (dynamic_voxel_encoder.py:8-83):
    no per-voxel point cap; returns (feats, coords, nnz) fixed-capacity."""
    from ..sparse import coords as coordlib
    from ..sparse import ops as spops

    vs = jnp.asarray(voxel_size)
    pr = jnp.asarray(pc_range[:3])
    g = jnp.asarray(grid, jnp.int32)
    c = jnp.floor((points[:, :3] - pr) / vs).astype(jnp.int32)
    ok = valid & jnp.all((c >= 0) & (c < g), axis=1)
    c4 = jnp.concatenate(
        [jnp.where(ok[:, None], c, jnp.int32(coordlib.INVALID_COORD)),
         jnp.zeros((len(points), 1), jnp.int32)], axis=1)
    out_coords, inverse, out_nnz = coordlib.unique_coords(c4, capacity)
    counts = spops.spcount(inverse, capacity)
    feats = spops.spvoxelize(points, inverse, counts)
    return feats, out_coords, out_nnz
