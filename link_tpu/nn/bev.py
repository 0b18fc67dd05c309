"""Sparse -> BEV modules (reference: torchsparse nn/modules/bev.py:16-170).

  * ToBEVReduction: mean-pool voxels sharing a BEV cell (z collapsed);
  * ToDenseBEVConvolution: per-z-plane FC + scatter-add into a dense map;
  * ToBEVHeightCompression: stack z-slices into channels of a dense map.

Fixed-capacity forms: dense outputs are (B, C, H, W); the sparse reduction
keeps capacity with a fresh unique over z-zeroed coords.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..sparse import coords as coordlib
from ..sparse import ops as spops
from ..sparse.tensor import SparseTensor


def to_bev_reduction(x: SparseTensor, dim: int = 2) -> SparseTensor:
    """Mean over the collapsed axis (reference default dim=1 is z in its
    (x?, z, ?) KITTI layout; our coords are (x, y, z, b) so z is dim 2)."""
    c = x.coords
    zeroed = c.at[:, dim].set(jnp.where(
        c[:, 0] <= coordlib.INVALID_COORD, c[:, dim], 0))
    out_coords, inverse, out_nnz = coordlib.unique_coords(zeroed, x.capacity)
    counts = spops.spcount(inverse, x.capacity)
    feats = spops.spvoxelize(x.feats, inverse, counts)
    return SparseTensor(feats=feats, coords=out_coords, nnz=out_nnz,
                        stride=x.stride)


class ToDenseBEVConvolution(nn.Module):
    """Per-z FC + scatter-add to (B, Co, H, W) (bev.py:36-120)."""

    in_channels: int
    out_channels: int
    shape: Tuple[int, int, int]     # (W, H, D) grid extents at stride 1
    use_bias: bool = False
    batch_size: int = 1

    @nn.compact
    def __call__(self, x: SparseTensor) -> jnp.ndarray:
        W, H, D = self.shape
        s = x.stride
        n_kernels = D // s[2] if D % s[2] == 0 else D // s[2] + 1
        std = 1.0 / math.sqrt(self.in_channels)

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -std, std)

        kernel = self.param("kernel", init,
                            (n_kernels, self.in_channels, self.out_channels))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_channels,)) if self.use_bias else None)

        z = jnp.clip(x.coords[:, 2] // s[2], 0, n_kernels - 1)
        w_rows = kernel[z]                                   # (N, Ci, Co)
        feats = jnp.einsum("ni,nio->no", x.feats, w_rows,
                           preferred_element_type=jnp.float32)

        hw, hh = W // s[0], H // s[1]
        xx = x.coords[:, 0] // s[0]
        yy = x.coords[:, 1] // s[1]
        bb = x.coords[:, 3]
        valid = (x.valid_mask() & (xx >= 0) & (xx < hw) & (yy >= 0)
                 & (yy < hh) & (bb >= 0) & (bb < self.batch_size))
        flat = jnp.where(valid, (bb * hh + yy) * hw + xx,
                         self.batch_size * hh * hw)
        dense = jnp.zeros((self.batch_size * hh * hw + 1, self.out_channels),
                          jnp.float32).at[flat].add(
            jnp.where(valid[:, None], feats, 0.0))
        out = dense[:-1].reshape(self.batch_size, hh, hw, self.out_channels)
        if bias is not None:
            out = out + bias
        return jnp.transpose(out, (0, 3, 1, 2)).astype(x.feats.dtype)


def to_bev_height_compression(x: SparseTensor, shape: Tuple[int, int, int],
                              batch_size: int = 1) -> jnp.ndarray:
    """Stack z slices into channels: (B, C*D, H, W) (bev.py:123-170)."""
    from ..sparse.spconv_engine import to_dense_bev
    s = x.stride
    scaled = x.replace(coords=jnp.where(
        x.coords[:, :1] <= coordlib.INVALID_COORD, x.coords,
        jnp.concatenate([x.coords[:, 0:1] // s[0], x.coords[:, 1:2] // s[1],
                         x.coords[:, 2:3] // s[2], x.coords[:, 3:4]], axis=1)))
    grid = (shape[0] // s[0], shape[1] // s[1],
            max(1, shape[2] // s[2]))
    return to_dense_bev(scaled, grid, batch_size)
