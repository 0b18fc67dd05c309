"""Flax modules over SparseTensor: conv, norm, activation, pooling.

Equivalents of torchsparse's nn/modules (reference:
segmentation/torchsparse-u/torchsparse/nn/modules/{conv,norm,activation,
pooling}.py) with one semantic addition forced by fixed-capacity padding:
BatchNorm statistics are computed over *valid* rows only (the reference has
no padding, so plain BatchNorm1d sufficed). SyncBN is the same module with
`axis_name` set — stats are `pmean`ed across the mesh, replacing APEX/torch
SyncBN conversion (detection/det3d/torchie/apis/train.py:267-271).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..sparse import coords as coordlib
from ..sparse import conv as spconv
from ..sparse.dense_grid import DenseGrid, dense_subm_conv
from ..sparse.tensor import SparseTensor


def _conv_kernel_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-std, maxval=std)
    return init


class SparseConv3d(nn.Module):
    """Sparse conv; weight layout (K, Ci, Co) and Kaiming-uniform
    1/sqrt(fan * K) init exactly as nn/modules/conv.py:36-64 so reference
    checkpoints translate 1:1."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, ...]] = 3
    stride: Union[int, Tuple[int, ...]] = 1
    dilation: int = 1
    use_bias: bool = False
    transposed: bool = False
    out_capacity: Optional[int] = None
    # opt into the full-window-per-descriptor apply at narrow channels —
    # wins at det density, loses at seg density (sparse/conv.py gate)
    prefer_window: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor) -> SparseTensor:
        ks = coordlib.make_ntuple(self.kernel_size)
        kv = int(np.prod(ks))
        fan = self.out_channels if self.transposed else self.in_channels
        std = 1.0 / math.sqrt(fan * kv)
        shape = ((kv, self.in_channels, self.out_channels)
                 if kv > 1 else (self.in_channels, self.out_channels))
        kernel = self.param("kernel", _conv_kernel_init(std), shape)
        bias = (self.param("bias", _conv_kernel_init(std), (self.out_channels,))
                if self.use_bias else None)
        if isinstance(st, DenseGrid):
            # dense-grid execution of the SAME params (exact submanifold
            # semantics; sparse/dense_grid.py) — the det backbone's
            # high-occupancy levels run here
            assert not self.transposed and self.dilation == 1 \
                and coordlib.make_ntuple(self.stride) == (1, 1, 1)
            return dense_subm_conv(st, kernel, ks, bias)
        return spconv.conv3d(st, kernel, kernel_size=ks, bias=bias,
                             stride=self.stride, dilation=self.dilation,
                             transposed=self.transposed,
                             out_capacity=self.out_capacity,
                             prefer_window=self.prefer_window)


class SparseBatchNorm(nn.Module):
    """Masked BatchNorm over valid voxel rows (torch BatchNorm1d semantics:
    eps 1e-5, momentum 0.1, biased var for normalization, unbiased for the
    running estimate). `axis_name` turns it into SyncBN."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False) -> SparseTensor:
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.num_features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.num_features,)))

        feats = st.feats
        if train:
            if isinstance(st, DenseGrid):
                # dense grid: stats over OCCUPIED cells only — identical
                # to the sparse valid-row stats (each occupied cell is
                # exactly one voxel row)
                mask = st.mask[..., None].astype(jnp.float32)
            else:
                mask = st.valid_mask().astype(jnp.float32)[:, None]
            f32 = feats.astype(jnp.float32)
            red = tuple(range(f32.ndim - 1))
            n = jnp.sum(mask)
            s1 = jnp.sum(f32 * mask, axis=red)
            s2 = jnp.sum(jnp.square(f32) * mask, axis=red)
            if self.axis_name is not None:
                n = jax.lax.psum(n, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = s1 / n
            var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        out = (feats.astype(jnp.float32) - mean) * inv + bias
        if isinstance(st, DenseGrid):
            # re-zero empty cells (the affine bias is nonzero there)
            return st.masked(out.astype(feats.dtype))
        return st.replace(feats=out.astype(feats.dtype))


class SparseLayerNorm(nn.Module):
    """LayerNorm over the channel dim (per-row; padding-safe by construction).
    eps 1e-6 matches the ELK blocks (linkunet.py:114-121)."""

    num_features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        f32 = feats.astype(jnp.float32)
        mean = jnp.mean(f32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(f32 - mean), axis=-1, keepdims=True)
        out = (f32 - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return out.astype(feats.dtype)


class Linear(nn.Module):
    """Dense layer with torch nn.Linear default init (kaiming uniform
    a=sqrt(5) on weight -> U(+-1/sqrt(fan_in)); same bound on bias)."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        std = 1.0 / math.sqrt(self.in_features)
        w = self.param("kernel", _conv_kernel_init(std),
                       (self.in_features, self.out_features))
        y = jnp.dot(x, w.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", _conv_kernel_init(std), (self.out_features,))
            y = y + b
        return y


def relu(st: SparseTensor) -> SparseTensor:
    return st.replace(feats=jax.nn.relu(st.feats))


class GlobalAveragePool(nn.Module):
    """Per-batch-element mean over valid voxels
    (nn/modules/pooling.py GlobalAveragePool)."""

    max_batch: int = 16

    @nn.compact
    def __call__(self, st: SparseTensor) -> jnp.ndarray:
        b = st.coords[:, 3]
        valid = st.valid_mask()
        seg = jnp.where(valid, b, self.max_batch)
        sums = jnp.zeros((self.max_batch + 1, st.num_channels),
                         st.feats.dtype).at[seg].add(st.feats)
        cnts = jnp.zeros((self.max_batch + 1,), jnp.float32).at[seg].add(1.0)
        return (sums[:self.max_batch]
                / jnp.maximum(cnts[:self.max_batch, None], 1.0))


class GlobalMaxPool(nn.Module):
    """Per-batch-element max over valid voxels."""

    max_batch: int = 16

    @nn.compact
    def __call__(self, st: SparseTensor) -> jnp.ndarray:
        b = st.coords[:, 3]
        valid = st.valid_mask()
        seg = jnp.where(valid, b, self.max_batch)
        neg = jnp.full((self.max_batch + 1, st.num_channels), -jnp.inf,
                       jnp.float32)
        out = neg.at[seg].max(st.feats.astype(jnp.float32))
        return jnp.where(jnp.isfinite(out[:self.max_batch]),
                         out[:self.max_batch], 0.0).astype(st.feats.dtype)


def crop(st: SparseTensor, loc_min, loc_max) -> SparseTensor:
    """Keep voxels inside [loc_min, loc_max) (torchsparse
    nn/modules/crop.py). Fixed-capacity form: out-of-box rows become
    padding (coords -> sentinel), count updated."""
    c = st.coords
    lo = jnp.asarray(loc_min, jnp.int32)
    hi = jnp.asarray(loc_max, jnp.int32)
    keep = st.valid_mask() & jnp.all((c[:, :3] >= lo) & (c[:, :3] < hi), 1)
    new_coords = jnp.where(keep[:, None], c, jnp.int32(coordlib.INVALID_COORD))
    return st.replace(coords=new_coords,
                      nnz=jnp.sum(keep.astype(jnp.int32)))
