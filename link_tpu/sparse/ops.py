"""Functional sparse ops: count / voxelize / devoxelize / downsample.

TPU-native equivalents of torchsparse-u's atomic-add CUDA kernels
(reference: backend/others/count_cuda.cu, backend/voxelize/voxelize_cuda.cu,
backend/devoxelize/devoxelize_cuda.cu). All scatter-style reductions become
deterministic `segment_sum`s; misses (`idx == -1`) are routed to a dump
segment and sliced off, replacing the reference's `if (pos >= 0)` guards.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from . import coords as coordlib


def spcount(idx: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Histogram of non-negative indices (reference count_cuda.cu:11-32)."""
    safe = jnp.where(idx >= 0, idx, num_segments)
    ones = jnp.ones(idx.shape, jnp.int32)
    out = jnp.zeros((num_segments + 1,), jnp.int32).at[safe].add(ones)
    return out[:num_segments]


def spvoxelize(feats: jnp.ndarray, idx: jnp.ndarray,
               counts: jnp.ndarray) -> jnp.ndarray:
    """Mean-pool N rows into M segments by idx map (-1 = dropped).

    Matches voxelize_forward_kernel (voxelize_cuda.cu:12-38): sum then
    divide by counts (count 0 -> zeros).
    """
    m = counts.shape[0]
    safe = jnp.where(idx >= 0, idx, m)
    summed = jnp.zeros((m + 1, feats.shape[1]), feats.dtype).at[safe].add(feats)
    summed = summed[:m]
    denom = jnp.maximum(counts, 1).astype(feats.dtype)[:, None]
    return summed / denom


def spdevoxelize(feats: jnp.ndarray, idx: jnp.ndarray,
                 weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted gather-sum: out[i] = sum_k w[i,k] * feats[idx[i,k]].

    Matches the r-generalized devoxelize of the "-u" fork
    (devoxelize_cuda.cu:11-34 with R = r^3); idx -1 contributes zero.
    """
    n_in = feats.shape[0]
    safe = jnp.where(idx >= 0, idx, n_in)
    feats_ext = jnp.concatenate(
        [feats, jnp.zeros((1, feats.shape[1]), feats.dtype)], axis=0)
    gathered = feats_ext[safe]                       # (N, K, C)
    w = jnp.where(idx >= 0, weights, 0).astype(feats.dtype)[..., None]
    return jnp.sum(gathered * w, axis=1)


def spdownsample(coords: jnp.ndarray, out_capacity: int,
                 stride: Union[int, Tuple[int, ...]] = 2,
                 kernel_size: Union[int, Tuple[int, ...]] = 2,
                 tensor_stride: Union[int, Tuple[int, ...]] = 1):
    """Strided coordinate downsample (reference
    nn/functional/downsample.py:10-52, fast path only: stride == kernel_size
    or stride == 1 per axis, which covers every conv in LinK).

    Returns (out_coords, out_nnz). Coordinates keep original units
    (multiples of stride * tensor_stride), like torchsparse.
    """
    stride = coordlib.make_ntuple(stride)
    kernel_size = coordlib.make_ntuple(kernel_size)
    tensor_stride = coordlib.make_ntuple(tensor_stride)
    assert all(stride[k] in (1, kernel_size[k]) for k in range(3)), (
        "general (offset-expansion) downsample path not needed by LinK; "
        "add it if a config requires stride not in {1, kernel_size}")
    ss = jnp.asarray([s * t for s, t in zip(stride, tensor_stride)], jnp.int32)
    xyz = coords[:, :3]
    # Guard: sentinel rows must stay sentinel after floor-div.
    is_pad = xyz[:, 0] <= coordlib.INVALID_COORD
    new_xyz = jnp.where(is_pad[:, None], xyz, (xyz // ss) * ss)
    new_coords = jnp.concatenate([new_xyz, coords[:, 3:]], axis=1)
    out_coords, _, out_nnz = coordlib.unique_coords(new_coords, out_capacity)
    return out_coords, out_nnz
