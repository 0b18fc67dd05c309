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
    # accumulate f32 regardless of feature dtype: aux cells pool up to
    # s^3 * dozens of voxels — bf16 accumulation would lose ~6 mantissa
    # bits on the sums
    summed = jnp.zeros((m + 1, feats.shape[1]),
                       jnp.float32).at[safe].add(feats.astype(jnp.float32))
    summed = summed[:m]
    denom = jnp.maximum(counts, 1).astype(jnp.float32)[:, None]
    return (summed / denom).astype(feats.dtype)


def _spdevoxelize_impl(feats: jnp.ndarray, idx: jnp.ndarray,
                       weights: jnp.ndarray) -> jnp.ndarray:
    n_in, c = feats.shape
    feats_ext = jnp.concatenate(
        [feats, jnp.zeros((1, c), feats.dtype)], axis=0)
    safe = jnp.where(idx >= 0, idx, n_in)
    w = jnp.where(idx >= 0, weights, 0).astype(feats.dtype)
    if c * feats.dtype.itemsize <= 272:   # ~1 descriptor tile (257-ch det
        # level lands at 258 B bf16 — still effectively plateau-rate)
        # narrow rows (det aux feats): unrolled per-tap gather+axpy —
        # never materializes the (N, K, C) window tensor (584 MB f32 at
        # the det stem; the round-3 train profile's unattributed
        # while/DUS buffers), and gathers stay descriptor-rate
        acc = jnp.zeros((idx.shape[0], c), jnp.float32)
        for k in range(idx.shape[1]):
            acc = acc + (feats_ext[safe[:, k]]
                         * w[:, k, None]).astype(jnp.float32)
        return acc.astype(feats.dtype)
    # wide rows (seg's 3C+1-channel cos_x aux feats): fused gather-reduce
    # — the unrolled f32 accumulator chain measured 4% SLOWER end-to-end
    # at 386 B rows (bench 5.41 vs 5.64 scans/s)
    gathered = feats_ext[safe]                           # (N, K, C)
    return jnp.sum(gathered * w[..., None], axis=1)


@jax.custom_vjp
def _spdevoxelize_inv(feats, idx, weights, inv_idx):
    """Gather-sum whose feature backward is itself a gather-sum over the
    inverse map `inv_idx` (idx[inv_idx[j, k], k] == j where valid; for the
    ELK aux self-join over symmetric offsets, inv_idx = idx[:, mirror]).
    Contract: `weights` must be all-ones (the validity mask is applied
    internally) and receives a ZERO cotangent — callers with constant
    weights only. AD of the plain form emits a K*N-row f32 scatter-add
    (~150 ms/step in the det train profile); this form replaces it with
    the same descriptor-plateau gathers as the forward."""
    return _spdevoxelize_impl(feats, idx, weights)


def _spdevoxelize_inv_fwd(feats, idx, weights, inv_idx):
    proto = jnp.zeros((0,), feats.dtype)          # dtype carrier
    return _spdevoxelize_impl(feats, idx, weights), (idx, inv_idx,
                                                     weights, proto)


def _spdevoxelize_inv_bwd(res, g):
    idx, inv_idx, weights, proto = res
    ones = jnp.ones(inv_idx.shape, g.dtype)
    d_feats = _spdevoxelize_impl(g, inv_idx, ones).astype(proto.dtype)
    import numpy as _np
    zero = lambda a: _np.zeros(a.shape, jax.dtypes.float0)
    return d_feats, zero(idx), jnp.zeros_like(weights), zero(inv_idx)


_spdevoxelize_inv.defvjp(_spdevoxelize_inv_fwd, _spdevoxelize_inv_bwd)


def spdevoxelize(feats: jnp.ndarray, idx: jnp.ndarray,
                 weights: jnp.ndarray,
                 inv_idx: jnp.ndarray = None) -> jnp.ndarray:
    """Weighted gather-sum: out[i] = sum_k w[i,k] * feats[idx[i,k]].

    Matches the r-generalized devoxelize of the "-u" fork
    (devoxelize_cuda.cu:11-34 with R = r^3); idx -1 contributes zero.

    `inv_idx` (optional, (n_in, K)): inverse map with
    idx[inv_idx[j, k], k] == j wherever inv_idx[j, k] >= 0, covering every
    valid (i, k) pair exactly once. When given, the backward runs in
    gather form over it instead of AD's scatter-add — requires `weights`
    to be constant all-ones (they get a zero cotangent).
    """
    if inv_idx is not None:
        return _spdevoxelize_inv(feats, idx, weights, inv_idx)
    return _spdevoxelize_impl(feats, idx, weights)


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
