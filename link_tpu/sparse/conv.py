"""Sparse 3D convolution: kernel-map planning + gather-matmul-scatter.

TPU-native re-design of torchsparse-u's conv engine (reference:
nn/functional/conv.py:83-147 for the kernel-map builder,
backend/convolution/convolution_cuda.cu:14-164 for gather-GEMM-scatter).

Instead of per-tap variable-length (nbmaps, nbsizes) driving dynamic GEMMs,
we keep a dense gather-form plan `in_idx[K, M_out]` over the fixed output
capacity and run one `lax.scan` over taps:

    forward:    y[j]  = sum_k feats[in_idx[k, j]] @ W[k]      (miss -> 0)
    transposed: y[i] += sum_k sum_{j: in_idx[k,j]==i} x[j] @ W[k]

Every tap is a full (M, Ci) x (Ci, Co) matmul on the MXU; misses gather a
zero row instead of branching, and the transposed scatter is a
deterministic indexed add (no atomics, unlike scatter_kernel at
convolution_cuda.cu:36-48). Matmuls accumulate in fp32 via
`preferred_element_type` regardless of the feature dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import coords as coordlib
from . import ops as spops
from .tensor import ConvPlan, SparseTensor


def build_conv_plan(in_coords: jnp.ndarray,
                    out_coords: jnp.ndarray,
                    out_nnz: jnp.ndarray,
                    offsets,
                    in_capacity: int,
                    quantum: int = 0) -> ConvPlan:
    """Build the kernel map: for each output row and tap, the input row at
    out_coord + offset (or -1). Mirrors conv.py:103-122 (offsets -> hash ->
    query) with an exact sorted-table join instead of hashing.

    When the taps' x-offsets form quantum-step runs (every LinK kernel),
    the join uses one binary search per (dy, dz) group plus consecutive-row
    compares (grouped_window_query) — ~3x less search traffic."""
    table = coordlib.build_table(in_coords)
    offs_np = np.asarray(offsets)
    if quantum and coordlib.can_group_offsets(offs_np, quantum):
        in_idx = coordlib.grouped_window_query(table, out_coords, offs_np,
                                               quantum)
    else:
        offs = jnp.asarray(offs_np, jnp.int32)                 # (K, 3)
        qxyz = out_coords[None, :, :3] + offs[:, None, :]      # (K, M, 3)
        qb = jnp.broadcast_to(out_coords[None, :, 3:],
                              (offs.shape[0],) + out_coords[:, 3:].shape)
        queries = jnp.concatenate([qxyz, qb], axis=-1)         # (K, M, 4)
        in_idx = table.query(queries)                          # (K, M)
    return ConvPlan(in_idx=in_idx, out_coords=out_coords, out_nnz=out_nnz,
                    in_capacity=in_capacity, out_capacity=out_coords.shape[0])


def apply_conv_plan(feats: jnp.ndarray, weight: jnp.ndarray, plan: ConvPlan,
                    transposed: bool = False) -> jnp.ndarray:
    """Execute the plan. `weight` is (K, Ci, Co), reference layout
    (nn/modules/conv.py:36-38)."""
    k = weight.shape[0]
    ci = weight.shape[1]
    co = weight.shape[2]

    if not transposed:
        n_in = feats.shape[0]
        feats_ext = jnp.concatenate(
            [feats, jnp.zeros((1, ci), feats.dtype)], axis=0)
        idx = jnp.where(plan.in_idx >= 0, plan.in_idx, n_in)   # (K, M_out)

        def body(acc, xs):
            idx_k, w_k = xs
            x = feats_ext[idx_k]                               # (M_out, Ci)
            acc = acc + jnp.dot(x, w_k.astype(x.dtype),
                                preferred_element_type=jnp.float32)
            return acc, None

        init = jnp.zeros((plan.out_capacity, co), jnp.float32)
        acc, _ = jax.lax.scan(body, init, (idx, weight))
        return acc.astype(feats.dtype)
    else:
        # feats live on the plan's *output* side; result on its input side.
        m_in = plan.in_capacity

        def body(acc, xs):
            idx_k, w_k = xs                                    # (M_out,), (Ci, Co)
            contrib = jnp.dot(feats, w_k.astype(feats.dtype),
                              preferred_element_type=jnp.float32)
            safe = jnp.where(idx_k >= 0, idx_k, m_in)
            acc = acc.at[safe].add(contrib)
            return acc, None

        init = jnp.zeros((m_in + 1, co), jnp.float32)
        acc, _ = jax.lax.scan(body, init, (plan.in_idx, weight))
        return acc[:m_in].astype(feats.dtype)


def conv3d(x: SparseTensor,
           weight: jnp.ndarray,
           kernel_size: Union[int, Tuple[int, ...]],
           bias: Optional[jnp.ndarray] = None,
           stride: Union[int, Tuple[int, ...]] = 1,
           dilation: Union[int, Tuple[int, ...]] = 1,
           transposed: bool = False,
           out_capacity: Optional[int] = None) -> SparseTensor:
    """Sparse conv with functional kmap caching, mirroring
    nn/functional/conv.py:86-147 semantics:

      * 1x1x1 stride-1: plain matmul, no coords change;
      * submanifold (stride 1): out coords == in coords;
      * strided: coords downsampled, new coord map registered in cmaps;
      * transposed: reuses the forward plan of the matching down conv and
        restores the cached finer coord map.

    `out_capacity` bounds the downsampled coordinate set (defaults to the
    input capacity — always safe, tune per level for speed).
    """
    kernel_size = coordlib.make_ntuple(kernel_size)
    stride = coordlib.make_ntuple(stride)
    dilation = coordlib.make_ntuple(dilation)

    if kernel_size == (1, 1, 1) and stride == (1, 1, 1) and dilation == (1, 1, 1):
        feats = jnp.dot(x.feats, weight.astype(x.feats.dtype),
                        preferred_element_type=jnp.float32)
        feats = feats.astype(x.feats.dtype)
        if bias is not None:
            feats = feats + bias
        return x.replace(feats=feats)

    if not transposed:
        key = (x.stride, kernel_size, stride, dilation)
        plan = x.kmaps.get(key)
        if plan is None:
            offsets = coordlib.kernel_offsets_np(kernel_size, stride=x.stride,
                                                 dilation=dilation)
            if any(s > 1 for s in stride):
                cap = out_capacity or x.capacity
                out_coords, out_nnz = spops.spdownsample(
                    x.coords, cap, stride, kernel_size, x.stride)
            else:
                out_coords, out_nnz = x.coords, x.nnz
            plan = build_conv_plan(x.coords, out_coords, out_nnz, offsets,
                                   in_capacity=x.capacity,
                                   quantum=x.stride[0] * dilation[0])
            x.kmaps[key] = plan

        feats = apply_conv_plan(x.feats, weight, plan, transposed=False)
        if bias is not None:
            feats = feats + bias
        new_stride = tuple(x.stride[k] * stride[k] for k in range(3))
        out = SparseTensor(feats=feats, coords=plan.out_coords,
                           nnz=plan.out_nnz, stride=new_stride,
                           cmaps=x.cmaps, kmaps=x.kmaps)
    else:
        tensor_stride = tuple(x.stride[k] // stride[k] for k in range(3))
        plan = x.kmaps[(tensor_stride, kernel_size, stride, dilation)]
        feats = apply_conv_plan(x.feats, weight, plan, transposed=True)
        if bias is not None:
            feats = feats + bias
        fine_coords, fine_nnz = x.cmaps[tensor_stride]
        out = SparseTensor(feats=feats, coords=fine_coords, nnz=fine_nnz,
                           stride=tensor_stride, cmaps=x.cmaps, kmaps=x.kmaps)

    out.cmaps.setdefault(out.stride, (out.coords, out.nnz))
    return out
