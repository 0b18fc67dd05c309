"""Pure-NumPy oracle implementations mirroring the reference CPU paths.

These re-derive, in the simplest possible form, the semantics of
torchsparse-u's CPU kernels (reference: backend/*_cpu.cpp and the python
fallbacks in nn/functional/) so that the JAX ops can be property-tested
against an independent implementation.
"""

from __future__ import annotations

import numpy as np


def kernel_offsets(size, stride=1, dilation=1):
    if isinstance(size, int):
        size = (size,) * 3
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(dilation, int):
        dilation = (dilation,) * 3
    axes = [np.arange(-size[k] // 2 + 1, size[k] // 2 + 1) * stride[k] * dilation[k]
            for k in range(3)]
    if int(np.prod(size)) % 2 == 1:
        offs = [[x, y, z] for z in axes[2] for y in axes[1] for x in axes[0]]
    else:
        offs = [[x, y, z] for x in axes[0] for y in axes[1] for z in axes[2]]
    return np.asarray(offs, dtype=np.int32)


def unique_rows(coords):
    """np.unique over rows; returns (unique, inverse). Order is np's
    lexicographic — tests must join by coordinate, not row position."""
    uniq, inverse = np.unique(coords, axis=0, return_inverse=True)
    return uniq, inverse


def coord_index(coords):
    return {tuple(c): i for i, c in enumerate(coords)}


def query(ref_coords, q_coords):
    lut = coord_index(ref_coords)
    return np.asarray([lut.get(tuple(c), -1) for c in q_coords], np.int64)


def spvoxelize(feats, idx, m):
    out = np.zeros((m, feats.shape[1]), np.float64)
    cnt = np.zeros((m,), np.int64)
    for i, j in enumerate(idx):
        if j >= 0:
            out[j] += feats[i]
            cnt[j] += 1
    return out / np.maximum(cnt, 1)[:, None], cnt


def sparse_conv(in_coords, in_feats, weight, kernel_size, tensor_stride=1,
                conv_stride=1):
    """Direct dense-logic sparse conv: out[j] = sum_k in[coord_j + off_k] @ W[k].

    Mirrors conv.py:103-124: offsets scaled by tensor_stride; strided convs
    emit the fast-path downsampled coordinate set.
    """
    offs = kernel_offsets(kernel_size, stride=tensor_stride)
    if conv_stride > 1:
        ss = conv_stride * tensor_stride
        down = in_coords.copy()
        down[:, :3] = down[:, :3] // ss * ss
        out_coords, _ = unique_rows(down)
    else:
        out_coords = in_coords
    lut = coord_index(in_coords)
    co = weight.shape[-1]
    out = np.zeros((len(out_coords), co), np.float64)
    for j, c in enumerate(out_coords):
        for k, off in enumerate(offs):
            key = (c[0] + off[0], c[1] + off[1], c[2] + off[2], c[3])
            i = lut.get(key, -1)
            if i >= 0:
                out[j] += in_feats[i] @ weight[k]
    return out_coords, out


def sparse_conv_transposed(coarse_coords, coarse_feats, fine_coords, weight,
                           kernel_size, fine_tensor_stride, conv_stride):
    """Transposed conv via the forward kernel map with roles swapped
    (conv.py:124 with transposed=True; convolution_forward_cuda swaps
    in_map/out_map)."""
    offs = kernel_offsets(kernel_size, stride=fine_tensor_stride)
    lut = coord_index(fine_coords)
    co = weight.shape[-1]
    out = np.zeros((len(fine_coords), co), np.float64)
    for j, c in enumerate(coarse_coords):
        for k, off in enumerate(offs):
            key = (c[0] + off[0], c[1] + off[1], c[2] + off[2], c[3])
            i = lut.get(key, -1)
            if i >= 0:
                out[i] += coarse_feats[j] @ weight[k]
    return out


def voxel_to_aux(coords, feats, s):
    div = coords.copy()
    div[:, :3] = np.floor_divide(div[:, :3], s)
    aux_coords, inverse = unique_rows(div)
    aux_feats, counts = spvoxelize(feats, inverse, len(aux_coords))
    return aux_coords, aux_feats, inverse, counts


def aux_to_voxel(aux_coords, aux_feats, counts, idx, r):
    """Window-sum + renormalize + broadcast (utils.py:61-84)."""
    offs = kernel_offsets((r, r, r), 1, 1)
    lut = coord_index(aux_coords)
    c = aux_feats.shape[1]
    win = np.zeros((len(aux_coords), c), np.float64)
    tot = np.zeros((len(aux_coords),), np.float64)
    for i, ac in enumerate(aux_coords):
        for off in offs:
            key = (ac[0] + off[0], ac[1] + off[1], ac[2] + off[2], ac[3])
            j = lut.get(key, -1)
            if j >= 0:
                win[i] += aux_feats[j] * counts[j]
                tot[i] += counts[j]
    win = win / np.maximum(tot, 1)[:, None]
    return win[idx]


def random_cloud(rng, n, span=(20, 20, 8), batch=1, channels=4):
    """Random deduplicated voxel cloud."""
    coords = np.stack([
        rng.integers(0, span[0], n),
        rng.integers(0, span[1], n),
        rng.integers(0, span[2], n),
        rng.integers(0, batch, n),
    ], axis=1).astype(np.int32)
    coords = np.unique(coords, axis=0)
    feats = rng.standard_normal((len(coords), channels)).astype(np.float32)
    return coords, feats
