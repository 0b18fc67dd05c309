"""Point <-> voxel transforms for point-voxel models (SPVCNN).

Reference: segmentation/core/models/utils.py:234-323 (initial_voxelize,
point_to_voxel, voxel_to_point) and torchsparse's trilinear
`calc_ti_weights` (nn/functional/devoxelize.py:11-48).

PointTensor carries float coords (x, y, z, batch); voxel joins floor the
coords by the tensor stride. Caches (the reference's
`additional_features['idx_query']`) are carried in a plain dict.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..sparse import coords as coordlib
from ..sparse import ops as spops
from ..sparse.tensor import SparseTensor


@struct.dataclass
class PointTensor:
    feats: jnp.ndarray      # (Np, C)
    coords: jnp.ndarray     # (Np, 4) float32, batch in last column
    nnz: jnp.ndarray        # () int32
    caches: Dict = struct.field(default_factory=dict)

    def valid_mask(self):
        return jnp.arange(self.coords.shape[0]) < self.nnz

    def replace_feats(self, feats):
        return self.replace(feats=feats)


def make_point_tensor(feats, coords, nnz=None) -> PointTensor:
    coords = jnp.asarray(coords, jnp.float32)
    n = coords.shape[0]
    nnz = jnp.asarray(n if nnz is None else nnz, jnp.int32)
    return PointTensor(feats=jnp.asarray(feats), coords=coords, nnz=nnz)


def _int_coords(pt: PointTensor, floor_div: float = 1.0) -> jnp.ndarray:
    """Floor float point coords to int voxel coords, keeping padding rows
    sentinel."""
    xyz = jnp.floor(pt.coords[:, :3] / floor_div).astype(jnp.int32)
    if floor_div != 1.0:
        xyz = xyz * jnp.int32(int(floor_div))
    b = pt.coords[:, 3:].astype(jnp.int32)
    c = jnp.concatenate([xyz, b], axis=1)
    return jnp.where(pt.valid_mask()[:, None], c,
                     jnp.int32(coordlib.INVALID_COORD))


def initial_voxelize(pt: PointTensor, init_res: float, after_res: float,
                     capacity: int) -> Tuple[SparseTensor, jnp.ndarray]:
    """utils.py:234-254: rescale float coords, floor, dedup, mean-pool.
    Returns (voxel tensor, idx_query) and caches idx/counts under key 1."""
    scaled = jnp.concatenate(
        [pt.coords[:, :3] * (init_res / after_res), pt.coords[:, 3:]], axis=1)
    pt_scaled = pt.replace(coords=scaled)
    ic = _int_coords(pt_scaled)
    out_coords, idx_query, out_nnz = coordlib.unique_coords(ic, capacity)
    counts = spops.spcount(idx_query, capacity)
    feats = spops.spvoxelize(pt.feats, idx_query, counts)
    st = SparseTensor(feats=feats, coords=out_coords, nnz=out_nnz,
                      stride=(1, 1, 1), base_sorted=True, coords_sorted=True)
    st.cmaps[st.stride] = (out_coords, out_nnz)
    pt.caches[("idx", (1, 1, 1))] = idx_query
    pt.caches[("counts", (1, 1, 1))] = counts
    return st, idx_query


def point_to_voxel(st: SparseTensor, pt: PointTensor) -> SparseTensor:
    """utils.py:259-282: mean-pool point feats onto st's coords."""
    key = ("idx", st.stride)
    if key in pt.caches:
        idx_query = pt.caches[key]
        counts = pt.caches[("counts", st.stride)]
    else:
        s = st.stride[0]
        xyz = (jnp.floor(pt.coords[:, :3] / s) * s).astype(jnp.int32)
        qc = jnp.concatenate([xyz, pt.coords[:, 3:].astype(jnp.int32)], axis=1)
        qc = jnp.where(pt.valid_mask()[:, None], qc,
                       jnp.int32(coordlib.INVALID_COORD))
        table = coordlib.build_table(st.coords)
        idx_query = table.query(qc)
        counts = spops.spcount(idx_query, st.capacity)
        pt.caches[key] = idx_query
        pt.caches[("counts", st.stride)] = counts
    feats = spops.spvoxelize(pt.feats, idx_query, counts)
    return st.replace(feats=feats)


def calc_ti_weights(pc: jnp.ndarray, idx_query: jnp.ndarray,
                    scale: float) -> jnp.ndarray:
    """Trilinear weights over the 8 floor-corner voxels
    (devoxelize.py:11-48). pc: (Np, 3) float; idx_query: (Np, 8)."""
    p = pc
    pf = jnp.floor(pc / scale) * scale if scale != 1 else jnp.floor(pc)
    pcn = pf + scale
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    xf, yf, zf = pf[:, 0], pf[:, 1], pf[:, 2]
    xc, yc, zc = pcn[:, 0], pcn[:, 1], pcn[:, 2]
    w = jnp.stack([
        (xc - x) * (yc - y) * (zc - z),
        (xc - x) * (yc - y) * (z - zf),
        (xc - x) * (y - yf) * (zc - z),
        (xc - x) * (y - yf) * (z - zf),
        (x - xf) * (yc - y) * (zc - z),
        (x - xf) * (yc - y) * (z - zf),
        (x - xf) * (y - yf) * (zc - z),
        (x - xf) * (y - yf) * (z - zf),
    ], axis=1)
    if scale != 1:
        w = w / scale ** 3
    w = jnp.where(idx_query >= 0, w, 0.0)
    w = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-8)
    return w


def voxel_to_point(st: SparseTensor, pt: PointTensor,
                   nearest: bool = False) -> PointTensor:
    """utils.py:287-323: trilinear (or nearest) interpolation of voxel feats
    at float point positions."""
    s = st.stride[0]
    key = ("v2p_idx", st.stride)
    if key in pt.caches:
        idx_query = pt.caches[key]
        weights = pt.caches[("v2p_w", st.stride)]
    else:
        offs = jnp.asarray(coordlib.kernel_offsets_np((2, 2, 2), stride=st.stride),
                           jnp.int32)                      # (8, 3)
        base = (jnp.floor(pt.coords[:, :3] / s) * s).astype(jnp.int32)
        qxyz = base[:, None, :] + offs[None, :, :]          # (Np, 8, 3)
        b = jnp.broadcast_to(pt.coords[:, None, 3:].astype(jnp.int32),
                             qxyz.shape[:2] + (1,))
        qc = jnp.concatenate([qxyz, b], axis=-1)
        qc = jnp.where(pt.valid_mask()[:, None, None], qc,
                       jnp.int32(coordlib.INVALID_COORD))
        table = coordlib.build_table(st.coords)
        idx_query = table.query(qc)                         # (Np, 8)
        weights = calc_ti_weights(pt.coords[:, :3], idx_query, float(s))
        if nearest:
            weights = weights.at[:, 1:].set(0.0)
            idx_query = idx_query.at[:, 1:].set(-1)
        pt.caches[key] = idx_query
        pt.caches[("v2p_w", st.stride)] = weights
    feats = spops.spdevoxelize(st.feats, idx_query, weights)
    return pt.replace(feats=feats)
