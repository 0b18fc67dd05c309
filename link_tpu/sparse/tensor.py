"""Fixed-capacity sparse voxel tensor (pytree).

TPU-native replacement for torchsparse's SparseTensor (reference:
segmentation/torchsparse-u/torchsparse/tensor.py:10-67). Differences forced
by XLA's static-shape model:

  * `feats` / `coords` have a static row capacity; `nnz` (traced scalar)
    counts the valid prefix-agnostic rows. Padding rows carry
    `INVALID_COORD` coords and arbitrary feats — every aggregation op masks
    them out via key sentinels, so padded garbage never leaks.
  * The reference's `cmaps` (stride -> coords) and `kmaps` (kernel-map
    cache, tensor.py:29-30 + nn/functional/conv.py:104-123) become plain
    dicts of arrays carried on the pytree; under `jit` the dict plumbing is
    trace-time only and costs nothing at runtime.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from . import coords as coordlib


@struct.dataclass
class ConvPlan:
    """Kernel map for one (in_stride, kernel_size, stride, dilation) combo.

    `in_idx[k, j]` is the input row feeding output row `j` through tap `k`,
    or -1 on miss — the gather-form equivalent of the reference's
    (nbmaps, nbsizes) pair (nn/functional/conv.py:117-122).

    """

    in_idx: jnp.ndarray        # (K, M_out) int32
    out_coords: jnp.ndarray    # (M_out, 4) int32
    out_nnz: jnp.ndarray       # () int32
    in_capacity: int = struct.field(pytree_node=False)
    out_capacity: int = struct.field(pytree_node=False)


@struct.dataclass
class SparseTensor:
    feats: jnp.ndarray                      # (N, C)
    coords: jnp.ndarray                     # (N, 4) int32 (x, y, z, batch)
    nnz: jnp.ndarray                        # () int32
    stride: Tuple[int, int, int] = struct.field(pytree_node=False, default=(1, 1, 1))
    # stride -> (coords, nnz) of the coordinate map at that stride
    cmaps: Dict[Tuple[int, ...], Any] = struct.field(default_factory=dict)
    # (in_stride, ks, stride, dilation) -> ConvPlan
    kmaps: Dict[Tuple[Any, ...], ConvPlan] = struct.field(default_factory=dict)

    @property
    def capacity(self) -> int:
        return self.feats.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[1]

    def valid_mask(self) -> jnp.ndarray:
        """(N,) bool — which rows are real voxels. Derived from coords so it
        stays correct for tensors whose valid rows are not a prefix."""
        hi, _ = coordlib.pack_coords(self.coords)
        return coordlib.key_is_valid(hi)

    def replace_feats(self, feats: jnp.ndarray) -> "SparseTensor":
        return self.replace(feats=feats)


def make_sparse_tensor(feats, coords, nnz=None, stride=1) -> SparseTensor:
    stride = coordlib.make_ntuple(stride)
    coords = jnp.asarray(coords, jnp.int32)
    feats = jnp.asarray(feats)
    n = coords.shape[0]
    if nnz is None:
        nnz = jnp.asarray(n, jnp.int32)
    else:
        nnz = jnp.asarray(nnz, jnp.int32)
        # Force padding rows (index >= nnz) to the sentinel so joins skip them.
        row = jnp.arange(n, dtype=jnp.int32)
        coords = jnp.where((row < nnz)[:, None], coords,
                           jnp.int32(coordlib.INVALID_COORD))
    st = SparseTensor(feats=feats, coords=coords, nnz=nnz, stride=stride)
    st.cmaps[stride] = (coords, nnz)
    return st


def cat(tensors) -> SparseTensor:
    """Channel-wise concat of SparseTensors sharing coords (reference:
    torchsparse/operators.py:9-17)."""
    first = tensors[0]
    feats = jnp.concatenate([t.feats for t in tensors], axis=1)
    return first.replace(feats=feats)
