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

    When the input rows are in pack-key order, the plan additionally
    carries the *window form*: taps grouped by (dy, dz) hit G consecutive
    table rows starting at `base_pos` (sorted-key adjacency), so the conv
    apply gathers ONE (G*C)-wide row per group instead of one row per tap
    — a ~3x cut in gather descriptors, the measured bottleneck (PLAN.md).
    `slot[k, j]` is tap k's window slot relative to its group's base, -1
    on miss. `groups` is the static (tap ids per group) structure.
    """

    in_idx: jnp.ndarray        # (K, M_out) int32
    out_coords: jnp.ndarray    # (M_out, 4) int32
    out_nnz: jnp.ndarray       # () int32
    in_capacity: int = struct.field(pytree_node=False)
    out_capacity: int = struct.field(pytree_node=False)
    base_pos: Any = None       # (Gg, M_out) int32 | None
    slot: Any = None           # (K, M_out) int8 | None
    groups: Any = struct.field(pytree_node=False, default=None)
    # ^ tuple of tuples of tap ids (run order) | None
    inv_idx: Any = None        # (K, N_in) int32 | None — inverse kernel
    # map (built lazily by conv.invert_plan): inv_idx[k, i] = the output
    # row j with in_idx[k, j] == i, or -1. Lets the TRANSPOSED apply run
    # as gather+matmul instead of scatter-add (gathers are ~4x cheaper
    # than f32 scatter-adds on TPU — PLAN.md round-2 profile).
    self_group: Any = struct.field(pytree_node=False, default=None)
    # ^ index into `groups` of the (dy, dz) == (0, 0) group of a
    # SELF-QUERY submanifold plan (output rows == table rows). Its
    # base_pos is provably j or j-1, so the windowed apply replaces its
    # gather with shifted slices + a select — zero gather descriptors.
    mirror: Any = struct.field(pytree_node=False, default=None)
    # ^ static tap permutation with offsets[mirror[k]] == -offsets[k],
    # set for SUBMANIFOLD plans (out rows == in rows, symmetric offset
    # set). Then inv_idx[k] == in_idx[mirror[k]] exactly (coord j has
    # neighbor i at +off iff i has j at -off), so the conv backward
    # w.r.t. features runs as mirrored-tap GATHERS instead of the
    # scatter-adds AD would emit (conv._gm custom_vjp).
    fact_idx: Any = None       # (Gg, M_out) int32 | None — x-FACTORED
    # apply index (conv._fact_apply_impl): one gather per (dy, dz) group
    # into the per-group case array F = [Ybar | E | C | zero-row]
    # (sections of N rows each): the three x-taps are pre-combined by
    # dense MXU matmuls + masked row shifts (sorted-key x-adjacency), so
    # the apply issues 1 descriptor/group instead of 3 — gathers are the
    # measured per-ROW wall (PLAN.md). 3N+... section offsets: center
    # hit -> Ybar row; else left cell hit -> E row (+N); else right cell
    # hit -> C row (+2N); else the zero row (3N).
    fact_adj: Any = None       # (3, N_in) bool | None — static adjacency
    # masks over the (pack-key-sorted) input rows: [0] row i-1 is the
    # x-q cell of row i; [1] row i+1 is the x+q cell; [2] row i+1 is the
    # x+2q cell (the "center missing, both sides present" case).

    @property
    def window(self) -> int:
        """Window width G (max run length across groups)."""
        return max(len(t) for t in self.groups) if self.groups else 0


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
    # base_sorted: whether the tensor's ORIGINAL (creation-time) coords
    # were supplied in pack-key order (b, z, y, x) — the invariant the
    # host collate functions maintain. Propagated unchanged; consulted
    # when a transposed conv restores the creation-stride map.
    base_sorted: bool = struct.field(pytree_node=False, default=False)
    # coords_sorted: whether THIS tensor's coords are in pack-key order.
    # Strided-conv outputs come from unique_coords and set it True;
    # submanifold ops inherit it.
    coords_sorted: bool = struct.field(pytree_node=False, default=False)
    # grid_extent: optional static (nx, ny, nz, nb) bound on the BASE
    # (stride-1) coordinate domain: every valid coord satisfies
    # 0 <= c < extent at stride 1 (levels at stride s occupy multiples of
    # s inside it). Lets conv.py build the dense RankGrid join index for
    # levels whose lattice fits the cell budget (sparse/coords.py).
    # Collate functions set it from the dataset's static domain and DROP
    # the (never-seen-in-practice) voxels beyond it — the same contract
    # pack_coords already applies at the 2^14/2^12 packing bounds.
    grid_extent: Any = struct.field(pytree_node=False, default=None)

    @property
    def is_sorted(self) -> bool:
        return self.coords_sorted

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


def make_sparse_tensor(feats, coords, nnz=None, stride=1,
                       base_sorted: bool = False,
                       grid_extent=None) -> SparseTensor:
    """`base_sorted=True` asserts the valid coords are in pack-key order
    (b, z, y, x) — guaranteed by the host collate functions
    (data/collate.py, data/det_pipeline.collate_det). It unlocks the
    bracketed joins and windowed gathers in sparse/conv.py; passing it for
    unsorted coords silently corrupts kernel maps, so only set it for
    collate-produced batches.

    `grid_extent=(nx, ny, nz, nb)` asserts every valid coord lies in
    [0, extent) — the RankGrid contract (sparse/coords.py build_table);
    collate functions enforce it by dropping out-of-extent voxels."""
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
    if grid_extent is not None:
        grid_extent = tuple(int(v) for v in grid_extent)
    st = SparseTensor(feats=feats, coords=coords, nnz=nnz, stride=stride,
                      base_sorted=base_sorted, coords_sorted=base_sorted,
                      grid_extent=grid_extent)
    st.cmaps[stride] = (coords, nnz)
    return st


def cat(tensors) -> SparseTensor:
    """Channel-wise concat of SparseTensors sharing coords (reference:
    torchsparse/operators.py:9-17)."""
    first = tensors[0]
    feats = jnp.concatenate([t.feats for t in tensors], axis=1)
    return first.replace(feats=feats)
