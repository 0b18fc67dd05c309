"""spconv-semantics sparse convolution (detection backbone).

The detection reference builds on spconv 2.x (reference:
detection/det3d/models/backbones/scn.py). spconv differs from torchsparse
in two ways that matter for coordinate parity:

  * coords are per-level grid indices (b, z, y, x) — NOT multiples of the
    cumulative stride. We store them in our (x, y, z, b) column order and
    keep SparseTensor.stride == 1 at every level.
  * a strided SparseConv3d with padding emits every output cell j whose
    kernel window touches an input: j in [ceil((i + p - k + 1)/s),
    floor((i + p)/s)] per axis, clipped to the output spatial shape
    out_shape = floor((in + 2p - k)/s) + 1.

Kernel taps are enumerated t in [0, k)^3 (x-major, z fastest, matching our
even-kernel torchsparse order); the input cell feeding output j through tap
t is i = j*s - p + t.
"""

from __future__ import annotations

import os
from itertools import product
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import coords as coordlib
from .conv import apply_conv_plan, build_conv_plan, invert_plan
from .tensor import ConvPlan, SparseTensor

# Build the inverse kernel map for STRIDED plans at plan time so the
# custom conv VJP (conv._gm) can run the feature backward as gathers.
# Costs K int32 scatters per forward — pure overhead for inference (no
# deconv reuses det plans), so the det trainer flips this on only around
# training traces (train/det_trainer.py).
EAGER_INVERT = False


def spconv_out_shape(in_shape, kernel_size, stride, padding):
    return tuple((in_shape[a] + 2 * padding[a] - kernel_size[a]) // stride[a] + 1
                 for a in range(3))


def ensure_level_table(st: SparseTensor, in_shape, batch_size: int) -> None:
    """Seed the level's shared key table WITH the dense rank-grid index
    (coords.RankGrid) before any conv builds it without one. The det
    backbone calls this at each level start: spconv levels are unit
    lattices with static (x, y, z) extents, exactly the rank grid's
    domain, and the grid turns every (dy, dz) group join at the level
    into ONE 4-byte gather (vs the DirectIndex 3-gather + key-compare
    pipeline). No-op when the grid exceeds coords.RANK_GRID_MAX_CELLS
    (build_table falls back to DirectIndex-only) or the table exists."""
    tkey = ("table", st.stride)
    if tkey not in st.kmaps:
        gs = (int(in_shape[0]), int(in_shape[1]), int(in_shape[2]),
              int(batch_size))
        st.kmaps[tkey] = coordlib.build_table(
            st.coords, assume_sorted=st.is_sorted, grid_shape=gs)


def _tap_offsets(kernel_size) -> np.ndarray:
    """(K, 3) tap indices t, x-major with z fastest."""
    return np.asarray(
        [[tx, ty, tz] for tx in range(kernel_size[0])
         for ty in range(kernel_size[1]) for tz in range(kernel_size[2])],
        np.int32)


# dense-occupancy dedup is used when batch * out_cells fits this budget
# (int8 occupancy + int32 cumsum ~ 5 B/cell transient)
DENSE_UNIQUE_MAX_CELLS = 48_000_000
# the max-pool form additionally scatters into the INPUT grid (int8/cell)
DENSE_POOL_MAX_CELLS = 192_000_000


def _pool_downsample(coords, kernel_size, stride, padding, in_shape,
                     out_shape, out_capacity: int, batch_size: int):
    """Output-coordinate dedup as a strided max-pool over the INPUT
    occupancy grid. An output cell j is occupied iff some input i lies in
    its kernel window (0 <= i + p - j*s < ks per axis) — exactly a
    reduce_window-max with window ks, stride s, padding p. vs the
    candidate form below this scatters N rows instead of ~(ks/s)^3*N and
    compacts via searchsorted on the cumsum instead of a second big
    scatter (round-4 det profile: the candidate scatters were ~42 ms of
    the 60 ms dedup slice)."""
    ks = np.asarray(kernel_size)
    st = np.asarray(stride)
    pd = np.asarray(padding)
    inx, iny, inz = (int(v) for v in np.asarray(in_shape))
    nx, ny, nz = (int(v) for v in np.asarray(out_shape))
    in_cells = batch_size * inx * iny * inz
    ix, iy, iz, ib = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    # per-axis bounds: a negative-but-packable or >= in_shape coordinate
    # would alias into a neighboring (b, z, y) line through the
    # linearization (negative lin_in even wraps NumPy-style); inputs are
    # in-bounds by construction today, but guard like to_dense_bev does
    valid = ((ix >= 0) & (ix < inx) & (iy >= 0) & (iy < iny)
             & (iz >= 0) & (iz < inz) & (ib >= 0) & (ib < batch_size))
    lin_in = ((ib * inz + iz) * iny + iy) * inx + ix
    lin_in = jnp.where(valid, lin_in, in_cells)
    occ_in = jnp.zeros((in_cells + 1,), jnp.int8).at[lin_in].max(jnp.int8(1))
    grid = occ_in[:in_cells].reshape(batch_size, inz, iny, inx)
    out_occ = jax.lax.reduce_window(
        grid, jnp.int8(0), jax.lax.max,
        window_dimensions=(1, int(ks[2]), int(ks[1]), int(ks[0])),
        window_strides=(1, int(st[2]), int(st[1]), int(st[0])),
        padding=((0, 0), (int(pd[2]), int(pd[2])),
                 (int(pd[1]), int(pd[1])), (int(pd[0]), int(pd[0]))))
    assert out_occ.shape == (batch_size, nz, ny, nx), (
        out_occ.shape, (batch_size, nz, ny, nx))
    # Rank-select the occupied cells in pack-key order at WORD granularity
    # (32 cells / uint32 word, RankGrid-style): the per-CELL cumsum +
    # searchsorted ran its 24 unrolled probe rounds against a multi-
    # million-row table — past the gather engine's table-size cliff
    # (round-5 det profile: 25 ms/frame). The word form searches a 32x
    # smaller table and decodes the in-word bit with pure VPU popcounts.
    cells = batch_size * nz * ny * nx
    nwords = -(-cells // 32)
    flat = out_occ.reshape(-1)
    if nwords * 32 != cells:
        flat = jnp.concatenate(
            [flat, jnp.zeros((nwords * 32 - cells,), jnp.int8)])
    bits = flat.reshape(nwords, 32).astype(jnp.uint32)
    words = jnp.sum(bits << jnp.arange(32, dtype=jnp.uint32)[None, :],
                    axis=1, dtype=jnp.uint32)
    pc = jax.lax.population_count(words).astype(jnp.int32)
    wcsum = jnp.cumsum(pc)
    total = wcsum[-1]
    targets = jnp.arange(1, out_capacity + 1, dtype=jnp.int32)
    found = targets <= total
    # rank -> word by inverse scatter + cummax instead of searchsorted:
    # each occupied word owns ranks [wcsum-pc, wcsum), so scattering its
    # index at its first rank and forward-cummax-ing assigns every rank
    # its word in ONE pass (the searchsorted form ran 19 unrolled rounds
    # of SCALAR-element gathers — 19 ms/frame in the round-5 det profile)
    start = wcsum - pc
    occ_w = pc > 0
    spos = jnp.where(occ_w & (start < out_capacity), start, out_capacity)
    marks = jnp.zeros((out_capacity + 1,), jnp.int32).at[spos].max(
        jnp.arange(nwords, dtype=jnp.int32), mode="drop")
    wi_c = jnp.minimum(jax.lax.cummax(marks[:out_capacity]), nwords - 1)
    base = jnp.where(wi_c > 0, wcsum[jnp.maximum(wi_c - 1, 0)], 0)
    resid = targets - 1 - base                     # rank within the word
    w = words[wi_c]
    # bit position of the (resid+1)-th set bit: prefix-popcount compare
    prefix = jax.lax.population_count(
        w[:, None] & ((jnp.uint32(1) << jnp.arange(
            32, dtype=jnp.uint32)[None, :]) - 1).astype(jnp.uint32)
    ).astype(jnp.int32)                            # (cap, 32)
    is_set = ((w[:, None] >> jnp.arange(32, dtype=jnp.uint32)[None, :])
              & 1).astype(jnp.int32)
    hit = (prefix == resid[:, None]) & (is_set == 1)
    bitpos = jnp.argmax(hit, axis=1).astype(jnp.int32)
    pos = wi_c * 32 + bitpos
    ox = pos % nx
    t = pos // nx
    oy = t % ny
    t = t // ny
    oz = t % nz
    ob = t // nz
    out_coords = jnp.where(
        found[:, None], jnp.stack([ox, oy, oz, ob], axis=1),
        jnp.int32(coordlib.INVALID_COORD)).astype(jnp.int32)
    out_nnz = jnp.minimum(total, out_capacity)
    return coordlib.checkpoint_name(out_coords, coordlib.PLAN_TAG), out_nnz


def spconv_downsample(coords: jnp.ndarray, kernel_size, stride, padding,
                      out_shape, out_capacity: int,
                      batch_size: int = None, in_shape=None):
    """Enumerate the spconv output coordinate set: all j reachable from any
    input voxel through any tap, clipped to out_shape. Returns
    (out_coords, out_nnz), rows in pack-key (b, z, y, x) order.

    With a known static `batch_size`, dedup runs dense: preferably the
    max-pool form over the input grid (`_pool_downsample`, needs
    `in_shape`), else an occupancy grid over the (static) output shape —
    scatter 1s, cumsum for slot ids, scatter-compact — instead of sorting
    the ~8N candidate rows (round-2 det profile: the unique sort was
    35 ms/fwd). Cumsum order over (b, z, y, x)-major cells IS pack-key
    order, so the output is sorted by construction. `DET_DEDUP` in
    {pool, occ, sort} forces a path for A/B."""
    force = os.environ.get("DET_DEDUP", "")
    if batch_size and in_shape is not None and force != "occ":
        in_cells = batch_size * int(np.prod(np.asarray(in_shape)))
        if force == "pool" or (force != "sort"
                               and in_cells <= DENSE_POOL_MAX_CELLS):
            return _pool_downsample(coords, kernel_size, stride, padding,
                                    in_shape, out_shape, out_capacity,
                                    batch_size)
    s = jnp.asarray(stride, jnp.int32)
    p = jnp.asarray(padding, jnp.int32)
    ks_np = np.asarray(kernel_size)
    s_np = np.asarray(stride)
    xyz = coords[:, :3]
    # An input i reaches outputs j with 0 <= (i+p) - j*s < ks, i.e. at
    # most ceil(ks/s) distinct j PER DIM — enumerate those instead of all
    # K taps (ks3/s2: 8 candidates vs 27).
    n_per = [int((ks_np[a] - 1) // s_np[a]) + 1 for a in range(3)]
    base = (xyz + p[None, :]) // s[None, :]               # floor j per dim
    out_sh = jnp.asarray(out_shape, jnp.int32)
    pad_row = (xyz[:, 0] <= coordlib.INVALID_COORD)[:, None]
    cands = []
    for mx in range(n_per[0]):
        for my in range(n_per[1]):
            for mz in range(n_per[2]):
                j = base - jnp.asarray([mx, my, mz], jnp.int32)[None, :]
                t = xyz + p[None, :] - j * s[None, :]     # tap index
                ok = jnp.all((t >= 0) & (t < jnp.asarray(ks_np)[None, :])
                             & (j >= 0) & (j < out_sh[None, :]),
                             axis=-1, keepdims=True) & ~pad_row
                jj = jnp.where(ok, j, jnp.int32(coordlib.INVALID_COORD))
                b = jnp.where(ok, coords[:, 3:],
                              jnp.int32(coordlib.INVALID_COORD))
                cands.append(jnp.concatenate([jj, b], axis=-1))
    cand = jnp.concatenate(cands, axis=0)

    nx, ny, nz = (int(v) for v in np.asarray(out_shape))
    cells = (batch_size or 0) * nx * ny * nz
    if not batch_size or cells > DENSE_UNIQUE_MAX_CELLS:
        out_coords, _, out_nnz = coordlib.unique_coords(cand, out_capacity)
        return out_coords, out_nnz

    cx, cy, cz, cb = cand[:, 0], cand[:, 1], cand[:, 2], cand[:, 3]
    valid = (cx > coordlib.INVALID_COORD) & (cb >= 0) & (cb < batch_size)
    lin = ((cb * nz + cz) * ny + cy) * nx + cx            # pack-key major
    lin = jnp.where(valid, lin, cells)
    occ = jnp.zeros((cells + 1,), jnp.int8).at[lin].max(jnp.int8(1))
    csum = jnp.cumsum(occ[:cells], dtype=jnp.int32)
    total = csum[-1]
    slot = csum[jnp.minimum(lin, cells - 1)] - 1          # unique slot
    slot = jnp.where(valid & (slot < out_capacity), slot, out_capacity)
    out_coords = jnp.full((out_capacity + 1, 4), coordlib.INVALID_COORD,
                          jnp.int32).at[slot].set(cand, mode="drop")
    out_nnz = jnp.minimum(total, out_capacity)
    return (coordlib.checkpoint_name(out_coords[:out_capacity],
                                     coordlib.PLAN_TAG), out_nnz)


def build_spconv_plan(in_coords: jnp.ndarray, out_coords: jnp.ndarray,
                      out_nnz, kernel_size, stride, padding,
                      in_capacity: int, in_sorted: bool = False,
                      out_sorted: bool = False, table=None) -> ConvPlan:
    """Kernel map: input for output j, tap t is i = j*s - p + t.
    Sortedness flags as in conv.build_conv_plan: `in_sorted` skips the
    table sort and yields the window-form plan, `out_sorted` enables the
    bracketed search."""
    taps = _tap_offsets(kernel_size)
    s = np.asarray(stride, np.int32)
    p = np.asarray(padding, np.int32)
    if table is None:
        table = coordlib.build_table(in_coords, assume_sorted=in_sorted)
    eff_offs = taps - p[None, :]
    if coordlib.can_group_offsets(eff_offs, 1):
        # Grouped/bracketed join works for STRIDED convs too: the query
        # base is out_coords * s, and scaling by a positive stride
        # preserves pack-key order, so out_sorted still enables the
        # bracketed search (this path was gated to stride 1 before —
        # the det backbone's ks3/s2 downs ran full unsorted searches,
        # ~half its device time).
        if (s == 1).all():
            base_coords = out_coords
            selfq = in_sorted and out_coords is in_coords
        else:
            base_coords = jnp.concatenate(
                [out_coords[:, :3] * jnp.asarray(s, jnp.int32)[None, :],
                 out_coords[:, 3:]], axis=1)
            selfq = False
        # strided queries advance ~s table rows each, so typical brackets
        # are ~s x wider — deepen the static refine to match (else the
        # hard pass overflows into the while backstop, seen in the det
        # profile as while iterations)
        extra = int(np.ceil(np.log2(max(1, int(np.max(np.asarray(
            stride)))))))
        in_idx, base_pos, slot = coordlib.grouped_window_query(
            table, base_coords, eff_offs, 1,
            queries_sorted=out_sorted, identity_perm=in_sorted,
            self_query=selfq, refine_extra=extra)
        groups = None
        self_gi = None
        if base_pos is not None:
            glist = coordlib.offset_groups(eff_offs)
            groups = tuple(tuple(t for _, t in g) for _, g in glist)
            if selfq:
                self_gi = next(
                    (gi for gi, ((ox0, oy, oz), _) in enumerate(glist)
                     if oy == 0 and oz == 0 and ox0 in (0, -1)), None)
        fact_idx = fact_adj = None
        from .conv import FACTORED_APPLY
        if (FACTORED_APPLY != "0"
                and base_pos is not None and groups is not None
                and all(len(t) <= 3 for t in groups)
                and any(len(t) >= 2 for t in groups)):
            # spconv levels are unit lattices (per-level grid indices), so
            # the x-factored apply's adjacency argument holds with q == 1
            from .conv import build_fact_index
            fact_idx, fact_adj = build_fact_index(
                in_idx, groups, table.rows, 1, in_capacity)
        return ConvPlan(in_idx=in_idx, out_coords=out_coords,
                        out_nnz=out_nnz, in_capacity=in_capacity,
                        out_capacity=out_coords.shape[0],
                        base_pos=base_pos, slot=slot, groups=groups,
                        self_group=self_gi, fact_idx=fact_idx,
                        fact_adj=fact_adj)
    base = out_coords[None, :, :3] * jnp.asarray(s)[None, None, :]
    q = base + jnp.asarray(eff_offs)[:, None, :]
    qb = jnp.broadcast_to(out_coords[None, :, 3:],
                          (taps.shape[0],) + out_coords[:, 3:].shape)
    q4 = jnp.concatenate([q, qb], axis=-1)
    in_idx = table.query(q4)
    return ConvPlan(in_idx=in_idx, out_coords=out_coords, out_nnz=out_nnz,
                    in_capacity=in_capacity, out_capacity=out_coords.shape[0])


def spconv3d(x: SparseTensor, weight: jnp.ndarray,
             kernel_size: Union[int, Tuple[int, ...]],
             in_shape: Tuple[int, int, int],
             stride: Union[int, Tuple[int, ...]] = 1,
             padding: Union[int, Tuple[int, ...]] = 0,
             bias: Optional[jnp.ndarray] = None,
             out_capacity: Optional[int] = None,
             batch_size: Optional[int] = None):
    """Strided spconv conv. `in_shape` / returned out_shape are (x, y, z)
    spatial extents of the level's grid. Weight layout (K, Ci, Co) with taps
    in _tap_offsets order. Returns (SparseTensor, out_shape)."""
    ks = coordlib.make_ntuple(kernel_size)
    st = coordlib.make_ntuple(stride)
    pd = coordlib.make_ntuple(padding)
    out_shape = spconv_out_shape(in_shape, ks, st, pd)
    cap = out_capacity or x.capacity
    key = ("spconv", in_shape, ks, st, pd)
    plan = x.kmaps.get(key)
    if plan is None:
        out_coords, out_nnz = spconv_downsample(x.coords, ks, st, pd,
                                                out_shape, cap,
                                                batch_size=batch_size,
                                                in_shape=in_shape)
        # share the level's key table with the SubM convs (conv3d caches
        # it under the same key)
        tkey = ("table", x.stride)
        table = x.kmaps.get(tkey)
        if table is None:
            gs = ((int(in_shape[0]), int(in_shape[1]), int(in_shape[2]),
                   int(batch_size)) if batch_size and x.is_sorted else None)
            table = coordlib.build_table(x.coords,
                                         assume_sorted=x.is_sorted,
                                         grid_shape=gs)
            x.kmaps[tkey] = table
        plan = build_spconv_plan(x.coords, out_coords, out_nnz, ks, st, pd,
                                 in_capacity=x.capacity,
                                 in_sorted=x.is_sorted, out_sorted=True,
                                 table=table)
        if EAGER_INVERT and plan.mirror is None:
            plan = plan.replace(inv_idx=invert_plan(plan))
        x.kmaps[key] = plan
    feats = apply_conv_plan(x.feats, weight, plan)
    if bias is not None:
        feats = feats + bias
    # Fresh caches: every spconv level is a new lattice at stride 1, so
    # submanifold kmap keys would collide across levels if shared. Coords
    # come from unique_coords -> pack-key sorted.
    out = SparseTensor(feats=feats, coords=plan.out_coords, nnz=plan.out_nnz,
                       stride=(1, 1, 1), cmaps={}, kmaps={},
                       base_sorted=True, coords_sorted=True)
    out.cmaps[out.stride] = (out.coords, out.nnz)
    return out, out_shape


def to_dense_bev(x: SparseTensor, spatial_shape: Tuple[int, int, int],
                 batch_size: int) -> jnp.ndarray:
    """SparseConvTensor.dense() + reshape (scn.py:612-617): scatter voxels
    into (B, C*D, H, W) with D = z extent, H = y, W = x."""
    W, H, D = spatial_shape
    c = x.num_channels
    xx, yy, zz, bb = (x.coords[:, 0], x.coords[:, 1], x.coords[:, 2],
                      x.coords[:, 3])
    valid = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H) & (zz >= 0) & (zz < D) \
        & (bb >= 0) & (bb < batch_size)
    flat = ((bb * D + zz) * H + yy) * W + xx
    flat = jnp.where(valid, flat, batch_size * D * H * W)
    dense = jnp.zeros((batch_size * D * H * W + 1, c), x.feats.dtype)
    dense = dense.at[flat].set(jnp.where(valid[:, None], x.feats, 0.0))
    dense = dense[:-1].reshape(batch_size, D, H, W, c)
    # torch .dense() yields (B, C, D, H, W); view(B, C*D, H, W) keeps C outer.
    dense = jnp.transpose(dense, (0, 4, 1, 2, 3))      # (B, C, D, H, W)
    return dense.reshape(batch_size, c * D, H, W)
