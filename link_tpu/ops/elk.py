"""ELK pre-aggregation ops: voxel <-> aux-block transforms + upsampling.

TPU-native equivalents of segmentation/core/models/utils.py:
  * voxel_to_aux   (utils.py:44-58)  — coarsen coords by s, unique,
    mean-pool voxel feats into aux blocks;
  * aux_to_voxel   (utils.py:61-84)  — sum each aux cell's r^3 neighborhood
    (count-weighted), renormalize by total count, broadcast back to voxels;
  * upsample_voxel (utils.py:327-340) — broadcast coarse-level feats to the
    fine level via an exact ancestor join.

Hash build/query chains become sorted-key joins; spcount/spvoxelize become
segment sums; the r^3 gather is a static (K, M) gather-sum.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse import coords as coordlib
from ..sparse import ops as spops
from ..sparse.dense_grid import box_sum
from ..sparse.tensor import SparseTensor


# Dense-aux path budget: bytes of the f32 (cells, C+1) aux grid. Det aux
# lattices are tiny (L0: 206x206x6 = 255k cells at block 7 over the
# 1440x1440x41 grid); seg lattices at 0.05 m blow past this and keep the
# sparse join path.
DENSE_AUX_MAX_BYTES = 256 * 1024 * 1024
DENSE_AUX_ENABLED = True  # A/B: link_tpu.ops.elk.DENSE_AUX_ENABLED = False


def aux_grid_shape(x: SparseTensor, s: int):
    """RAW-extent (nx, ny, nz, nb) bound of x's coord domain (for the
    dense-aux path), from grid_extent (seg) or the level table's RankGrid
    (det), or None."""
    if x.grid_extent is not None:
        return tuple(int(v) for v in x.grid_extent)
    ltab = x.kmaps.get(("table", x.stride))
    g = getattr(ltab, "grid", None) if ltab is not None else None
    if g is not None:
        return (g.nx * g.quantum, g.ny * g.quantum, g.nz * g.quantum, g.nb)
    return None


def elk_aux_window_dense(mod: jnp.ndarray, coords: jnp.ndarray, s: int,
                         r: int, grid_shape) -> jnp.ndarray:
    """Fused voxel_to_aux + aux_to_voxel on a DENSE aux grid: scatter-add
    the modulated feats (and an occupancy count) into the s^3-block grid,
    take the centered r^3 box sum (reduce_window — bandwidth-bound, ZERO
    gather descriptors), and gather each voxel's result back by its block
    cell. Exactly the reference's count-weighted window mean
    (segmentation/core/models/utils.py:61-84): the sparse form pools
    means then re-multiplies by counts, i.e. sums — which is what the
    scatter accumulates directly. Replaces the det profile's aux-join
    slice (unique sort + rank-word gathers + 27-tap window gathers,
    ~35 ms/frame at the 160k cap, round 5)."""
    assert r % 2 == 1
    nxr, nyr, nzr, nb = (int(v) for v in grid_shape)
    nxa, nya, nza = -(-nxr // s), -(-nyr // s), -(-nzr // s)
    cells = nb * nza * nya * nxa
    c = mod.shape[1]
    x, y, z, b = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    valid = ((x >= 0) & (x < nxr) & (y >= 0) & (y < nyr)
             & (z >= 0) & (z < nzr) & (b >= 0) & (b < nb))
    lin = (((b * nza + z // s) * nya + y // s) * nxa + x // s)
    lin = jnp.where(valid, lin, cells)
    sums = jnp.zeros((cells + 1, c), jnp.float32).at[lin].add(
        jnp.where(valid[:, None], mod, 0).astype(jnp.float32))
    cnts = jnp.zeros((cells + 1,), jnp.float32).at[lin].add(
        valid.astype(jnp.float32))
    grid = sums[:cells].reshape(nb, nza, nya, nxa, c)
    cgrid = cnts[:cells].reshape(nb, nza, nya, nxa, 1)
    win = box_sum(grid, r)
    wc = box_sum(cgrid, r)[..., 0]
    new = win / jnp.where(wc == 0, 1, wc)[..., None]
    flat = jnp.concatenate(
        [new.reshape(cells, c), jnp.zeros((1, c), new.dtype)])
    return flat[lin].astype(mod.dtype)


def use_dense_aux(x: SparseTensor, s: int, r: int, channels: int):
    """Gate + grid shape for the dense-aux path."""
    if not DENSE_AUX_ENABLED or r % 2 != 1:
        return None
    gs = aux_grid_shape(x, s)
    if gs is None:
        return None
    nxr, nyr, nzr, nb = (int(v) for v in gs)
    cells = nb * (-(-nxr // s)) * (-(-nyr // s)) * (-(-nzr // s))
    if cells * (channels + 1) * 4 > DENSE_AUX_MAX_BYTES:
        return None
    return gs


def voxel_to_aux(x: SparseTensor, s: int, aux_capacity: int):
    """Pool voxels into s^3 aux blocks.

    Returns (aux, idx_query, counts):
      aux:       SparseTensor of aux cells; coords are *divided* coords
                 (floor(voxel_coord / s), batch), like the reference which
                 keys aux cells by x_C = C[:, :3] // s (utils.py:45).
      idx_query: (N,) voxel -> aux slot (-1 for padding rows)
      counts:    (M_aux,) voxels per aux cell
    """
    div = jnp.concatenate(
        [jnp.where(x.coords[:, :1] <= coordlib.INVALID_COORD,
                   x.coords[:, :3],
                   x.coords[:, :3] // jnp.int32(s)),
         x.coords[:, 3:]], axis=1)
    aux_coords, idx_query, aux_nnz = coordlib.unique_coords(div, aux_capacity)
    counts = spops.spcount(idx_query, aux_capacity)
    aux_feats = spops.spvoxelize(x.feats, idx_query, counts)
    aux = SparseTensor(feats=aux_feats, coords=aux_coords, nnz=aux_nnz,
                       stride=(s, s, s), cmaps=x.cmaps, kmaps=x.kmaps,
                       base_sorted=x.base_sorted, coords_sorted=True)
    return aux, idx_query, counts


def aux_to_voxel(aux: SparseTensor, x: SparseTensor, idx_query: jnp.ndarray,
                 counts: jnp.ndarray, r: int = 2) -> SparseTensor:
    """Sum features over the r^3 window of aux blocks around each aux cell,
    renormalize by the total voxel count in the window, and broadcast back
    to the voxels of `x` (utils.py:61-84).

    The reference implements the window sum as spdevoxelize over feats
    pre-multiplied by counts with an appended all-ones "count channel"
    (utils.py:75-80); we keep that exact formulation so numerics match.
    """
    offsets = coordlib.kernel_offsets_np((r, r, r), stride=1, dilation=1)
    # aux coords come from unique_coords -> pack-key sorted: the table sort
    # is skipped and the join uses the bracketed search. The feature rows
    # here are wide (3C+1 channels, f32) so the window-form gather would
    # fall off the descriptor-rate plateau (see sparse/conv.py) — the sum
    # stays in per-tap gather form.
    # When the level's base domain is statically bounded (grid_extent
    # from collate — seg levels) or the level carries a rank-grid (det
    # backbone levels, spconv_engine.ensure_level_table), the aux lattice
    # inherits the bound at ceil(extent / s): divided coords live on a
    # unit grid, so the r^3 window join collapses to one packed-cell
    # gather per (dy, dz) group.
    gs = None
    s = aux.stride[0]
    if x.grid_extent is not None:
        e = x.grid_extent
        gs = (-(-e[0] // s), -(-e[1] // s), -(-e[2] // s), e[3])
    else:
        ltab = x.kmaps.get(("table", x.stride))
        if ltab is not None and getattr(ltab, "grid", None) is not None:
            g = ltab.grid
            gs = (-(-(g.nx * g.quantum) // s), -(-(g.ny * g.quantum) // s),
                  -(-(g.nz * g.quantum) // s), g.nb)
    table = coordlib.build_table(aux.coords, assume_sorted=True,
                                 grid_shape=gs)
    nb_idx, _, _ = coordlib.grouped_window_query(
        table, aux.coords, offsets, 1, queries_sorted=True,
        self_query=True)
    nb_idx = nb_idx.T                                           # (M_aux, r^3)

    f = jnp.concatenate(
        [aux.feats, jnp.ones((aux.feats.shape[0], 1), aux.feats.dtype)], axis=1)
    f = f * counts.astype(aux.feats.dtype)[:, None]
    weights = jnp.ones(nb_idx.shape, aux.feats.dtype)
    # The window sum is a SELF-join over symmetric offsets, so its inverse
    # map is free: idx[i, k] == j iff idx[j, mirror(k)] == i. Passing it
    # makes the backward a gather-sum instead of AD's r^3*M-row scatter-add
    # (the round-3 det train profile's second-largest slice). Odd r only —
    # even windows have no mirror and fall back to AD.
    from ..sparse.conv import mirror_perm
    mir = mirror_perm(offsets)
    inv_nb = nb_idx[:, np.asarray(mir)] if mir is not None else None
    window = spops.spdevoxelize(f, nb_idx, weights,
                                inv_idx=inv_nb)                 # (M_aux, C+1)
    denom = window[:, -1:]
    new_feat = window[:, :-1] / jnp.where(denom == 0, 1, denom)

    # Broadcast aux features back to voxels (utils.py:82: F = new_feat[idx]).
    m_aux = new_feat.shape[0]
    safe = jnp.where(idx_query >= 0, idx_query, m_aux)
    new_feat_ext = jnp.concatenate(
        [new_feat, jnp.zeros((1, new_feat.shape[1]), new_feat.dtype)], axis=0)
    return x.replace(feats=new_feat_ext[safe])


def upsample_voxel(x: SparseTensor, ref_x: SparseTensor) -> SparseTensor:
    """Nearest-ancestor broadcast of coarse feats onto fine coords
    (utils.py:327-340): both coord sets divided by the coarse stride, exact
    join, gather."""
    s = x.stride[0]

    def _div(c):
        return jnp.concatenate(
            [jnp.where(c[:, :1] <= coordlib.INVALID_COORD, c[:, :3],
                       c[:, :3] // jnp.int32(s)),
             c[:, 3:]], axis=1)

    # coarse coords are multiples of s, so //s is strictly monotone per
    # component and pack-key order survives; the FINE side's division is
    # non-strict (floor of non-lattice values) and can invert lex order
    # across z/y boundaries, so the query side stays unbracketed.
    table = coordlib.build_table(_div(x.coords), assume_sorted=x.is_sorted)
    idx = table.query(_div(ref_x.coords))                       # (N_fine,)
    n = x.feats.shape[0]
    safe = jnp.where(idx >= 0, idx, n)
    feats_ext = jnp.concatenate(
        [x.feats, jnp.zeros((1, x.feats.shape[1]), x.feats.dtype)], axis=0)
    return SparseTensor(feats=feats_ext[safe], coords=ref_x.coords,
                        nnz=ref_x.nnz, stride=ref_x.stride,
                        cmaps=ref_x.cmaps, kmaps=ref_x.kmaps,
                        base_sorted=ref_x.base_sorted,
                        coords_sorted=ref_x.coords_sorted)
