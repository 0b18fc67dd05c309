"""RankGrid join exactness (round 4).

The dense rank-grid index (coords.RankGrid) resolves a whole (dy, dz)
tap group with ONE word-row gather: occupancy is packed 32 x-cells per
uint32 word and each word row stores [base_rank, word, next_word],
where base_rank is the exclusive cumsum of popcount(word) in pack-key
order (= the sorted-table position of the word's first set bit); an
anchor at bit p forms the window (word >> p) | (next << (32-p)) and
ranks each tap by popcount. Exactness rides on the quantum-run
invariant (a
group's hits occupy consecutive table rows starting at the lower bound),
so the pins below compare the rank path bit-for-bit against the
DirectIndex/search paths on the cases where the invariant is stressed:
strided anchors below the grid (x0 = -pad, margin region), grid-edge
probes, capacity overflow, padding rows, single-tap z-kernels.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from link_tpu.sparse import coords as C
from link_tpu.sparse.spconv_engine import (build_spconv_plan,
                                           spconv_downsample,
                                           spconv_out_shape)


def _rand_level(rng, n, shape, nb=2, cap=None):
    """Unique sorted coords on a (nx, ny, nz, nb) grid, padded to cap."""
    nx, ny, nz = shape
    cap = cap or n
    pts = np.stack([rng.integers(0, nx, n * 2), rng.integers(0, ny, n * 2),
                    rng.integers(0, nz, n * 2),
                    rng.integers(0, nb, n * 2)], axis=1).astype(np.int32)
    pts = np.unique(pts, axis=0)[:min(n, cap)]
    order = np.lexsort((pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3]))
    pts = pts[order]
    out = np.full((cap, 4), C.INVALID_COORD, np.int32)
    out[:len(pts)] = pts
    return out, len(pts)


def _tables(coords, shape, nb):
    cj = jnp.asarray(coords)
    with_grid = C.build_table(cj, assume_sorted=True,
                              grid_shape=(shape[0], shape[1], shape[2], nb))
    without = C.build_table(cj, assume_sorted=True)
    assert with_grid.grid is not None
    assert without.grid is None
    return cj, with_grid, without


def _compare(table_g, table_d, base_coords, offs, self_query):
    got = C.grouped_window_query(table_g, base_coords, offs, 1,
                                 queries_sorted=True, identity_perm=True,
                                 self_query=self_query)
    want = C.grouped_window_query(table_d, base_coords, offs, 1,
                                  queries_sorted=True, identity_perm=True,
                                  self_query=self_query)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))
    # base_pos: only consumed at rows with slot >= 0 (window apply); the
    # two paths may pin padding rows to different valid bases
    sl = np.asarray(want[2])
    base_g, base_d = np.asarray(got[1]), np.asarray(want[1])
    glist = C.offset_groups(np.asarray(offs))
    for gi, (_, taps) in enumerate(glist):
        used = (sl[[t for _, t in taps]] >= 0).any(axis=0)
        np.testing.assert_array_equal(base_g[gi][used], base_d[gi][used])


def test_submanifold_matches_direct():
    rng = np.random.default_rng(0)
    shape = (40, 24, 12)
    coords, n = _rand_level(rng, 4000, shape, nb=2, cap=4608)
    cj, tg, td = _tables(coords, shape, 2)
    offs = C.kernel_offsets_np(3, stride=1)
    _compare(tg, td, cj, offs, self_query=True)


def test_z_kernel_single_tap_groups():
    rng = np.random.default_rng(1)
    shape = (31, 17, 9)
    coords, n = _rand_level(rng, 1500, shape, nb=1, cap=2048)
    cj, tg, td = _tables(coords, shape, 1)
    # (1, 1, 3) z-compress kernel: every (dy, dz) group is one x tap
    offs = np.asarray([[0, 0, dz] for dz in (-1, 0, 1)], np.int32)
    _compare(tg, td, cj, offs, self_query=False)


def test_strided_negative_anchor_margin():
    """Strided spconv join: eff offsets tap - pad give group anchors at
    x0 = 2*ox - 1, negative at the x=0 edge — the rank grid's margin
    region. Compare full plans built with and without the grid."""
    rng = np.random.default_rng(2)
    shape = (32, 20, 10)
    coords, n = _rand_level(rng, 2500, shape, nb=2, cap=3072)
    out_shape = spconv_out_shape(shape, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    oc, onnz = spconv_downsample(jnp.asarray(coords), (3, 3, 3), (2, 2, 2),
                                 (1, 1, 1), out_shape, 2048, batch_size=2,
                                 in_shape=shape)
    cj, tg, td = _tables(coords, shape, 2)
    pg = build_spconv_plan(cj, oc, onnz, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                           in_capacity=cj.shape[0], in_sorted=True,
                           out_sorted=True, table=tg)
    pd = build_spconv_plan(cj, oc, onnz, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                           in_capacity=cj.shape[0], in_sorted=True,
                           out_sorted=True, table=td)
    np.testing.assert_array_equal(np.asarray(pg.in_idx),
                                  np.asarray(pd.in_idx))
    np.testing.assert_array_equal(np.asarray(pg.slot), np.asarray(pd.slot))


def test_dense_line_and_edges():
    """A fully dense x-line exercises every mask bit; probes at both x
    edges exercise the shifted-occupancy bounds."""
    nx = 37
    coords = np.full((64, 4), C.INVALID_COORD, np.int32)
    coords[:nx, 0] = np.arange(nx)
    coords[:nx, 1:] = 0
    coords[:nx, 3] = 0
    shape = (nx, 3, 3)
    cj, tg, td = _tables(coords, shape, 1)
    offs = C.kernel_offsets_np(3, stride=1)
    _compare(tg, td, cj, offs, self_query=True)


def test_budget_gate_skips_grid():
    coords = np.zeros((8, 4), np.int32)
    coords[:, 0] = np.arange(8)
    t = C.build_table(jnp.asarray(coords), assume_sorted=True,
                      grid_shape=(10**4, 10**4, 10**3, 4))
    assert t.grid is None and t.direct is not None


def test_unsorted_table_perm():
    """Non-identity perm: rank positions route through the rows' perm
    column, matching the search path on unsorted input coords."""
    rng = np.random.default_rng(3)
    shape = (20, 14, 8)
    coords, n = _rand_level(rng, 900, shape, nb=1, cap=1024)
    shuf = coords.copy()
    shuf[:n] = shuf[rng.permutation(n)]
    cj = jnp.asarray(shuf)
    tg = C.build_table(cj, assume_sorted=False,
                       grid_shape=(shape[0], shape[1], shape[2], 1))
    td = C.build_table(cj, assume_sorted=False)
    assert tg.grid is not None
    offs = C.kernel_offsets_np(3, stride=1)
    got = C.grouped_window_query(tg, cj, offs, 1, identity_perm=False)[0]
    want = C.grouped_window_query(td, cj, offs, 1, identity_perm=False)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantum_lattice_matches_direct():
    """Stride-s seg levels: coords are multiples of s, group x-runs step
    by s. A grid built with grid_quantum=s must match the DirectIndex
    join bit-for-bit (round 5: RankGrid extended beyond unit lattices)."""
    rng = np.random.default_rng(7)
    for q in (2, 8):
        shape = (30 * q, 22 * q, 9 * q)       # raw extents
        nx, ny, nz = 30, 22, 9
        pts = np.stack([rng.integers(0, nx, 3000), rng.integers(0, ny, 3000),
                        rng.integers(0, nz, 3000),
                        rng.integers(0, 2, 3000)], axis=1).astype(np.int32)
        pts = np.unique(pts, axis=0)
        pts[:, :3] *= q                       # lattice multiples
        order = np.lexsort((pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3]))
        pts = pts[order]
        cap = len(pts) + 37
        coords = np.full((cap, 4), C.INVALID_COORD, np.int32)
        coords[:len(pts)] = pts
        cj = jnp.asarray(coords)
        tg = C.build_table(cj, assume_sorted=True, grid_shape=shape + (2,),
                           grid_quantum=q)
        td = C.build_table(cj, assume_sorted=True)
        assert tg.grid is not None and tg.grid.quantum == q
        offs = C.kernel_offsets_np(3, stride=q)   # submanifold at stride q
        got = C.grouped_window_query(tg, cj, offs, q, queries_sorted=True,
                                     identity_perm=True, self_query=True)
        want = C.grouped_window_query(td, cj, offs, q, queries_sorted=True,
                                      identity_perm=True, self_query=True)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))
        # down-conv join (ks2 stride2 at level stride q): bases are out
        # coords at stride 2q (multiples of 2q), offsets {0, q}
        offs2 = C.kernel_offsets_np(2, stride=q)
        down = pts.copy()
        down[:, :3] = (down[:, :3] // (2 * q)) * (2 * q)
        down = np.unique(down, axis=0)
        order = np.lexsort((down[:, 0], down[:, 1], down[:, 2], down[:, 3]))
        dq = jnp.asarray(down[order])
        g2 = C.grouped_window_query(tg, dq, offs2, q, queries_sorted=True,
                                    identity_perm=True)
        w2 = C.grouped_window_query(td, dq, offs2, q, queries_sorted=True,
                                    identity_perm=True)
        np.testing.assert_array_equal(np.asarray(g2[0]), np.asarray(w2[0]))
        np.testing.assert_array_equal(np.asarray(g2[2]), np.asarray(w2[2]))


def test_identity_table_skips_perm_gather_result():
    """identity_perm=False on an assume_sorted table must still return
    ORIGINAL row indices (table.identity fast path, round 5)."""
    rng = np.random.default_rng(9)
    shape = (24, 16, 8)
    coords, n = _rand_level(rng, 1200, shape, nb=1, cap=1536)
    cj = jnp.asarray(coords)
    tg = C.build_table(cj, assume_sorted=True,
                       grid_shape=(shape[0], shape[1], shape[2], 1))
    td = C.build_table(cj, assume_sorted=True)
    assert tg.grid is not None and tg.identity
    offs = C.kernel_offsets_np(3, stride=1)
    got = C.grouped_window_query(tg, cj, offs, 1, queries_sorted=True,
                                 self_query=True)[0]
    want = C.grouped_window_query(td, cj, offs, 1, queries_sorted=True,
                                  self_query=True)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rank_grid_check_catches_out_of_grid(monkeypatch):
    """RANK_GRID_CHECK=1 raises on a pack-valid coord outside the grid —
    the silent-desync hazard the build_table docstring documents."""
    monkeypatch.setenv("RANK_GRID_CHECK", "1")
    coords = np.full((8, 4), C.INVALID_COORD, np.int32)
    coords[:4, 0] = np.arange(4)
    coords[:4, 1:3] = 0
    coords[:4, 3] = 0
    coords[3, 1] = 5                     # y == 5 >= ny: out of grid
    import jax
    with pytest.raises(Exception, match="RankGrid precondition"):
        g = C.build_rank_grid(jnp.asarray(coords), (8, 5, 2, 1))
        jax.block_until_ready(g.rows)
    monkeypatch.setenv("RANK_GRID_CHECK", "0")
    g = C.build_rank_grid(jnp.asarray(coords), (8, 5, 2, 1))
    jax.block_until_ready(g.rows)        # silent (documented) without check
