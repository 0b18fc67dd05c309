"""Hybrid dense-grid det backbone (sparse/dense_grid.py) vs the sparse
path: identical BEV outputs and train-mode BN stats for the same params.

The dense path executes the SAME parameter tree with masked dense convs
(exact submanifold/spconv semantics — empty cells are zeros, strided
output sites are the window-OR of input occupancy), so on inputs where
the sparse capacities don't overflow the two must agree to conv
reassociation tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from link_tpu.models.scn import SpMiddleResNetFHDELKv3
from link_tpu.sparse import coords as coordlib
from link_tpu.sparse.dense_grid import (DenseGrid, dense_spconv,
                                        to_dense_grid)
from link_tpu.sparse import spconv_engine as eng
from link_tpu.sparse.tensor import SparseTensor, make_sparse_tensor

GRID = (48, 48, 40)          # (W, H, D); backbone pads z+1 -> 41
BATCH = 2
CAPS = (2048, 2048, 2048, 2048)


def _inputs(rng, n=500):
    pts = np.unique(
        np.stack([rng.integers(0, GRID[0], 4 * n),
                  rng.integers(0, GRID[1], 4 * n),
                  rng.integers(0, GRID[2], 4 * n),
                  rng.integers(0, BATCH, 4 * n)], axis=1).astype(np.int32),
        axis=0)[:n]
    hi, lo = coordlib.pack_coords(jnp.asarray(pts))
    order = np.lexsort((np.asarray(lo), np.asarray(hi)))
    coords = pts[order]
    feats = rng.standard_normal((coords.shape[0], 5)).astype(np.float32)
    cap = CAPS[0]
    pad = cap - coords.shape[0]
    coords = np.concatenate(
        [coords, np.full((pad, 4), coordlib.INVALID_COORD, np.int32)])
    feats = np.concatenate([feats, np.zeros((pad, 5), np.float32)])
    return (jnp.asarray(feats), jnp.asarray(coords),
            jnp.int32(min(n, pts.shape[0])))


def _run(dense_from_level, variables=None, train=False):
    rng = np.random.default_rng(0)
    feats, coords, nnz = _inputs(rng)
    model = SpMiddleResNetFHDELKv3(
        num_input_features=5, elk=True, capacities=CAPS, batch_size=BATCH,
        dense_from_level=dense_from_level)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), feats, coords, nnz,
                               GRID, False)
    if train:
        (bev, _), updates = model.apply(variables, feats, coords, nnz,
                                        GRID, True, mutable=["batch_stats"])
        return bev, variables, updates
    bev, _ = model.apply(variables, feats, coords, nnz, GRID, False)
    return bev, variables, None


@pytest.mark.slow
@pytest.mark.parametrize("lvl", [1, 2])
def test_hybrid_dense_bev_matches_sparse(lvl):
    ref, variables, _ = _run(None)
    got, _, _ = _run(lvl, variables)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_hybrid_dense_train_stats_match(lvl=2):
    ref, variables, upd_ref = _run(None, train=True)
    got, _, upd = _run(lvl, variables, train=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    ref_leaves = jax.tree_util.tree_leaves_with_path(upd_ref["batch_stats"])
    got_stats = upd["batch_stats"]
    for path, leaf in ref_leaves:
        other = got_stats
        for p in path:
            other = other[p.key]
        np.testing.assert_allclose(np.asarray(other), np.asarray(leaf),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=str(path))


def test_dense_spconv_matches_sparse_unit():
    """Standalone strided spconv: dense vs sparse on one random level."""
    rng = np.random.default_rng(1)
    n, cap, ci, co = 200, 512, 6, 8
    shape = (20, 20, 12)
    pts = np.unique(
        np.stack([rng.integers(0, shape[0], 2 * n),
                  rng.integers(0, shape[1], 2 * n),
                  rng.integers(0, shape[2], 2 * n),
                  rng.integers(0, BATCH, 2 * n)], axis=1).astype(np.int32),
        axis=0)[:n]
    hi, lo = coordlib.pack_coords(jnp.asarray(pts))
    order = np.lexsort((np.asarray(lo), np.asarray(hi)))
    pts = pts[order]
    feats = np.zeros((cap, ci), np.float32)
    feats[:pts.shape[0]] = rng.standard_normal((pts.shape[0], ci))
    coords = np.full((cap, 4), coordlib.INVALID_COORD, np.int32)
    coords[:pts.shape[0]] = pts
    st = SparseTensor(feats=jnp.asarray(feats), coords=jnp.asarray(coords),
                      nnz=jnp.int32(pts.shape[0]), base_sorted=True,
                      coords_sorted=True)
    w = jnp.asarray(rng.standard_normal((27, ci, co)) * 0.1, jnp.float32)
    sp_out, out_shape = eng.spconv3d(st, w, 3, in_shape=shape, stride=2,
                                     padding=1, out_capacity=cap,
                                     batch_size=BATCH)
    g = to_dense_grid(st, shape, BATCH)
    dg = dense_spconv(g, w, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    ref = to_dense_grid(sp_out, out_shape, BATCH)
    np.testing.assert_array_equal(np.asarray(dg.mask), np.asarray(ref.mask))
    np.testing.assert_allclose(np.asarray(dg.feats), np.asarray(ref.feats),
                               rtol=1e-5, atol=1e-5)
