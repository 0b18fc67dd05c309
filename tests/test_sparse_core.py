"""Property tests for the sparse substrate vs NumPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from link_tpu.sparse import coords as coordlib
from link_tpu.sparse import ops as spops
from link_tpu.sparse import conv as spconv
from link_tpu.sparse.tensor import make_sparse_tensor

import oracles


def pad_coords(coords, cap):
    out = np.full((cap, 4), coordlib.INVALID_COORD, np.int32)
    out[:len(coords)] = coords
    return out


def pad_feats(feats, cap, fill=7.5):
    # Padding rows deliberately carry garbage: ops must never read them.
    out = np.full((cap, feats.shape[1]), fill, np.float32)
    out[:len(feats)] = feats
    return out


def to_dict(coords, feats):
    return {tuple(c): f for c, f in zip(coords, feats)}


def assert_rows_match(coords_a, feats_a, coords_b, feats_b, atol=1e-4):
    """Join two (coords, feats) sets by coordinate and compare values."""
    da, db = to_dict(coords_a, feats_a), to_dict(coords_b, feats_b)
    assert set(da) == set(db), (
        f"coord sets differ: only_a={list(set(da)-set(db))[:5]} "
        f"only_b={list(set(db)-set(da))[:5]}")
    for k in da:
        np.testing.assert_allclose(da[k], db[k], atol=atol, rtol=1e-4,
                                   err_msg=f"mismatch at {k}")


class TestKeys:
    def test_pack_orders_lexicographically(self):
        rng = np.random.default_rng(0)
        coords = np.stack([rng.integers(-100, 4000, 500),
                           rng.integers(-100, 4000, 500),
                           rng.integers(-100, 2000, 500),
                           rng.integers(0, 8, 500)], 1).astype(np.int32)
        hi, lo = coordlib.pack_coords(jnp.asarray(coords))
        hi, lo = np.asarray(hi), np.asarray(lo)
        order = np.lexsort((lo, hi))
        bzyx = coords[:, [3, 2, 1, 0]]
        expect = np.lexsort((bzyx[:, 3], bzyx[:, 2], bzyx[:, 1], bzyx[:, 0]))
        # Compare sorted coord sequences (ties permute freely).
        np.testing.assert_array_equal(bzyx[order], bzyx[expect])

    def test_sentinel_and_out_of_range_invalid(self):
        coords = np.array([[0, 0, 0, 0],
                           [coordlib.INVALID_COORD] * 4,
                           [1 << 15, 0, 0, 0],
                           [0, 0, -600, 0]], np.int32)
        hi, _ = coordlib.pack_coords(jnp.asarray(coords))
        assert np.asarray(coordlib.key_is_valid(hi)).tolist() == [
            True, False, False, False]

    def test_table_query(self):
        rng = np.random.default_rng(1)
        coords, _ = oracles.random_cloud(rng, 300, batch=3)
        table = coordlib.build_table(jnp.asarray(pad_coords(coords, 400)))
        queries = np.concatenate([coords[::3],
                                  coords[::5] + np.array([1, 0, 0, 0])])
        got = np.asarray(table.query(jnp.asarray(queries)))
        want = oracles.query(coords, queries)
        # Both must agree on hit/miss; hits must point at identical coords.
        np.testing.assert_array_equal(got >= 0, want >= 0)
        hits = got >= 0
        np.testing.assert_array_equal(pad_coords(coords, 400)[got[hits]],
                                      coords[want[hits]])

    def test_unique_coords(self):
        rng = np.random.default_rng(2)
        base, _ = oracles.random_cloud(rng, 200, batch=2)
        dup = np.concatenate([base, base[::2], base[::7]])
        rng.shuffle(dup)
        cap = 300
        out_c, inverse, nnz = coordlib.unique_coords(
            jnp.asarray(pad_coords(dup, 600)), cap)
        out_c, inverse, nnz = map(np.asarray, (out_c, inverse, nnz))
        uniq, _ = oracles.unique_rows(dup)
        assert nnz == len(uniq)
        assert set(map(tuple, out_c[:nnz])) == set(map(tuple, uniq))
        # inverse consistency: every input row maps to its own coords.
        for i in range(len(dup)):
            assert inverse[i] >= 0
            np.testing.assert_array_equal(out_c[inverse[i]], dup[i])
        # padding rows map to -1
        assert (inverse[len(dup):] == -1).all()

    def test_unique_overflow_clamps(self):
        coords = np.stack([np.arange(50), np.zeros(50), np.zeros(50),
                           np.zeros(50)], 1).astype(np.int32)
        out_c, inverse, nnz = coordlib.unique_coords(jnp.asarray(coords), 20)
        assert int(nnz) == 20
        assert int(np.sum(np.asarray(inverse) >= 0)) == 20


class TestSegmentOps:
    def test_voxelize_count(self):
        rng = np.random.default_rng(3)
        coords, feats = oracles.random_cloud(rng, 400, batch=2)
        div = coords.copy()
        div[:, :3] //= 3
        cap_in, cap_out = 500, 300
        out_c, inverse, nnz = coordlib.unique_coords(
            jnp.asarray(pad_coords(div, cap_in)), cap_out)
        counts = spops.spcount(inverse, cap_out)
        pooled = spops.spvoxelize(jnp.asarray(pad_feats(feats, cap_in)),
                                  inverse, counts)
        uniq, oin = oracles.unique_rows(div)
        want, want_cnt = oracles.spvoxelize(feats, oin, len(uniq))
        assert_rows_match(np.asarray(out_c)[:int(nnz)],
                          np.asarray(pooled)[:int(nnz)], uniq, want)
        got_cnt = {tuple(c): n for c, n in zip(np.asarray(out_c)[:int(nnz)],
                                               np.asarray(counts))}
        for c, n in zip(uniq, want_cnt):
            assert got_cnt[tuple(c)] == n

    def test_devoxelize(self):
        rng = np.random.default_rng(4)
        feats = rng.standard_normal((30, 5)).astype(np.float32)
        idx = rng.integers(-1, 30, (17, 8)).astype(np.int32)
        w = rng.random((17, 8)).astype(np.float32)
        got = np.asarray(spops.spdevoxelize(jnp.asarray(feats),
                                            jnp.asarray(idx), jnp.asarray(w)))
        want = np.zeros((17, 5))
        for i in range(17):
            for k in range(8):
                if idx[i, k] >= 0:
                    want[i] += w[i, k] * feats[idx[i, k]]
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestConv:
    @pytest.mark.parametrize("ks,tensor_stride", [(3, 1), (3, 2), (2, 1)])
    def test_submanifold_matches_oracle(self, ks, tensor_stride):
        rng = np.random.default_rng(5)
        coords, feats = oracles.random_cloud(rng, 250, batch=2, channels=6)
        coords[:, :3] *= tensor_stride
        k = ks ** 3
        w = rng.standard_normal((k, 6, 7)).astype(np.float32) * 0.2
        cap = 300
        st = make_sparse_tensor(pad_feats(feats, cap), pad_coords(coords, cap),
                                nnz=len(coords), stride=tensor_stride)
        out = spconv.conv3d(st, jnp.asarray(w), kernel_size=ks)
        _, want = oracles.sparse_conv(coords, feats, w, ks,
                                      tensor_stride=tensor_stride)
        n = len(coords)
        assert_rows_match(np.asarray(out.coords)[:n], np.asarray(out.feats)[:n],
                          coords, want)

    def test_strided_downsample_conv(self):
        rng = np.random.default_rng(6)
        coords, feats = oracles.random_cloud(rng, 300, batch=2, channels=6)
        w = rng.standard_normal((8, 6, 6)).astype(np.float32) * 0.2
        cap = 350
        st = make_sparse_tensor(pad_feats(feats, cap), pad_coords(coords, cap),
                                nnz=len(coords), stride=1)
        out = spconv.conv3d(st, jnp.asarray(w), kernel_size=2, stride=2,
                            out_capacity=cap)
        assert out.stride == (2, 2, 2)
        want_c, want = oracles.sparse_conv(coords, feats, w, 2, 1, 2)
        n = int(out.nnz)
        assert n == len(want_c)
        assert_rows_match(np.asarray(out.coords)[:n], np.asarray(out.feats)[:n],
                          want_c, want)

    def test_transposed_roundtrip(self):
        rng = np.random.default_rng(7)
        coords, feats = oracles.random_cloud(rng, 300, batch=2, channels=6)
        w_down = rng.standard_normal((8, 6, 5)).astype(np.float32) * 0.2
        w_up = rng.standard_normal((8, 5, 4)).astype(np.float32) * 0.2
        cap = 350
        st = make_sparse_tensor(pad_feats(feats, cap), pad_coords(coords, cap),
                                nnz=len(coords), stride=1)
        mid = spconv.conv3d(st, jnp.asarray(w_down), kernel_size=2, stride=2,
                            out_capacity=cap)
        up = spconv.conv3d(mid, jnp.asarray(w_up), kernel_size=2, stride=2,
                           transposed=True)
        assert up.stride == (1, 1, 1)
        # Oracle
        down_c, down_f = oracles.sparse_conv(coords, feats, w_down, 2, 1, 2)
        want = oracles.sparse_conv_transposed(down_c, down_f, coords, w_up,
                                              2, 1, 2)
        n = len(coords)
        assert_rows_match(np.asarray(up.coords)[:n], np.asarray(up.feats)[:n],
                          coords, want)

    def test_1x1_conv(self):
        rng = np.random.default_rng(8)
        coords, feats = oracles.random_cloud(rng, 100, channels=6)
        w = rng.standard_normal((6, 3)).astype(np.float32)
        st = make_sparse_tensor(pad_feats(feats, 128), pad_coords(coords, 128),
                                nnz=len(coords))
        out = spconv.conv3d(st, jnp.asarray(w), kernel_size=1)
        np.testing.assert_allclose(np.asarray(out.feats)[:len(coords)],
                                   feats @ w, atol=1e-5)

    def test_conv_jits_and_caches(self):
        rng = np.random.default_rng(9)
        coords, feats = oracles.random_cloud(rng, 200, channels=6)
        w = rng.standard_normal((27, 6, 6)).astype(np.float32) * 0.2
        cap = 256

        @jax.jit
        def run(feats_in, coords_in, nnz):
            st = make_sparse_tensor(feats_in, coords_in, nnz=nnz)
            a = spconv.conv3d(st, jnp.asarray(w), kernel_size=3)
            b = spconv.conv3d(a, jnp.asarray(w), kernel_size=3)  # reuses plan
            return b.feats

        out = run(jnp.asarray(pad_feats(feats, cap)),
                  jnp.asarray(pad_coords(coords, cap)),
                  jnp.asarray(len(coords), jnp.int32))
        assert out.shape == (cap, 6)
        assert np.isfinite(np.asarray(out)[:len(coords)]).all()
