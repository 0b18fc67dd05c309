"""Sorted-coords fast path: bracketed lower bound, window-form plans, and
windowed conv apply must match the oracle / unsorted reference paths
exactly. These guard the invariant chain host-sort -> base_sorted ->
grouped_window_query(identity_perm) -> _apply_windowed."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from link_tpu.sparse import coords as coordlib
from link_tpu.sparse import conv as spconv
from link_tpu.sparse.tensor import make_sparse_tensor
from tests import oracles
from tests.test_sparse_core import pad_coords, pad_feats, assert_rows_match


def sort_cloud(coords, *arrays):
    perm = np.lexsort((coords[:, 0], coords[:, 1], coords[:, 2],
                       coords[:, 3]))
    return (coords[perm],) + tuple(a[perm] for a in arrays)


class TestBracketedSearch:
    @pytest.mark.parametrize("n,q", [(500, 700), (37, 41), (4096, 1000)])
    def test_matches_full_search(self, n, q):
        rng = np.random.default_rng(7)
        keys = np.sort(rng.choice(10 ** 6, n, replace=False)).astype(np.int32)
        rows = np.zeros((n, 8), np.int32)
        rows[:, 0] = keys // 1000
        rows[:, 1] = keys % 1000
        rows[:, 2] = np.arange(n)
        queries = np.sort(rng.integers(0, 10 ** 6, q)).astype(np.int32)
        q_hi = jnp.asarray(queries // 1000)
        q_lo = jnp.asarray(queries % 1000)
        rows = jnp.asarray(rows)
        full = coordlib.lower_bound_rows(rows, q_hi, q_lo)
        brk = coordlib.lower_bound_rows_bracketed(rows, q_hi, q_lo, sample=16)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(brk))

    def test_leading_dims(self):
        rng = np.random.default_rng(8)
        n = 300
        keys = np.sort(rng.choice(10 ** 5, n, replace=False)).astype(np.int32)
        rows = np.zeros((n, 8), np.int32)
        rows[:, 0] = keys
        rows = jnp.asarray(rows)
        qs = np.sort(rng.integers(0, 10 ** 5, (3, 200)).astype(np.int32),
                     axis=-1)
        q_hi = jnp.asarray(qs)
        q_lo = jnp.zeros_like(q_hi)
        full = coordlib.lower_bound_rows(rows, q_hi.reshape(-1),
                                         q_lo.reshape(-1)).reshape(3, 200)
        brk = coordlib.lower_bound_rows_bracketed(rows, q_hi, q_lo, sample=32)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(brk))

    def test_cliffs_and_capacity_overflow(self):
        """Density cliffs force the hard-lane pass; a tiny hard capacity
        (hard_div huge) forces the while backstop. Results must stay
        exact either way."""
        rng = np.random.default_rng(9)
        n = 2048
        # table clustered in tight islands separated by huge key gaps
        islands = np.sort(rng.choice(50, 8, replace=False)) * 10 ** 7
        keys = np.sort(np.concatenate(
            [base + np.sort(rng.choice(3000, n // 8, replace=False))
             for base in islands])).astype(np.int64)
        rows = np.zeros((n, 8), np.int32)
        rows[:, 0] = keys // 1000
        rows[:, 1] = keys % 1000
        rows = jnp.asarray(rows)
        # queries jump across every island boundary (cliff brackets)
        qk = np.sort(rng.integers(0, islands[-1] + 10 ** 7, 997))
        q_hi = jnp.asarray(qk // 1000, jnp.int32)
        q_lo = jnp.asarray(qk % 1000, jnp.int32)
        full = coordlib.lower_bound_rows(rows, q_hi, q_lo)
        for hard_div in (8, 10 ** 9):   # normal | force backstop
            brk = coordlib.lower_bound_rows_bracketed(
                rows, q_hi, q_lo, sample=16, hard_div=hard_div)
            np.testing.assert_array_equal(np.asarray(full), np.asarray(brk))


class TestSortedWindowedConv:
    @pytest.mark.parametrize("ks,tensor_stride", [(3, 1), (3, 2), (2, 1)])
    def test_submanifold_sorted_matches_oracle(self, ks, tensor_stride):
        rng = np.random.default_rng(15)
        coords, feats = oracles.random_cloud(rng, 250, batch=2, channels=6)
        coords[:, :3] *= tensor_stride
        coords, feats = sort_cloud(coords, feats)
        k = ks ** 3
        w = rng.standard_normal((k, 6, 7)).astype(np.float32) * 0.2
        cap = 300
        st = make_sparse_tensor(pad_feats(feats, cap), pad_coords(coords, cap),
                                nnz=len(coords), stride=tensor_stride,
                                base_sorted=True)
        out = spconv.conv3d(st, jnp.asarray(w), kernel_size=ks)
        # the plan must be in window form on this path
        plan = next(v for k, v in st.kmaps.items() if k[0] != "table")
        assert plan.base_pos is not None and plan.groups is not None
        _, want = oracles.sparse_conv(coords, feats, w, ks,
                                      tensor_stride=tensor_stride)
        n = len(coords)
        assert_rows_match(np.asarray(out.coords)[:n],
                          np.asarray(out.feats)[:n], coords, want)

    def test_strided_then_transposed_sorted(self):
        """Down conv + transposed up conv on the sorted path vs the
        unsorted fallback — identical numerics."""
        rng = np.random.default_rng(16)
        coords, feats = oracles.random_cloud(rng, 300, batch=2, channels=6)
        w_dn = rng.standard_normal((8, 6, 6)).astype(np.float32) * 0.2
        w_up = rng.standard_normal((8, 6, 5)).astype(np.float32) * 0.2
        cap = 350

        def run(base_sorted, c, f):
            st = make_sparse_tensor(pad_feats(f, cap), pad_coords(c, cap),
                                    nnz=len(c), stride=1,
                                    base_sorted=base_sorted)
            dn = spconv.conv3d(st, jnp.asarray(w_dn), kernel_size=2,
                               stride=2, out_capacity=cap)
            up = spconv.conv3d(dn, jnp.asarray(w_up), kernel_size=2,
                               stride=2, transposed=True)
            return dn, up

        cs, fs = sort_cloud(coords, feats)
        dn_s, up_s = run(True, cs, fs)
        dn_u, up_u = run(False, cs, fs)

        n_dn = int(dn_s.nnz)
        assert_rows_match(np.asarray(dn_s.coords)[:n_dn],
                          np.asarray(dn_s.feats)[:n_dn],
                          np.asarray(dn_u.coords)[:n_dn],
                          np.asarray(dn_u.feats)[:n_dn])
        n = len(coords)
        assert_rows_match(np.asarray(up_s.coords)[:n],
                          np.asarray(up_s.feats)[:n],
                          np.asarray(up_u.coords)[:n],
                          np.asarray(up_u.feats)[:n])

    def test_windowed_grad_matches_fallback(self):
        """AD through the windowed gather (scatter into the shifted-concat
        table) must equal AD through the per-tap gather."""
        rng = np.random.default_rng(17)
        coords, feats = oracles.random_cloud(rng, 200, batch=1, channels=4)
        coords, feats = sort_cloud(coords, feats)
        w = rng.standard_normal((27, 4, 4)).astype(np.float32) * 0.2
        cap = 256

        def loss(f, base_sorted):
            st = make_sparse_tensor(f, pad_coords(coords, cap),
                                    nnz=len(coords), stride=1,
                                    base_sorted=base_sorted)
            out = spconv.conv3d(st, jnp.asarray(w), kernel_size=3)
            return jnp.sum(out.feats[:len(coords)] ** 2)

        f = jnp.asarray(pad_feats(feats, cap))
        g_s = jax.grad(lambda f: loss(f, True))(f)
        g_u = jax.grad(lambda f: loss(f, False))(f)
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_u),
                                   atol=1e-4, rtol=1e-4)


class TestSelfQueryShortcut:
    @pytest.mark.parametrize("ks", [2, 3])
    def test_matches_searched_join(self, ks):
        rng = np.random.default_rng(17)
        cap = 512
        coords, feats = oracles.random_cloud(rng, cap - 50, batch=2,
                                             channels=4)
        coords, _ = sort_cloud(coords, feats)
        cp = jnp.asarray(pad_coords(coords, cap))
        table = coordlib.build_table(cp, assume_sorted=True)
        offsets = coordlib.kernel_offsets_np(ks, stride=1)
        a = coordlib.grouped_window_query(table, cp, offsets, 1,
                                          queries_sorted=True,
                                          identity_perm=True,
                                          self_query=False)
        b = coordlib.grouped_window_query(table, cp, offsets, 1,
                                          queries_sorted=True,
                                          identity_perm=True,
                                          self_query=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_bracketed_with_padding_queries():
    """INT32_MAX padding queries (sorted last) must not perturb valid
    lanes; their own results are unused but the valid ones are exact."""
    rng = np.random.default_rng(21)
    n = 1024
    keys = np.sort(rng.choice(10 ** 6, n, replace=False)).astype(np.int64)
    rows = np.zeros((n, 8), np.int32)
    rows[:, 0] = keys // 1000
    rows[:, 1] = keys % 1000
    rows = jnp.asarray(rows)
    qv = np.sort(rng.integers(0, 10 ** 6, 700))
    q_hi = np.concatenate([qv // 1000, np.full(300, 2 ** 31 - 1)])
    q_lo = np.concatenate([qv % 1000, np.full(300, 2 ** 31 - 1)])
    q_hi = jnp.asarray(q_hi, jnp.int32)
    q_lo = jnp.asarray(q_lo, jnp.int32)
    full = coordlib.lower_bound_rows(rows, q_hi, q_lo)
    brk = coordlib.lower_bound_rows_bracketed(rows, q_hi, q_lo, sample=32)
    np.testing.assert_array_equal(np.asarray(full)[:700],
                                  np.asarray(brk)[:700])
