"""One-hot window conv (Pallas) vs the XLA apply — interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from link_tpu.sparse import coords as coordlib
from link_tpu.sparse import conv as C
from link_tpu.sparse.tensor import ConvPlan
from link_tpu.ops import pallas_kernels as PK
from tests import oracles
from tests.test_sparse_core import pad_coords
from tests.test_sorted_fastpath import sort_cloud


def _window_plan(coords_pad, n, offsets):
    table = coordlib.build_table(coords_pad, assume_sorted=True)
    in_idx, base_pos, slot = coordlib.grouped_window_query(
        table, coords_pad, offsets, 1, queries_sorted=True,
        identity_perm=True)
    groups = tuple(tuple(t for _, t in taps)
                   for _, taps in coordlib.offset_groups(offsets))
    return in_idx, base_pos, slot, groups


@pytest.mark.parametrize("cap,block_m,window", [
    (512, 128, 256),
    pytest.param(1024, 256, 512, marks=pytest.mark.slow)])
def test_onehot_conv_matches_xla(cap, block_m, window):
    rng = np.random.default_rng(33)
    coords, feats = oracles.random_cloud(rng, cap - 40, batch=2, channels=8)
    coords, feats = sort_cloud(coords, feats)
    cp = jnp.asarray(pad_coords(coords, cap))
    f = jnp.asarray(np.concatenate(
        [feats, np.zeros((cap - len(coords), 8), np.float32)]))
    w = jnp.asarray(rng.standard_normal((27, 8, 16)).astype(np.float32) * .2)
    offsets = coordlib.kernel_offsets_np(3, stride=1)

    in_idx, base_pos, slot, groups = _window_plan(cp, cap, offsets)
    plan = ConvPlan(in_idx=in_idx, out_coords=cp, out_nnz=jnp.int32(len(coords)),
                    in_capacity=cap, out_capacity=cap)
    want = C.apply_conv_plan(f, w, plan)

    over = PK.window_overflow(base_pos, slot, cap, block_m, window)
    assert not bool(over), "fixture should fit its windows"
    got = PK.onehot_window_conv(f, base_pos, slot, groups, w,
                                block_m=block_m, window=window,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_window_overflow_detects():
    slot = jnp.zeros((1, 256), jnp.int8)
    # TWO clusters (0 and 5000) are covered by the two per-tile windows
    base2c = jnp.zeros((1, 256), jnp.int32).at[0, 200].set(5000)
    assert not bool(PK.window_overflow(base2c, slot, 8192, 256, 1024))
    # THREE clusters farther apart than the window cannot be covered
    base3c = (jnp.zeros((1, 256), jnp.int32)
              .at[0, 100].set(3000).at[0, 200].set(6000))
    assert bool(PK.window_overflow(base3c, slot, 8192, 256, 1024))
    base_lin = jnp.arange(256, dtype=jnp.int32)[None, :]
    assert not bool(PK.window_overflow(base_lin, slot, 8192, 256, 1024))


def test_onehot_conv_two_window_coverage():
    """Rows split across two distant clusters: the hi window must pick up
    what the lo window misses (exclusive selection)."""
    rng = np.random.default_rng(7)
    cap, c, co, block_m, window = 2048, 8, 8, 128, 256
    f = jnp.asarray(rng.standard_normal((cap, c)).astype(np.float32))
    # one group, one tap; base rows alternate between a low and a high
    # cluster inside each tile
    base = np.zeros((1, block_m), np.int32)
    base[0, ::2] = rng.integers(0, 200, size=block_m // 2)
    # spread + 128-alignment loss must stay under the 256 window
    base[0, 1::2] = rng.integers(1500, 1600, size=block_m // 2)
    base = jnp.asarray(base)
    slot = jnp.zeros((1, block_m), jnp.int8)
    w = jnp.asarray(rng.standard_normal((1, c, co)).astype(np.float32))
    assert not bool(PK.window_overflow(base, slot, cap, block_m, window))
    got = PK.onehot_window_conv(f, base, slot, ((0,),), w,
                                block_m=block_m, window=window,
                                interpret=True)
    want = jnp.take(f, base[0], axis=0) @ w[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
