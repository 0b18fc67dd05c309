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


@pytest.mark.parametrize("cap,block_m,window", [(512, 128, 256),
                                                (1024, 256, 512)])
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
    # base positions jumping by > window inside one tile must flag
    base = jnp.zeros((1, 256), jnp.int32).at[0, 200].set(5000)
    slot = jnp.zeros((1, 256), jnp.int8)
    assert bool(PK.window_overflow(base, slot, 8192, 256, 1024))
    base2 = jnp.arange(256, dtype=jnp.int32)[None, :]
    assert not bool(PK.window_overflow(base2, slot, 8192, 256, 1024))
