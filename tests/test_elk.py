"""ELK op tests vs NumPy oracles + ELK block properties."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from link_tpu.sparse import coords as coordlib
from link_tpu.sparse.tensor import make_sparse_tensor
from link_tpu.ops import elk as elkops
from link_tpu.models.elk import ELKBlock

import oracles
from test_sparse_core import pad_coords, pad_feats, assert_rows_match


@pytest.mark.parametrize("s,r", [(3, 2), (2, 2), (7, 3)])
def test_voxel_to_aux_to_voxel(s, r):
    rng = np.random.default_rng(11)
    coords, feats = oracles.random_cloud(rng, 300, span=(30, 30, 12), batch=2,
                                         channels=5)
    cap, aux_cap = 350, 350
    st = make_sparse_tensor(pad_feats(feats, cap), pad_coords(coords, cap),
                            nnz=len(coords), stride=1)
    aux, idx, counts = elkops.voxel_to_aux(st, s, aux_cap)
    out = elkops.aux_to_voxel(aux, st, idx, counts, r)

    aux_c, aux_f, oidx, ocnt = oracles.voxel_to_aux(coords, feats, s)
    n_aux = int(aux.nnz)
    assert n_aux == len(aux_c)
    assert_rows_match(np.asarray(aux.coords)[:n_aux],
                      np.asarray(aux.feats)[:n_aux], aux_c, aux_f)

    want = oracles.aux_to_voxel(aux_c, aux_f, ocnt, oidx, r)
    n = len(coords)
    # rows align because out keeps x's coords
    got = np.asarray(out.feats)[:n]
    # need per-row compare joined on voxel coords
    assert_rows_match(coords, got, coords, want)


def test_upsample_voxel():
    rng = np.random.default_rng(12)
    coords, _ = oracles.random_cloud(rng, 200, batch=2, channels=4)
    # coarse = stride-4 downsample of fine
    coarse = coords.copy()
    coarse[:, :3] = coarse[:, :3] // 4 * 4
    coarse_c = np.unique(coarse, axis=0)
    coarse_f = rng.standard_normal((len(coarse_c), 6)).astype(np.float32)

    cap_f, cap_c = 256, 128
    fine_st = make_sparse_tensor(np.zeros((cap_f, 1), np.float32),
                                 pad_coords(coords, cap_f), nnz=len(coords),
                                 stride=1)
    coarse_st = make_sparse_tensor(pad_feats(coarse_f, cap_c),
                                   pad_coords(coarse_c, cap_c),
                                   nnz=len(coarse_c), stride=4)
    out = elkops.upsample_voxel(coarse_st, fine_st)
    lut = {tuple(c): f for c, f in zip(coarse_c, coarse_f)}
    got = np.asarray(out.feats)[:len(coords)]
    for c, g in zip(coords, got):
        key = (c[0] // 4, c[1] // 4, c[2] // 4, c[3])
        want = lut[tuple(np.array([key[0] * 4, key[1] * 4, key[2] * 4, key[3]]))]
        np.testing.assert_allclose(g, want, atol=1e-6)


@pytest.mark.parametrize("baseop,groups", [("cos", 1), ("sin", 1),
                                           ("cos_x", 1), ("cos", 2)])
def test_elk_block_forward(baseop, groups):
    rng = np.random.default_rng(13)
    coords, feats = oracles.random_cloud(rng, 200, span=(24, 24, 10),
                                         channels=8)
    cap = 256
    st = make_sparse_tensor(pad_feats(feats, cap), pad_coords(coords, cap),
                            nnz=len(coords), stride=1)
    block = ELKBlock(inc=8, aux_capacity=cap, groups=groups, baseop=baseop)
    params = block.init(jax.random.PRNGKey(0), st, 3, 2)
    out = block.apply(params, st, 3, 2)
    f = np.asarray(out.feats)[:len(coords)]
    assert np.isfinite(f).all()
    assert (f >= 0).all()  # final ReLU
    assert f.std() > 0


@pytest.mark.slow           # ~97 s of join-chain compile; the op-level
# aggregation oracles (test_voxel_to_aux_to_voxel) stay in the default run
def test_elk_equals_window_mean_identity_basis():
    """With pos_weight == 0 and baseop 'cos', cos basis degenerates to the
    plain (r s)^3-window count-weighted mean of pre_mix features — an
    analytic ground truth for the whole aggregation chain."""
    rng = np.random.default_rng(14)
    coords, feats = oracles.random_cloud(rng, 150, span=(20, 20, 8),
                                         channels=4)
    cap = 192
    st = make_sparse_tensor(pad_feats(feats, cap), pad_coords(coords, cap),
                            nnz=len(coords), stride=1)
    s, r = 3, 2
    block = ELKBlock(inc=4, aux_capacity=cap, groups=1, baseop="cos")
    params = block.init(jax.random.PRNGKey(1), st, s, r)
    params = jax.tree_util.tree_map(lambda x: x, params)
    # zero the positional map -> pw = 0 -> cos branch = window mean
    p = params["params"]
    p["pos_weight"]["kernel"] = jnp.zeros_like(p["pos_weight"]["kernel"])

    out = block.apply({"params": p}, st, s, r)

    # Reproduce: pre_mix = LN(feats @ W); window mean; LN; + LN(local); relu
    w_pre = np.asarray(p["pre_mix"]["kernel"])
    f_in = feats @ w_pre
    mu = f_in.mean(1, keepdims=True)
    sd = np.sqrt(((f_in - mu) ** 2).mean(1, keepdims=True) + 1e-6)
    f_in = (f_in - mu) / sd

    aux_c, aux_f, oidx, ocnt = oracles.voxel_to_aux(coords, f_in, s)
    agg = oracles.aux_to_voxel(aux_c, aux_f, ocnt, oidx, r)
    mu = agg.mean(1, keepdims=True)
    sd = np.sqrt(((agg - mu) ** 2).mean(1, keepdims=True) + 1e-6)
    want_new = (agg - mu) / sd

    # local branch from the module itself (trust conv tests): recover via
    # inverting the final relu sum is messy -> instead compare the
    # aggregated branch by re-running with local_mix kernel zeroed too.
    p["local_mix"]["kernel"] = jnp.zeros_like(p["local_mix"]["kernel"])
    out = block.apply({"params": p}, st, s, r)
    # local branch LN(0)=0, so output = relu(LN(window_mean))
    got = np.asarray(out.feats)[:len(coords)]
    np.testing.assert_allclose(got, np.maximum(want_new, 0), atol=2e-3)


@pytest.mark.parametrize("s,r", [(7, 3), (3, 3), (2, 1)])
def test_dense_aux_window_matches_sparse(s, r):
    """elk_aux_window_dense (scatter + box_sum, round 5) must reproduce
    the sparse voxel_to_aux/aux_to_voxel pipeline bit-close (same f32
    sums, different association order only)."""
    rng = np.random.default_rng(21)
    coords, feats = oracles.random_cloud(rng, 800, span=(40, 36, 14),
                                         batch=2, channels=9)
    cap = 1024
    st = make_sparse_tensor(pad_feats(feats, cap), pad_coords(coords, cap),
                            nnz=len(coords), stride=1)
    aux, idx, counts = elkops.voxel_to_aux(st, s, cap)
    want = np.asarray(elkops.aux_to_voxel(aux, st, idx, counts, r).feats)
    got = np.asarray(elkops.elk_aux_window_dense(
        st.feats, st.coords, s, r, (40, 36, 14, 2)))
    n = len(coords)
    np.testing.assert_allclose(got[:n], want[:n], rtol=2e-5, atol=2e-5)
    # padding rows decode to zero in the dense form
    assert np.all(got[n:] == 0) or np.allclose(got[n:], 0)


def test_dense_aux_gate():
    """use_dense_aux: active only with a known grid bound, odd r, and an
    aux grid under budget."""
    rng = np.random.default_rng(22)
    coords, feats = oracles.random_cloud(rng, 100, span=(20, 20, 8),
                                         batch=1, channels=4)
    st = make_sparse_tensor(pad_feats(feats, 128), pad_coords(coords, 128),
                            nnz=len(coords), stride=1)
    assert elkops.use_dense_aux(st, 7, 3, 8) is None      # no grid bound
    st2 = st.replace(grid_extent=(20, 20, 8, 1))
    assert elkops.use_dense_aux(st2, 7, 3, 8) == (20, 20, 8, 1)
    assert elkops.use_dense_aux(st2, 7, 2, 8) is None     # even r
    old = elkops.DENSE_AUX_MAX_BYTES
    try:
        elkops.DENSE_AUX_MAX_BYTES = 16
        assert elkops.use_dense_aux(st2, 7, 3, 8) is None  # over budget
    finally:
        elkops.DENSE_AUX_MAX_BYTES = old
