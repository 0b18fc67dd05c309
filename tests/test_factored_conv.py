"""x-factored conv apply (conv.build_fact_index / _fact_apply_impl) vs the
per-tap gather reference path: identical outputs and gradients.

The factored apply pre-combines each (dy, dz) group's x-run taps with
dense matmuls + masked row shifts and gathers ONE row per group — it must
be bit-equivalent (f32) to the per-tap gather-matmul form on any packable
input, including capacity padding, batch boundaries, and sparse x-runs
with gaps (the Ybar/E/C case analysis)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from link_tpu.sparse import conv as convlib
from link_tpu.sparse import coords as coordlib
from link_tpu.sparse import spconv_engine as eng
from link_tpu.sparse.tensor import SparseTensor


def _rand_coords(rng, n, extent, nb=2, gap_frac=0.5):
    """Sparse coords with deliberate x-run structure: ~half the sites come
    from contiguous x-runs (adjacency cases), half isolated (miss cases)."""
    pts = []
    while len(pts) < n:
        b = rng.integers(0, nb)
        z = rng.integers(0, extent)
        y = rng.integers(0, extent)
        x0 = rng.integers(0, extent)
        run = rng.integers(1, 5) if rng.random() > gap_frac else 1
        step = 1 if rng.random() > 0.3 else 2    # gap-2 runs hit the E case
        for i in range(run):
            x = x0 + i * step
            if x < extent:
                pts.append((x, y, z, b))
    arr = np.unique(np.asarray(pts[:n], np.int32), axis=0)
    return arr


def _make_tensor(rng, n_valid, cap, c, extent=24):
    coords = _rand_coords(rng, n_valid, extent)
    n = coords.shape[0]
    hi, lo = coordlib.pack_coords(jnp.asarray(coords))
    order = np.lexsort((np.asarray(lo), np.asarray(hi)))
    coords = coords[order]
    pad = np.full((cap - n, 4), coordlib.INVALID_COORD, np.int32)
    coords = jnp.asarray(np.concatenate([coords, pad]))
    feats = jnp.asarray(
        np.where(np.arange(cap)[:, None] < n,
                 rng.standard_normal((cap, c)), 0.0), jnp.float32)
    return SparseTensor(feats=feats, coords=coords,
                        nnz=jnp.int32(n), base_sorted=True,
                        coords_sorted=True)


@pytest.mark.parametrize("ks,stride", [(3, 1), (2, 2)])
def test_factored_matches_per_tap(ks, stride):
    rng = np.random.default_rng(0)
    ci, co = 8, 16
    st = _make_tensor(rng, 180, 256, ci)
    w = jnp.asarray(rng.standard_normal(
        (ks ** 3, ci, co)) * 0.1, jnp.float32)

    def run(factored):
        convlib.FACTORED_APPLY = "auto" if factored else "0"
        try:
            s = st.replace(kmaps={}, cmaps={})
            out = convlib.conv3d(s, w, ks, stride=stride)
            key = ("plan", (1, 1, 1), (ks,) * 3, (stride,) * 3, (1, 1, 1))
            plan = s.kmaps[key]
            return out.feats, plan
        finally:
            convlib.FACTORED_APPLY = "0"

    ref, plan_ref = run(False)
    got, plan = run(True)
    assert plan.fact_idx is not None, "factored plan fields missing"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_factored_grads_match_plain_ad():
    rng = np.random.default_rng(1)
    ci, co = 8, 8
    st = _make_tensor(rng, 150, 192, ci)
    w = jnp.asarray(rng.standard_normal((27, ci, co)) * 0.1, jnp.float32)

    def loss_with(factored, custom):
        convlib.FACTORED_APPLY = "auto" if factored else "0"
        convlib.CUSTOM_VJP = custom
        try:
            def f(feats, weight):
                s = st.replace(feats=feats, kmaps={}, cmaps={})
                out = convlib.conv3d(s, weight, 3)
                return jnp.sum(out.feats ** 2)
            return jax.grad(f, argnums=(0, 1))(st.feats, w)
        finally:
            convlib.FACTORED_APPLY = "0"
            convlib.CUSTOM_VJP = True

    gf, gw_f = loss_with(True, True)
    gr, gw_r = loss_with(False, False)     # plain AD reference
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_factored_spconv_strided():
    rng = np.random.default_rng(2)
    ci, co = 6, 12
    st = _make_tensor(rng, 160, 224, ci, extent=20)
    w = jnp.asarray(rng.standard_normal((27, ci, co)) * 0.1, jnp.float32)

    def run(factored):
        convlib.FACTORED_APPLY = "auto" if factored else "0"
        try:
            s = st.replace(kmaps={}, cmaps={})
            out, shape = eng.spconv3d(s, w, 3, in_shape=(24, 24, 24),
                                      stride=2, padding=1, batch_size=2)
            return out.feats
        finally:
            convlib.FACTORED_APPLY = "0"

    ref = run(False)
    got = run(True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
