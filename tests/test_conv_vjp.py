"""Gradient parity of the custom conv VJP (conv._gm) vs plain AD.

The custom backward rewrites the K scatter-adds AD emits into mirrored-tap
or inverse-map gathers (conv.py _gm). These tests flip conv.CUSTOM_VJP and
assert identical gradients — including w.r.t. padding rows, whose queries
must all miss for the mirror identity to hold exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from link_tpu.sparse import conv as spconv
from link_tpu.sparse import coords as coordlib
from link_tpu.sparse.tensor import make_sparse_tensor


def _random_sparse(rng, n, cap, c, span=24):
    coords = np.unique(
        np.stack([rng.integers(0, span, 4 * n),
                  rng.integers(0, span, 4 * n),
                  rng.integers(0, span, 4 * n),
                  np.zeros(4 * n, np.int64)], 1).astype(np.int32), axis=0)[:n]
    feats = rng.normal(size=(len(coords), c)).astype(np.float32)
    pc = np.full((cap, 4), coordlib.INVALID_COORD, np.int32)
    pc[:len(coords)] = coords
    pf = np.zeros((cap, c), np.float32)
    pf[:len(coords)] = feats
    return pf, pc, np.int32(len(coords))


def _grads(fn, *args):
    return jax.jit(jax.grad(fn, argnums=(0, 1)))(*args)


@pytest.mark.parametrize("mode", ["subm", "subm_sorted", "strided",
                                  "transposed"])
def test_custom_vjp_matches_ad(mode):
    rng = np.random.default_rng(3)
    cap, c, co = 512, 8, 12
    pf, pc, nnz = _random_sparse(rng, 400, cap, c)
    sorted_in = mode == "subm_sorted"
    if sorted_in:
        # pack-key order -> the plan carries the window form and, at
        # c*itemsize*G <= 256 B, the conv runs the WINDOWED custom-VJP
        # path (_gm_win_factory) — this variant pins its grad parity
        hi, lo = coordlib.pack_coords(jnp.asarray(pc))
        order = np.lexsort((np.asarray(lo), np.asarray(hi)))
        pc = pc[order]
        pf = pf[order]
        mode = "subm"
    if mode == "subm":
        w = rng.normal(size=(27, c, co)).astype(np.float32) * 0.2

        def run(feats, weight):
            st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(pc),
                                    nnz=nnz, base_sorted=sorted_in)
            out = spconv.conv3d(st, weight, 3, prefer_window=sorted_in)
            valid = (jnp.arange(cap) < nnz)[:, None]
            return jnp.sum(jnp.where(valid, out.feats, 0.0) ** 2)
    elif mode == "strided":
        w = rng.normal(size=(8, c, co)).astype(np.float32) * 0.2

        def run(feats, weight):
            st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(pc),
                                    nnz=nnz, base_sorted=False)
            out = spconv.conv3d(st, weight, 2, stride=2,
                                out_capacity=cap // 2)
            valid = (jnp.arange(cap // 2) < out.nnz)[:, None]
            return jnp.sum(jnp.where(valid, out.feats, 0.0) ** 2)
    else:
        w = rng.normal(size=(8, c, c)).astype(np.float32) * 0.2
        w2 = jnp.asarray(rng.normal(size=(8, c, co)).astype(np.float32) * 0.2)

        def run(feats, weight):
            st = make_sparse_tensor(jnp.asarray(feats), jnp.asarray(pc),
                                    nnz=nnz, base_sorted=False)
            down = spconv.conv3d(st, weight, 2, stride=2,
                                 out_capacity=cap // 2)
            up = spconv.conv3d(down, w2, 2, stride=2, transposed=True)
            valid = (jnp.arange(cap) < up.nnz)[:, None]
            return jnp.sum(jnp.where(valid, up.feats, 0.0) ** 2)

    w = jnp.asarray(w)
    pf = jnp.asarray(pf)
    try:
        spconv.CUSTOM_VJP = True
        g_custom = _grads(run, pf, w)
        spconv.CUSTOM_VJP = False
        g_ad = _grads(run, pf, w)
    finally:
        spconv.CUSTOM_VJP = True
    for a, b, name in [(g_custom[0], g_ad[0], "d_feats"),
                       (g_custom[1], g_ad[1], "d_weight")]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_mirror_perm():
    offs = coordlib.kernel_offsets_np((3, 3, 3), stride=(1, 1, 1),
                                      dilation=(1, 1, 1))
    mir = spconv.mirror_perm(offs)
    assert mir is not None
    np.testing.assert_array_equal(np.asarray(offs)[list(mir)],
                                  -np.asarray(offs))
    # even kernels have no mirror
    offs2 = coordlib.kernel_offsets_np((2, 2, 2), stride=(1, 1, 1),
                                       dilation=(1, 1, 1))
    assert spconv.mirror_perm(offs2) is None


def test_lovasz_sort_form_grad_parity():
    """The sort-form Lovász backward (both permutations as stable
    multi-operand sorts over stop-grad values, gradient through the final
    dot only) == plain argsort-gather AD."""
    from link_tpu.train import losses as L
    rng = np.random.default_rng(7)
    n, c = 300, 5
    logits = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    valid = jnp.asarray(rng.random(n) < 0.8)

    def loss_custom(lg):
        return L.segmentation_loss(lg, labels, valid)[0]

    def loss_plain(lg):
        probas = jax.nn.softmax(lg.astype(jnp.float32), -1)
        keep = (valid & (labels != 0)).astype(jnp.float32)

        def class_loss(cls):
            fg = (labels == cls).astype(jnp.float32) * keep
            errors = jnp.abs(fg - probas[:, cls]) * keep
            order = jnp.argsort(-errors)
            es, fs = errors[order], fg[order]
            grad = L._lovasz_grad_from_sorted(fs)
            present = (jnp.sum(fg) > 0).astype(jnp.float32)
            return jnp.dot(es, grad) * present, present

        losses, presents = jax.vmap(class_loss)(jnp.arange(c))
        lov = jnp.sum(losses) / jnp.maximum(jnp.sum(presents), 1.0)
        return L.cross_entropy(lg, labels, valid) + lov

    g1 = jax.jit(jax.grad(loss_custom))(logits)
    g2 = jax.jit(jax.grad(loss_plain))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-5)


def test_spdevoxelize_mirror_grad_parity():
    """aux_to_voxel's window-sum backward (mirror inverse map) == plain AD,
    including padding rows and boundary cells with missing neighbors."""
    from link_tpu.sparse import ops as spops

    rng = np.random.default_rng(11)
    cap, c = 256, 9
    feats, coords, nnz = _random_sparse(rng, 200, cap, c, span=10)
    coords_j = jnp.asarray(coords)
    hi, lo = coordlib.pack_coords(coords_j)
    order = np.lexsort((np.asarray(lo), np.asarray(hi)))
    coords_j = coords_j[order]
    feats = feats[order]
    table = coordlib.build_table(coords_j, assume_sorted=True)
    offs = coordlib.kernel_offsets_np((3, 3, 3), stride=1, dilation=1)
    nb_idx, _, _ = coordlib.grouped_window_query(
        table, coords_j, offs, 1, queries_sorted=True, self_query=True)
    nb_idx = nb_idx.T                                    # (cap, 27)
    mir = spconv.mirror_perm(offs)
    inv_nb = nb_idx[:, np.asarray(mir)]
    # the inverse-map identity the VJP relies on
    nb_np, inv_np = np.asarray(nb_idx), np.asarray(inv_nb)
    for k in range(nb_np.shape[1]):
        j = np.nonzero(inv_np[:, k] >= 0)[0]
        np.testing.assert_array_equal(nb_np[inv_np[j, k], k], j)
    w = jnp.ones(nb_idx.shape, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(cap, c)).astype(np.float32))

    def loss_inv(f):
        return jnp.vdot(spops.spdevoxelize(f, nb_idx, w, inv_idx=inv_nb),
                        cot)

    def loss_ad(f):
        return jnp.vdot(spops.spdevoxelize(f, nb_idx, w), cot)

    f = jnp.asarray(feats)
    np.testing.assert_allclose(
        np.asarray(jax.jit(jax.grad(loss_inv))(f)),
        np.asarray(jax.jit(jax.grad(loss_ad))(f)), atol=1e-5, rtol=1e-5)
    # forward parity too
    np.testing.assert_allclose(
        np.asarray(spops.spdevoxelize(f, nb_idx, w, inv_idx=inv_nb)),
        np.asarray(spops.spdevoxelize(f, nb_idx, w)), atol=1e-6)
