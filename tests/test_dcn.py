"""DCN v1 / DCNSepHead: numpy-oracle parity, standard-conv degeneration,
offset gradients, and the dcn_head=True CenterHead path (reference
center_head.py:27-66,114-162; deform_conv_cuda_kernel.cu sampling rules)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from link_tpu.models.dcn import DCNSepHead, FeatureAdaption, deform_conv2d


def _bil(img, y, x):
    """Zero-padded bilinear read of img (H, W, C) at fractional (y, x)."""
    h, w, _ = img.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    v = np.zeros(img.shape[-1], np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            yy, xx = y0 + dy, x0 + dx
            if 0 <= yy < h and 0 <= xx < w:
                wg = ((y - y0 if dy else 1 - (y - y0))
                      * (x - x0 if dx else 1 - (x - x0)))
                v += wg * img[yy, xx]
    return v


def _np_deform_conv(x, off, w, ks, g):
    b, h, wid, c = x.shape
    k = ks * ks
    co = w.shape[2]
    cg = c // g
    pad = (ks - 1) // 2
    out = np.zeros((b, h, wid, co), np.float64)
    for bi in range(b):
        for i in range(h):
            for j in range(wid):
                for kk in range(k):
                    ky, kx = kk // ks - pad, kk % ks - pad
                    row = np.zeros(c, np.float64)
                    for gi in range(g):
                        dy = off[bi, i, j, (gi * k + kk) * 2]
                        dx = off[bi, i, j, (gi * k + kk) * 2 + 1]
                        row[gi * cg:(gi + 1) * cg] = _bil(
                            x[bi, :, :, gi * cg:(gi + 1) * cg],
                            i + ky + dy, j + kx + dx)
                    out[bi, i, j] += row @ w[kk]
    return out


def test_deform_conv_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    b, h, w, c, g, co, ks = 2, 7, 6, 8, 2, 5, 3
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    # offsets spanning in-map, sub-pixel, and off-map samples
    off = rng.uniform(-2.5, 2.5, (b, h, w, g * ks * ks * 2)).astype(np.float32)
    wgt = rng.normal(size=(ks * ks, c, co)).astype(np.float32) * 0.3

    got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt),
                        kernel_size=ks, deformable_groups=g)
    want = _np_deform_conv(x, off, wgt, ks, g)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_deform_conv_zero_offsets_is_standard_conv():
    rng = np.random.default_rng(1)
    b, h, w, c, co, ks = 1, 9, 9, 8, 6, 3
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    wgt = rng.normal(size=(ks * ks, c, co)).astype(np.float32)
    off = np.zeros((b, h, w, 4 * ks * ks * 2), np.float32)

    got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt),
                        kernel_size=ks, deformable_groups=4)
    # (K, C, Co) row-major (ky, kx) -> HWIO
    hwio = np.asarray(wgt).reshape(ks, ks, c, co)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(hwio), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_offset_gradients_flow():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(size=(9, 4, 4)).astype(np.float32))
    off0 = jnp.asarray(
        rng.uniform(-0.4, 0.4, (1, 6, 6, 2 * 9 * 2)).astype(np.float32))

    def f(off):
        return jnp.sum(deform_conv2d(x, off, wgt, deformable_groups=2) ** 2)

    g = jax.grad(f)(off0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0

    # finite-difference check on one coordinate
    e = np.zeros(off0.shape, np.float32)
    e[0, 3, 3, 5] = 1.0
    eps = 1e-3
    fd = (f(off0 + eps * jnp.asarray(e)) - f(off0 - eps * jnp.asarray(e))) \
        / (2 * eps)
    np.testing.assert_allclose(float(g[0, 3, 3, 5]), float(fd),
                               rtol=5e-2, atol=5e-4)


def test_feature_adaption_zero_init_matches_plain_conv_sample():
    """The reference init_offset zeroes only the conv_offset WEIGHT; with
    the bias also forced to zero the module must reduce to a plain
    (deformable-group-agnostic) 3x3 conv + ReLU."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    m = FeatureAdaption(8)
    vs = m.init(jax.random.PRNGKey(0), x)
    # init parity with torch: weight all-zero, bias a nonzero uniform draw
    off_p = vs["params"]["conv_offset"]
    assert not np.any(np.asarray(off_p["kernel"]))
    bias = np.asarray(off_p["bias"])
    bound = 1.0 / np.sqrt(8)
    assert np.any(bias) and np.all(np.abs(bias) <= bound)
    vs = jax.tree_util.tree_map(lambda a: a, vs)  # unfreeze-safe copy
    vs["params"]["conv_offset"]["bias"] = jnp.zeros_like(off_p["bias"])
    y = m.apply(vs, x)
    w = vs["params"]["deform_weight"]
    hwio = jnp.reshape(w, (3, 3, 8, 8))
    want = jax.nn.relu(jax.lax.conv_general_dilated(
        x, hwio, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_dcn_sep_head_shapes_and_grad():
    heads = (("reg", (2, 2)), ("height", (1, 2)), ("dim", (3, 2)),
             ("rot", (2, 2)), ("vel", (2, 2)))
    m = DCNSepHead(heads=heads, num_cls=2)
    x = jnp.asarray(np.random.default_rng(4)
                    .normal(size=(1, 8, 8, 16)).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(vs, x, False)
    assert out["hm"].shape == (1, 8, 8, 2)
    assert out["dim"].shape == (1, 8, 8, 3)
    # hm final bias init (reference cls_head[-1].bias.fill_(-2.19))
    np.testing.assert_allclose(
        np.asarray(vs["params"]["cls1"]["bias"]), -2.19, atol=1e-6)

    def loss(p):
        o = m.apply({"params": p, "batch_stats": vs["batch_stats"]}, x,
                    True, mutable=["batch_stats"])[0]
        return sum(jnp.sum(v ** 2) for v in o.values())

    g = jax.grad(loss)(vs["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)


def test_center_head_dcn_path():
    from link_tpu.models.center_head import CenterHead
    m = CenterHead(tasks=(("car",), ("bus", "trailer")), dcn_head=True)
    x = jnp.asarray(np.random.default_rng(5)
                    .normal(size=(1, 32, 8, 8)).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x, False)
    preds = m.apply(vs, x, False)
    assert len(preds) == 2
    assert preds[0]["hm"].shape == (1, 8, 8, 1)
    assert preds[1]["hm"].shape == (1, 8, 8, 2)
    assert preds[1]["vel"].shape == (1, 8, 8, 2)
