"""Voxel-feature golden parity vs the PyTorch reference (VERDICT r1 item
4 / BASELINE's fidelity demand): goldens in tests/goldens/ were produced
by running the REFERENCE ELKUNet (linkunet.py, torchsparse-u CPU backend
built out-of-tree; see tools/make_goldens.py) on synthetic scans. This
test translates the reference state_dict through utils/torch_import and
asserts our JAX model reproduces the reference logits."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from link_tpu.models.linkunet import ELKUNet
from link_tpu.sparse.tensor import make_sparse_tensor
from link_tpu.utils.torch_import import translate_elkunet

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
SCANS = sorted(glob.glob(os.path.join(GOLDEN_DIR, "elkunet_cr*_[0-9].npz")))


TSELK = os.path.join(GOLDEN_DIR, "tselk_cos.npz")


@pytest.mark.skipif(not os.path.exists(TSELK),
                    reason="no det golden generated")
def test_tselk_block_matches_reference():
    """Detection ELK block (cos basis, det channel grouping) vs the
    reference TSELKBlock golden (tools/make_goldens_det.py); also
    numerically validates the det translator's ELK mapping conventions
    (utils/torch_import_det.py:117-130)."""
    from link_tpu.models.elk import ELKBlock

    g = np.load(TSELK)
    coords, feats, want = g["coords"], g["feats"], g["out"]
    inc, block_sz = int(g["inc"]), int(g["block_sz"])
    sd = {k[3:].replace("__", "."): g[k] for k in g.files
          if k.startswith("sd_")}

    n, cap = len(coords), 1024
    cpad = np.full((cap, 4), -(2 ** 20), np.int32)
    fpad = np.zeros((cap, inc), np.float32)
    cpad[:n], fpad[:n] = coords, feats
    st = make_sparse_tensor(fpad, cpad, nnz=n)

    model = ELKBlock(inc=inc, aux_capacity=cap, baseop="cos",
                     det_grouping=True)
    params = {
        "pre_mix": {"kernel": sd["pre_mix.0.weight"].T},
        "pre_mix_norm": {"scale": sd["pre_mix.1.weight"],
                         "bias": sd["pre_mix.1.bias"]},
        "local_mix": {"kernel": sd["local_mix.0.kernel"]},
        "pos_weight": {"kernel": sd["pos_weight.0.weight"].T},
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
        "norm_local": {"scale": sd["norm_local.weight"],
                       "bias": sd["norm_local.bias"]},
    }
    out = model.apply({"params": params}, st, block_sz, 3, False)
    got = np.asarray(out.feats)[:n]
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 2e-4, f"tselk rel err {err}"

    # same golden through the DENSE-aux window path (round 5): a
    # grid_extent bound activates elk_aux_window_dense in ELKBlock
    ext = tuple(int(v) for v in coords[:, :3].max(0) + 1) + (
        int(coords[:, 3].max()) + 1,)
    std = st.replace(grid_extent=ext)
    from link_tpu.ops.elk import use_dense_aux
    assert use_dense_aux(std, block_sz, 3, 2 * inc) is not None
    outd = model.apply({"params": params}, std, block_sz, 3, False)
    gotd = np.asarray(outd.feats)[:n]
    errd = np.max(np.abs(gotd - want)) / (np.max(np.abs(want)) + 1e-9)
    assert errd < 2e-4, f"tselk dense-aux rel err {errd}"


ENCODER = os.path.join(GOLDEN_DIR, "elkencoder_cr0.25.npz")
MINK = os.path.join(GOLDEN_DIR, "minkunet_cr0.25.npz")
SPV = os.path.join(GOLDEN_DIR, "spvcnn_cr0.25.npz")

# level-1 cap 640 everywhere: these ~590-voxel clouds hit ~500-515
# distinct stride-2 cells, and a 512 cap SILENTLY drops voxels (the
# SPVCNN golden measured 514 -> 2 mismatched rows before the bump)
GOLDEN_CAPS = (1024, 640, 256, 128, 64)


def _pad_cloud(coords, feats, cap):
    n = len(coords)
    cpad = np.full((cap, 4), -(2 ** 20), np.int32)
    fpad = np.zeros((cap, feats.shape[1]), np.float32)
    cpad[:n], fpad[:n] = coords, feats
    return make_sparse_tensor(fpad, cpad, nnz=n), n


@pytest.mark.slow          # full-model compile
@pytest.mark.skipif(not os.path.exists(ENCODER),
                    reason="no encoder golden generated")
def test_elkencoder_matches_reference_logits():
    """Second seg model family end-to-end: the encoder-only LinK at the
    published cos:(3x5)^3 groups=2 config (README Model Zoo row 4) —
    numerically pins upsample_voxel's nearest-ancestor broadcast, the
    grouped Conv1d classifier mapping, and the cos-basis ELK at r=3."""
    from link_tpu.models.linkencoder import ELKEncoder
    from link_tpu.utils.torch_import import translate_elkencoder

    g = np.load(ENCODER)
    coords, feats, want = g["coords"], g["feats"], g["logits"]
    sd = {k[3:].replace("__", "."): g[k] for k in g.files
          if k.startswith("sd_")}
    translated = translate_elkencoder(sd)

    model = ELKEncoder(num_classes=20, cr=float(g["cr"]), groups=2,
                       baseop="cos", r=3, s=5, capacities=GOLDEN_CAPS)
    st, n = _pad_cloud(coords, feats, GOLDEN_CAPS[0])
    got = model.apply({"params": translated["params"],
                       "batch_stats": translated["batch_stats"]},
                      st, False)
    got = np.asarray(got)[:n]
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 2e-4, f"encoder rel err {err}"


@pytest.mark.slow          # full-model compile
@pytest.mark.skipif(not os.path.exists(MINK),
                    reason="no minkunet golden generated")
def test_minkunet_matches_reference_logits():
    """Baseline family 1: plain sparse UNet at the reference's ACTUAL
    channel plan cs=[64]*9 (minkunet.py:98)."""
    from link_tpu.models.minkunet import MinkUNet
    from link_tpu.utils.torch_import import translate_minkunet

    g = np.load(MINK)
    sd = {k[3:].replace("__", "."): g[k] for k in g.files
          if k.startswith("sd_")}
    tr = translate_minkunet(sd)
    model = MinkUNet(num_classes=20, cr=float(g["cr"]),
                     capacities=GOLDEN_CAPS)
    st, n = _pad_cloud(g["coords"], g["feats"], GOLDEN_CAPS[0])
    got = np.asarray(model.apply(
        {"params": tr["params"], "batch_stats": tr["batch_stats"]},
        st, False))[:n]
    want = g["logits"]
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 2e-4, f"minkunet rel err {err}"


@pytest.mark.slow          # full-model compile
@pytest.mark.skipif(not os.path.exists(SPV),
                    reason="no spvcnn golden generated")
def test_spvcnn_matches_reference_logits():
    """Baseline family 2: point-voxel UNet — numerically pins
    initial_voxelize / voxel_to_point (trilinear) / point_to_voxel and
    the point-transform MLPs against the reference (spvcnn.py:189-233)."""
    from link_tpu.models.spvcnn import SPVCNN
    from link_tpu.utils.torch_import import translate_spvcnn

    g = np.load(SPV)
    sd = {k[3:].replace("__", "."): g[k] for k in g.files
          if k.startswith("sd_")}
    tr = translate_spvcnn(sd)
    model = SPVCNN(num_classes=20, cr=float(g["cr"]),
                   capacities=GOLDEN_CAPS, pres=1.0, vres=1.0)
    st, n = _pad_cloud(g["coords"], g["feats"], GOLDEN_CAPS[0])
    got = np.asarray(model.apply(
        {"params": tr["params"], "batch_stats": tr["batch_stats"]},
        st, False))[:n]
    want = g["logits"]
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 2e-4, f"spvcnn rel err {err}"


@pytest.mark.slow          # ~100 s full-model compile (TSELK block parity
#                            stays in the default profile above)
@pytest.mark.skipif(not SCANS, reason="no golden files generated")
def test_elkunet_matches_reference_logits():
    state_path = glob.glob(os.path.join(GOLDEN_DIR, "*_state.npz"))[0]
    sd = dict(np.load(state_path))
    translated = translate_elkunet(sd)
    cr = float(np.load(SCANS[0])["cr"])

    model = ELKUNet(num_classes=20, cr=cr, capacities=GOLDEN_CAPS)

    for path in SCANS:
        g = np.load(path)
        st, n = _pad_cloud(g["coords"], g["feats"], GOLDEN_CAPS[0])
        want = g["logits"]
        got = model.apply({"params": translated["params"],
                           "batch_stats": translated["batch_stats"]},
                          st, False)
        got = np.asarray(got)[:n]
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert err < 2e-4, f"{os.path.basename(path)}: rel err {err}"


FULLSCALE = os.path.join(GOLDEN_DIR, "elkunet_cr1.0_fullscale.npz")


@pytest.mark.slow          # production-capacity compile + forward (~min)
@pytest.mark.skipif(not os.path.exists(FULLSCALE),
                    reason="no full-scale golden generated")
@pytest.mark.parametrize("dtype,tol", [("float32", 2e-4)])
def test_elkunet_fullscale_matches_reference(dtype, tol):
    """Scan-scale parity (VERDICT r3 item 4): the torch reference ELKUNet
    cr1.0 on a REAL 80k-voxel SemanticKITTI-shaped scan (the bench.py
    input distribution, tools/make_goldens_fullscale.py) vs our model at
    the production DEFAULT_CAPACITIES. This is the scale where padding
    lanes, capacity pressure, and the DirectIndex fence hierarchy
    (W/S1 spans, fence2 broadcasts) actually engage — none of which the
    ~600-voxel cr0.25 goldens exercise."""
    from link_tpu.models.linkunet import DEFAULT_CAPACITIES

    g = np.load(FULLSCALE)
    sd = {k[len("state/"):]: g[k] for k in g.files
          if k.startswith("state/")}
    translated = translate_elkunet(sd)
    model = ELKUNet(num_classes=20, cr=float(g["cr"]),
                    capacities=DEFAULT_CAPACITIES, dtype=dtype)
    st, n = _pad_cloud(g["coords"], g["feats"], DEFAULT_CAPACITIES[0])
    got = np.asarray(model.apply(
        {"params": translated["params"],
         "batch_stats": translated["batch_stats"]}, st, False))[:n]
    want = g["logits"]
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < tol, f"fullscale {dtype} rel err {err}"


TSELK_FULL = os.path.join(GOLDEN_DIR, "tselk_cos_fullscale.npz")


@pytest.mark.slow          # production det capacity (160k rows) on CPU
@pytest.mark.skipif(not os.path.exists(TSELK_FULL),
                    reason="no full-scale det golden generated")
def test_tselk_block_fullscale_matches_reference():
    """Det half of the scan-scale parity pins (VERDICT r3 item 4): the
    reference TSELKBlock on a production ~160k-voxel nuScenes-shaped
    frame (tools/make_goldens_det.py --fullscale) vs our ELKBlock at the
    real det capacity — the det joins/aux windows at real spans."""
    from link_tpu.models.elk import ELKBlock

    g = np.load(TSELK_FULL)
    coords, feats, want = g["coords"], g["feats"], g["out"]
    inc, block_sz = int(g["inc"]), int(g["block_sz"])
    sd = {k[3:].replace("__", "."): g[k] for k in g.files
          if k.startswith("sd_")}

    n, cap = len(coords), 163840
    cpad = np.full((cap, 4), -(2 ** 20), np.int32)
    fpad = np.zeros((cap, inc), np.float32)
    cpad[:n], fpad[:n] = coords, feats
    st = make_sparse_tensor(fpad, cpad, nnz=n)

    model = ELKBlock(inc=inc, aux_capacity=cap, baseop="cos",
                     det_grouping=True)
    params = {
        "pre_mix": {"kernel": sd["pre_mix.0.weight"].T},
        "pre_mix_norm": {"scale": sd["pre_mix.1.weight"],
                         "bias": sd["pre_mix.1.bias"]},
        "local_mix": {"kernel": sd["local_mix.0.kernel"]},
        "pos_weight": {"kernel": sd["pos_weight.0.weight"].T},
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
        "norm_local": {"scale": sd["norm_local.weight"],
                       "bias": sd["norm_local.bias"]},
    }
    out = model.apply({"params": params}, st, block_sz, 3, False)
    got = np.asarray(out.feats)[:n]
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert err < 2e-4, f"fullscale tselk rel err {err}"
