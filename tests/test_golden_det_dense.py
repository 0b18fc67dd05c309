"""Dense det golden parity: our flax RPN + CenterHead vs the reference
torch modules (rpn.py:22-160, center_head.py:170-246) run on CPU.

The golden (tests/goldens/det_dense.npz, tools/make_goldens_det.py
--dense-only) carries the reference state_dict, a random BEV input, the
RPN output and every task head map — so this numerically validates
utils/torch_import_det.translate_dense end-to-end: conv/deconv layout
transposes (incl. the ConvTranspose spatial flip), BN eps/momentum
mapping with nudged running stats, sequential indices, branch wiring.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "det_dense.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN),
                                reason="det_dense golden not generated")


@pytest.fixture(scope="module")
def golden():
    z = np.load(GOLDEN)
    sd = {k[3:].replace("__", "."): z[k] for k in z.files
          if k.startswith("sd_")}
    return z, sd


def test_rpn_matches_reference(golden):
    import jax.numpy as jnp
    from link_tpu.models.rpn import RPN
    from link_tpu.utils.torch_import_det import translate_dense

    z, sd = golden
    tr = translate_dense(sd)
    out = RPN().apply(
        {"params": tr["params"]["neck"],
         "batch_stats": tr["batch_stats"]["neck"]},
        jnp.asarray(z["bev"]), False)
    want = z["rpn_out"]
    err = np.abs(np.asarray(out) - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 1e-5, f"rpn rel err {err}"


def test_double_flip_decode_matches_reference(golden):
    """4-flip TTA fusion + box decode vs the reference
    CenterHead.predict's double_flip branch (map unflips, reg 1-x,
    rot/vel sign flips, means; center_head.py predict) across all six
    task groups with global label offsets. The golden ran with a
    near-zero circle-NMS radius, so NMS is a no-op and the comparison
    pins exactly our double_flip_fuse + decode_boxes math."""
    import jax.numpy as jnp
    from link_tpu.models.center_head import decode_boxes

    flip_path = os.path.join(os.path.dirname(__file__), "goldens",
                             "det_flip.npz")
    if not os.path.exists(flip_path):
        pytest.skip("det_flip golden not generated")
    z = np.load(flip_path)
    num_classes = [1, 2, 2, 1, 2, 2]
    preds = []
    for t in range(6):
        preds.append({k: jnp.asarray(np.transpose(
            z[f"flip_t{t}_{k}"], (0, 2, 3, 1)))
            for k in ("hm", "reg", "height", "dim", "rot", "vel")})
    test_cfg = dict(post_center_limit_range=[-8.0, -8.0, -10.0,
                                             8.0, 8.0, 10.0],
                    score_threshold=0.4, pc_range=[-6.0, -6.0],
                    voxel_size=[0.075, 0.075], out_size_factor=8)
    outs = decode_boxes(preds, test_cfg, num_classes, double_flip=True)
    boxes, scores, labels = [], [], []
    for bx, sc, lb, mk in outs:
        m = np.asarray(mk[0])
        b_, s_, l_ = (np.asarray(bx[0])[m], np.asarray(sc[0])[m],
                      np.asarray(lb[0])[m])
        # reference circle_nms emits keeps in score-descending order
        # (circle_nms_jit.py:9) — replicate for the row-order compare
        order = np.argsort(-s_, kind="stable")
        boxes.append(b_[order])
        scores.append(s_[order])
        labels.append(l_[order])
    boxes = np.concatenate(boxes)
    scores = np.concatenate(scores)
    labels = np.concatenate(labels)
    assert boxes.shape == z["flip_boxes"].shape
    np.testing.assert_allclose(boxes, z["flip_boxes"], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(scores, z["flip_scores"], rtol=1e-5)
    np.testing.assert_array_equal(labels, z["flip_labels"])


def test_roi_head_matches_reference():
    """Two-stage RoIHead eval forward + canonical box decode vs the
    reference (roi_head.py:17-98 + roi_head_template.py
    generate_predicted_boxes): shared/cls/reg Conv1d(k=1)+BN1d stacks
    with nudged running stats, the final biased Conv1ds, and the
    f_{+ry} world-frame refinement over random rois."""
    import jax.numpy as jnp
    from link_tpu.models.two_stage import RoIHead, generate_refined_boxes

    path = os.path.join(os.path.dirname(__file__), "goldens",
                        "det_roi.npz")
    if not os.path.exists(path):
        pytest.skip("det_roi golden not generated")
    z = np.load(path)
    sd = {k[6:].replace("__", "."): z[k] for k in z.files
          if k.startswith("roisd_")}

    # reference Sequential indices: per FC layer [Conv1d, BN1d, ReLU]
    # (+Dropout after shared layer 0 / fc layer 0 — paramless), final
    # biased Conv1d at the stack tail for cls/reg
    def fc(prefix_t, idx):
        return sd[f"{prefix_t}.{idx}.weight"][:, :, 0].T   # (Ci, Co)

    def bn(prefix_t, idx):
        return ({"scale": sd[f"{prefix_t}.{idx}.weight"],
                 "bias": sd[f"{prefix_t}.{idx}.bias"]},
                {"mean": sd[f"{prefix_t}.{idx}.running_mean"],
                 "var": sd[f"{prefix_t}.{idx}.running_var"]})

    params, stats = {}, {}
    for our, ref_pre, conv_ids in (
            ("shared", "shared_fc_layer", (0, 4)),
            ("cls_fc", "cls_layers", (0, 4)),
            ("reg_fc", "reg_layers", (0, 4))):
        for i, ci in enumerate(conv_ids):
            params[f"{our}{i}"] = {"kernel": fc(ref_pre, ci)}
            params[f"{our}{i}_bn"], stats[f"{our}{i}_bn"] = bn(ref_pre,
                                                               ci + 1)
    params["cls"] = {"kernel": fc("cls_layers", 7),
                     "bias": sd["cls_layers.7.bias"]}
    params["reg"] = {"kernel": fc("reg_layers", 7),
                     "bias": sd["reg_layers.7.bias"]}

    feats = jnp.asarray(z["roi_feats"][0])                 # (N, C)
    iou, reg = RoIHead(input_channels=128, code_size=9).apply(
        {"params": params, "batch_stats": stats}, feats, False)
    np.testing.assert_allclose(np.asarray(iou), z["roi_cls"][0, :, 0],
                               rtol=1e-4, atol=1e-5)
    boxes = generate_refined_boxes(jnp.asarray(z["roi_rois"][0]), reg)
    np.testing.assert_allclose(np.asarray(boxes), z["roi_boxes"][0],
                               rtol=1e-4, atol=1e-4)


def test_bev_pooling_matches_reference():
    """Two-stage BEV 5-point pooling vs the reference
    (two_stage.py:get_box_center + bird_eye_view.py +
    bilinear_interpolate_torch), incl. boxes whose sample points land
    outside the map (boundary clamp semantics)."""
    import jax.numpy as jnp
    from link_tpu.models.two_stage import (BEVFeatureExtractor,
                                           box_sample_points)

    path = os.path.join(os.path.dirname(__file__), "goldens",
                        "det_roi.npz")
    if not os.path.exists(path):
        pytest.skip("det_roi golden not generated")
    z = np.load(path)
    if "bev_map" not in z.files:
        pytest.skip("bev golden not generated")
    pts = box_sample_points(jnp.asarray(z["bev_boxes"]), num_point=5)
    pooled = BEVFeatureExtractor(
        pc_start=(-6.0, -6.0), voxel_size=(0.5, 0.5), out_stride=1).apply(
        {}, jnp.asarray(z["bev_map"]), pts, 5)
    np.testing.assert_allclose(np.asarray(pooled), z["bev_pooled"],
                               rtol=1e-4, atol=1e-5)


def test_center_head_matches_reference(golden):
    import jax.numpy as jnp
    from link_tpu.models.center_head import CenterHead
    from link_tpu.utils.torch_import_det import translate_dense

    z, sd = golden
    tr = translate_dense(sd)
    preds = CenterHead().apply(
        {"params": tr["params"]["bbox_head"],
         "batch_stats": tr["batch_stats"]["bbox_head"]},
        jnp.asarray(z["rpn_out"]), False)
    for t, pd in enumerate(preds):
        for name, v in pd.items():
            want = z[f"task{t}_{name}"]            # torch NCHW
            got = np.transpose(np.asarray(v), (0, 3, 1, 2))
            err = (np.abs(got - want).max()
                   / (np.abs(want).max() + 1e-9))
            assert err < 1e-5, f"task{t}/{name} rel err {err}"
