#!/usr/bin/env python
"""Segmentation evaluation: point-level val mIoU via inverse_map remap.

Replacement for segmentation/evaluate.py:33-305 — restores a checkpoint,
runs the val split, maps voxel logits back to full point clouds through
the quantization inverse map (trainers.py:84-103) and reports mIoU; can
also dump SemanticKITTI submission .label files (test.py:34-260) with the
inverse class LUT.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

# learning-map inverse (20 -> raw labels) for submissions
INVERSE_LABEL_MAP = {
    0: 0, 1: 10, 2: 11, 3: 15, 4: 18, 5: 20, 6: 30, 7: 31, 8: 32, 9: 40,
    10: 44, 11: 48, 12: 49, 13: 50, 14: 51, 15: 70, 16: 71, 17: 72, 18: 80,
    19: 81,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--split", default="val", choices=["val", "test"])
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--save-labels", default=None,
                    help="directory for submission .label dumps")
    ap.add_argument("--tta", type=int, default=0,
                    help="N-way rotation voting (reference use_tta / "
                         "set_angle path): average point softmax over N "
                         "z-rotations")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from link_tpu.utils.config import load_config
    from link_tpu.models import builder
    from link_tpu.data.semantic_kitti import (SemanticKITTI,
                                              SyntheticSemanticKITTI)
    from link_tpu.data.collate import audit_capacities, collate_scans
    from link_tpu.sparse.tensor import make_sparse_tensor
    from link_tpu.train import trainer as T
    from link_tpu.train.checkpoint import load_checkpoint
    from link_tpu.train.metrics import MeanIoU

    cfg = load_config(args.config, args.overrides)
    # eval runs uncapped voxel counts (reference evaluates full scans)
    caps = tuple(int(c * 1.6) for c in cfg.model.get("capacities"))
    model = builder.make_model(cfg, capacities=caps)

    if args.synthetic or not os.path.isdir(cfg.dataset.root):
        ds = SyntheticSemanticKITTI(length=8,
                                    voxel_size=cfg.dataset.voxel_size,
                                    num_points=10 ** 9, split="val")
    else:
        ds = SemanticKITTI(cfg.dataset.root, args.split,
                           cfg.dataset.voxel_size, num_points=10 ** 9)

    @jax.jit
    def forward(state_params, state_bs, feats, coords, nnz):
        st = make_sparse_tensor(feats, coords, nnz=nnz, base_sorted=True)
        return model.apply({"params": state_params, "batch_stats": state_bs},
                           st, False)

    # template state for restore
    s0 = ds[0]
    b0 = collate_scans([s0], caps[0], point_capacity=None)
    st = make_sparse_tensor(b0["feats"], b0["coords"], nnz=b0["nnz"], base_sorted=True)
    variables = model.init(jax.random.PRNGKey(0), st, False)
    import optax
    tx = builder.make_optimizer(cfg, lambda s: 0.0)
    template = T.TrainState(step=jnp.int32(0), params=variables["params"],
                            batch_stats=variables["batch_stats"],
                            opt_state=tx.init(variables["params"]))
    state = load_checkpoint(args.checkpoint, template)
    print(f"restored {args.checkpoint} (step {int(state.step)})")

    miou = MeanIoU(cfg.data.num_classes, cfg.data.ignore_label)
    overflow_totals = np.zeros(len(caps), np.int64)
    overflow_scans = 0

    def audit(batch):
        # surface silent on-device capacity clamping (unique_coords drops
        # voxels past each level's capacity without warning)
        nonlocal overflow_scans
        ov = audit_capacities(
            np.asarray(batch["coords"][:int(batch["nnz"])]), caps)
        if any(ov):
            overflow_totals[:] += ov
            overflow_scans += 1

    n = min(len(ds), args.limit) if args.limit else len(ds)
    for i in range(n):
        # rotation-voting TTA: average point-level softmax over N
        # z-rotations of the input cloud (reference seg use_tta /
        # set_angle voting path)
        if args.tta > 1 and hasattr(ds, "files"):
            raw = np.fromfile(ds.files[i], np.float32).reshape(-1, 4)
            lf = ds.files[i].replace("velodyne", "labels").replace(
                ".bin", ".label")
            if os.path.exists(lf):
                labels_raw = ds.label_map[np.fromfile(lf, np.int32) & 0xFFFF]
            else:
                labels_raw = np.zeros(len(raw), np.int64)
            votes = None
            from link_tpu.data.semantic_kitti import process_scan
            for v in range(args.tta):
                theta = 2 * np.pi * v / args.tta
                rot = np.array([[np.cos(theta), np.sin(theta), 0],
                                [-np.sin(theta), np.cos(theta), 0],
                                [0, 0, 1]], np.float32)
                pts = raw.copy()
                pts[:, :3] = pts[:, :3] @ rot
                scan = {}
                s = process_scan(pts, labels_raw, cfg.dataset.voxel_size,
                                 10 ** 9, False)
                s["file_name"] = ds.files[i]
                b = collate_scans([s], caps[0])
                audit(b)
                logits = forward(state.params, state.batch_stats,
                                 jnp.asarray(b["feats"]),
                                 jnp.asarray(b["coords"]),
                                 jnp.asarray(b["nnz"]))
                prob = np.asarray(jax.nn.softmax(logits, -1))[:int(b["nnz"])]
                pv = prob[s["inverse_map"]]
                votes = pv if votes is None else votes + pv
            scan = {"point_labels": labels_raw, "file_name": ds.files[i]}
            point_preds = votes.argmax(-1)
        else:
            scan = ds[i]
            b = collate_scans([scan], caps[0])
            audit(b)
            logits = forward(state.params, state.batch_stats,
                             jnp.asarray(b["feats"]), jnp.asarray(b["coords"]),
                             jnp.asarray(b["nnz"]))
            preds = np.asarray(jnp.argmax(logits, -1))[:int(b["nnz"])]
            point_preds = preds[scan["inverse_map"]]

        if args.split == "val":
            labels = scan["point_labels"]
            from link_tpu.train.metrics import iou_counters
            c = iou_counters(jnp.asarray(point_preds), jnp.asarray(labels),
                             jnp.ones(len(labels), bool),
                             cfg.data.num_classes, cfg.data.ignore_label)
            miou.update(np.asarray(c))
        if args.save_labels:
            os.makedirs(args.save_labels, exist_ok=True)
            lut = np.zeros(20, np.uint32)
            for k, v in INVERSE_LABEL_MAP.items():
                lut[k] = v
            out = lut[point_preds].astype(np.uint32)
            name = os.path.basename(scan["file_name"]).replace(".bin",
                                                               ".label")
            out.tofile(os.path.join(args.save_labels, name))
        if (i + 1) % 50 == 0:
            print(f"[{i+1}/{n}] running mIoU={miou.compute()*100:.2f}",
                  flush=True)

    if overflow_scans:
        print(f"WARNING: {overflow_scans}/{n} scans overflowed the "
              f"capacity schedule {tuple(caps)}; dropped voxels per level: "
              f"{overflow_totals.tolist()} — raise capacities or accept "
              f"the clamp (predictions for dropped voxels fall back to the "
              f"ignore class).")
    if args.split == "val":
        print(f"point-level val mIoU: {miou.compute()*100:.2f}")
        for ci, iou in enumerate(miou.per_class()):
            print(f"  class {ci}: {iou*100:.2f}")


if __name__ == "__main__":
    main()
