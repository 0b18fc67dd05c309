#!/usr/bin/env python
"""Segmentation training entry point.

TPU-native replacement for segmentation/train.py:31-184: config cascade,
data-parallel mesh over all devices, per-epoch training with per-iteration
cosine-warmup LR, val mIoU each epoch, rotating + best checkpoints.

Usage:
  python tools/seg_train.py configs/semantic_kitti/linkunet/default.yaml \
      [--run-dir runs/...] [--synthetic] [key=value ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="use the synthetic dataset (no real data needed)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator address host:port "
                         "(or set JAX_COORDINATOR_ADDRESS); reference "
                         "equivalent: torchpack MPI launch, train.py:41-45")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--resume", nargs="?", const="auto", default=None,
                    help="checkpoint path, or bare/`auto` to continue from "
                         "the run dir's latest.msgpack if one exists "
                         "(reference: segmentation/train.py:165-184)")
    ap.add_argument("--stop-after-epoch", type=int, default=None,
                    help="exit cleanly after checkpointing this epoch; the "
                         "LR schedule still spans the full num_epochs, so a "
                         "later --resume continues the SAME recipe "
                         "(preemption simulation / staged training)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from link_tpu.parallel import multihost as mh
    mh.maybe_initialize(args.coordinator, args.num_processes,
                        args.process_id)
    is_main = jax.process_index() == 0

    from link_tpu.utils.config import load_config
    from link_tpu.models import builder
    from link_tpu.data.semantic_kitti import (SemanticKITTI,
                                              SyntheticSemanticKITTI)
    from link_tpu.data.collate import collate_scans
    from link_tpu.data.loader import PrefetchLoader, epoch_indices, shard_indices
    from link_tpu.sparse.tensor import make_sparse_tensor
    from link_tpu.train import trainer as T
    from link_tpu.train.checkpoint import save_checkpoint
    from link_tpu.train.metrics import MeanIoU

    cfg = load_config(args.config, args.overrides)
    if args.epochs:
        cfg.num_epochs = args.epochs

    devices = jax.devices()          # GLOBAL across processes
    ndev = len(devices)
    mesh = T.make_data_mesh(devices)
    # this process's device positions within the global mesh order
    local_pos = [i for i, d in enumerate(mesh.devices.flat)
                 if d.process_index == jax.process_index()]
    world_batch = cfg.batch_size * ndev
    if is_main:
        print(f"devices={ndev} (local {len(local_pos)}) "
              f"processes={jax.process_count()} world_batch={world_batch}")

    if args.synthetic or not os.path.isdir(cfg.dataset.root):
        print("using synthetic dataset")
        train_ds = SyntheticSemanticKITTI(
            length=cfg.dataset.get("synthetic_length", 64),
            voxel_size=cfg.dataset.voxel_size,
            num_points=cfg.dataset.num_points, split="train")
        val_ds = SyntheticSemanticKITTI(
            length=8, voxel_size=cfg.dataset.voxel_size,
            num_points=cfg.dataset.num_points, split="train")
        cfg.data.training_size = len(train_ds)
    else:
        train_ds = SemanticKITTI(cfg.dataset.root, "train",
                                 cfg.dataset.voxel_size,
                                 cfg.dataset.num_points)
        val_ds = SemanticKITTI(cfg.dataset.root, "val",
                               cfg.dataset.voxel_size,
                               cfg.dataset.num_points)

    caps = tuple(cfg.model.get("capacities"))
    cap0 = caps[0] * cfg.batch_size
    caps = tuple(c * cfg.batch_size for c in caps)
    model = builder.make_model(cfg, capacities=caps, remat=True,
                               dtype=cfg.model.get("dtype", "float32"))

    lr = builder.make_lr_schedule(cfg, world_size=ndev)
    tx = builder.make_optimizer(cfg, lr)

    # init from one device-batch
    def make_dev_batch(ds, idxs, rng=None):
        scans = [ds[int(i)] if rng is None else ds.__getitem__(int(i), rng)
                 for i in idxs]
        return collate_scans(scans, cap0,
                             ignore_label=cfg.data.ignore_label)

    b0 = make_dev_batch(train_ds, range(cfg.batch_size))
    st = make_sparse_tensor(b0["feats"], b0["coords"], nnz=b0["nnz"], base_sorted=True)
    variables = model.init(jax.random.PRNGKey(cfg.train.seed), st, False)
    state = T.TrainState(step=jnp.int32(0), params=variables["params"],
                         batch_stats=variables["batch_stats"],
                         opt_state=tx.init(variables["params"]))
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"params: {nparams/1e6:.2f}M")

    train_step = T.make_dp_train_step(
        model, tx, mesh, ignore_label=cfg.criterion.ignore_index)
    eval_step = T.make_dp_eval_step(model, mesh, cfg.data.num_classes,
                                    cfg.data.ignore_label)

    run_dir = args.run_dir or os.path.join(
        "runs", os.path.splitext(os.path.basename(args.config))[0]
        + time.strftime("-%m%d%H%M"))

    start_epoch = 1
    if args.resume:
        from link_tpu.train.checkpoint import (checkpoint_meta, find_resume,
                                               load_checkpoint)
        rp = find_resume(run_dir) if args.resume == "auto" else args.resume
        if rp:
            # full TrainState restore: params, batch_stats, optimizer state
            # (incl. the optax schedule step count, so LR continues exactly)
            state = load_checkpoint(rp, state)
            start_epoch = int(checkpoint_meta(rp).get("epoch", 0)) + 1
            print(f"resumed {rp} -> starting at epoch {start_epoch}")
        elif args.resume != "auto":
            raise FileNotFoundError(args.resume)

    from link_tpu.utils.logging import (MetricsLogger, TensorboardLogger,
                                        save_runtime_code)
    if is_main:    # rank-0 logging/checkpoints, reference train.py:129-139
        os.makedirs(run_dir, exist_ok=True)
        save_runtime_code(run_dir)    # reference saveRuntimeCode semantics
        jlog = MetricsLogger(run_dir, interval=1)
        tb = TensorboardLogger(run_dir)

    seed = cfg.train.seed
    steps_per_epoch = max(1, len(train_ds) // world_batch)
    for epoch in range(start_epoch, cfg.num_epochs + 1):
        idx = epoch_indices(len(train_ds), epoch, seed)
        shards = shard_indices(idx[:steps_per_epoch * world_batch], ndev)

        def make_batch(step, shards=shards, epoch=epoch):
            # build only THIS process's device rows; the global array is
            # assembled from per-process shards (multihost.py)
            per_dev = []
            for d in local_pos:
                rng = np.random.default_rng(seed * 1000 + epoch * 100 + step * ndev + d)
                sl = shards[d][step * cfg.batch_size:(step + 1) * cfg.batch_size]
                per_dev.append(make_dev_batch(train_ds, sl, rng))
            return mh.make_global_batch(mesh, per_dev)

        t_ep = time.time()
        losses = []
        for gb in PrefetchLoader(make_batch, steps_per_epoch):
            state, metrics = train_step(state, gb)
            losses.append(metrics["loss"])
        loss = float(np.mean([np.asarray(l) for l in losses]))
        dt = time.time() - t_ep
        if is_main:
            print(f"epoch {epoch}: loss={loss:.4f} "
                  f"({steps_per_epoch * world_batch / dt:.2f} scans/s)",
                  flush=True)

        # validation (voxel-level mIoU)
        miou_metric = MeanIoU(cfg.data.num_classes, cfg.data.ignore_label)
        n_val_steps = max(1, len(val_ds) // world_batch)
        for step in range(n_val_steps):
            per_dev = []
            for d in local_pos:
                base = (step * ndev + d) * cfg.batch_size
                sl = [(base + k) % len(val_ds) for k in range(cfg.batch_size)]
                per_dev.append(make_dev_batch(val_ds, sl))
            gb = mh.make_global_batch(mesh, per_dev)
            _, counters = eval_step(state, gb)
            # counters are psum'd over the GLOBAL mesh inside the step, so
            # they already include every process's shard
            miou_metric.update(np.asarray(counters))
        miou = miou_metric.compute()
        if is_main:
            print(f"epoch {epoch}: val mIoU (voxel) = {miou*100:.2f}",
                  flush=True)
            scalars = {"loss/train": loss, "iou/val": float(miou),
                       "scans_per_sec": steps_per_epoch * world_batch / dt}
            jlog.log({"epoch": epoch, **scalars})
            tb.scalars(scalars, epoch)
            tb.flush()
            save_checkpoint(run_dir, state, epoch, metric=miou,
                            meta={"config": args.config})
        if args.stop_after_epoch and epoch >= args.stop_after_epoch:
            if is_main:
                print(f"stopping after epoch {epoch} (--stop-after-epoch)",
                      flush=True)
            break


if __name__ == "__main__":
    main()
