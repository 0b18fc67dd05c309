#!/usr/bin/env python
"""Detection training entry point (reference: detection/tools/train.py).

One-cycle Adam (lr_max 1e-3, moms 0.95->0.85), grad clip 35, CBGS, GT-AUG
(when a gt database exists), 20 epochs with the GT-AUG "fading" switch at
--no-aug-from (reference GET_STARTED: disable GT-AUG for the last 5
epochs by restarting; here it's a flag).

Usage:
  python tools/det_train.py [--synthetic] [--info-path ...] [--epochs N]
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
    ap.add_argument("--config", default=None,
                    help="reference-style py config (configs/nusc/...); "
                         "sets recipe hyperparameters")
    ap.add_argument("--info-path", default="data/nuScenes/infos_train_10sweeps_withvelo_filter_True.pkl")
    ap.add_argument("--root-path", default="data/nuScenes")
    ap.add_argument("--db-info-path", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--samples-per-device", type=int, default=2)
    ap.add_argument("--no-aug-from", type=int, default=16,
                    help="epoch from which GT-AUG is disabled (fading)")
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--voxel-capacity", type=int, default=163840)
    ap.add_argument("--grid", type=int, nargs=3, default=[1440, 1440, 40])
    ap.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator address host:port "
                         "(or set JAX_COORDINATOR_ADDRESS); reference "
                         "equivalent: NCCL env:// init, tools/train.py:87")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--dense-from-level", type=int, default=None,
                    help="hybrid dense backbone: levels >= L run masked "
                         "dense convs on the MXU (scn.py dense_from_level)")
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--resume", nargs="?", const="auto", default=None,
                    help="checkpoint path, or bare/`auto` to continue from "
                         "the run dir's latest.msgpack if one exists "
                         "(reference: tools/train.py:77 + trainer.resume, "
                         "trainer.py:497-510; the GET_STARTED fading recipe "
                         "is a resume at epoch 16 with GT-AUG off)")
    ap.add_argument("--stop-after-epoch", type=int, default=None,
                    help="exit cleanly after checkpointing this epoch; the "
                         "one-cycle schedule still spans the full --epochs, "
                         "so a later --resume continues the SAME recipe")
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

    from link_tpu.data import det_pipeline as dp
    from link_tpu.data.nuscenes import NuScenesDataset, SyntheticNuScenes
    from link_tpu.data.loader import PrefetchLoader, epoch_indices, shard_indices
    from link_tpu.models.voxelnet import VoxelNet
    from link_tpu.train import trainer as T
    from link_tpu.train import det_trainer as DT
    from link_tpu.train import schedules
    from link_tpu.train.checkpoint import save_checkpoint

    lr_max, moms, div, pct = 1e-3, (0.95, 0.85), 10.0, 0.4
    wd, clip = 0.01, 35.0
    if args.config:
        from link_tpu.utils.config import load_py_config
        cfg = load_py_config(args.config)
        lr_max = cfg.lr_config.lr_max
        moms = tuple(cfg.lr_config.moms)
        div = cfg.lr_config.div_factor
        pct = cfg.lr_config.pct_start
        wd = cfg.optimizer.wd
        clip = cfg.optimizer_config.grad_clip.max_norm
        args.epochs = cfg.total_epochs
        args.info_path = cfg.data.train_anno

    devices = jax.devices()          # GLOBAL across processes
    ndev = len(devices)
    mesh = T.make_data_mesh(devices)
    local_pos = [i for i, d in enumerate(mesh.devices.flat)
                 if d.process_index == jax.process_index()]
    spd = args.samples_per_device

    db_sampler = None
    if args.db_info_path and os.path.exists(args.db_info_path):
        from link_tpu.data.gt_aug import DataBaseSampler
        db_sampler = DataBaseSampler(args.db_info_path, args.root_path)

    if args.synthetic or not os.path.exists(args.info_path):
        print("using synthetic nuScenes")
        train_ds = SyntheticNuScenes(length=max(8, ndev * spd), mode="train",
                                     max_voxels=args.voxel_capacity)
        grid = (1440, 1440, 40)
    else:
        train_ds = NuScenesDataset(args.info_path, args.root_path,
                                   mode="train", db_sampler=db_sampler)
        grid = tuple(args.grid)

    cap = args.voxel_capacity * spd
    dcn = bool(getattr(cfg.model.bbox_head, "dcn_head", False)) \
        if args.config else False
    model = VoxelNet(num_input_features=5, batch_size=spd, grid_shape=grid,
                     capacities=tuple(
                         max(1024, cap // f) for f in (1, 2, 4, 8)),
                     dcn_head=dcn,
                     dense_from_level=args.dense_from_level)

    total_steps = args.epochs * max(1, len(train_ds) // (ndev * spd))
    lr_fn, mom_fn = schedules.one_cycle(lr_max, total_steps, moms=moms,
                                        div_factor=div, pct_start=pct)
    init_fn, train_step = DT.make_det_train_step(model, lr_fn, mom_fn, mesh,
                                                 weight_decay=wd,
                                                 grad_clip=clip)

    def make_dev_batch(idxs):
        return dp.collate_det([train_ds[int(i)] for i in idxs], cap)

    b0 = make_dev_batch(range(spd))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(b0["voxels"]), jnp.asarray(b0["coords"]),
                           jnp.asarray(b0["num_points"]),
                           jnp.asarray(b0["nnz"]), False)
    state = T.TrainState(step=jnp.int32(0), params=variables["params"],
                         batch_stats=variables["batch_stats"],
                         opt_state=init_fn(variables["params"]))
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"params: {nparams/1e6:.2f}M, total_steps={total_steps}")

    run_dir = args.run_dir or os.path.join("runs", "det-" +
                                           time.strftime("%m%d%H%M"))

    start_epoch = 1
    if args.resume:
        from link_tpu.train.checkpoint import (checkpoint_meta, find_resume,
                                               load_checkpoint)
        rp = find_resume(run_dir) if args.resume == "auto" else args.resume
        if rp:
            state = load_checkpoint(rp, state)   # incl. one-cycle position
            start_epoch = int(checkpoint_meta(rp).get("epoch", 0)) + 1
            print(f"resumed {rp} -> starting at epoch {start_epoch}")
        elif args.resume != "auto":
            raise FileNotFoundError(args.resume)

    from link_tpu.utils.logging import (MetricsLogger, TensorboardLogger,
                                        save_runtime_code)
    if is_main:    # rank-0 logging/checkpoints (reference trainer hooks)
        os.makedirs(run_dir, exist_ok=True)
        save_runtime_code(run_dir)    # reference rsync code backup
        jlog = MetricsLogger(run_dir, interval=1)
        tb = TensorboardLogger(run_dir)

    steps_per_epoch = max(1, len(train_ds) // (ndev * spd))
    for epoch in range(start_epoch, args.epochs + 1):
        # >= (not ==) so a run resumed past the fading epoch stays faded
        if epoch >= args.no_aug_from and hasattr(train_ds, "db_sampler"):
            train_ds.db_sampler = None  # GT-AUG fading
        idx = epoch_indices(len(train_ds), epoch)
        shards = shard_indices(idx[:steps_per_epoch * ndev * spd], ndev)

        def make_batch(step, shards=shards):
            # only THIS process's device rows; global array assembled from
            # per-process shards (multihost.make_global_batch)
            per_dev = [make_dev_batch(shards[d][step * spd:(step + 1) * spd])
                       for d in local_pos]
            return mh.make_global_batch(mesh, per_dev)

        t0 = time.time()
        losses = []
        for gb in PrefetchLoader(make_batch, steps_per_epoch):
            state, metrics = train_step(state, gb)
            losses.append(metrics["loss"])
        loss = float(np.mean([np.asarray(l) for l in losses]))
        rate = steps_per_epoch * ndev * spd / (time.time() - t0)
        if is_main:
            print(f"epoch {epoch}: loss={loss:.4f} ({rate:.2f} samples/s)",
                  flush=True)
            scalars = {"loss/train": loss, "samples_per_sec": rate}
            jlog.log({"epoch": epoch, **scalars})
            tb.scalars(scalars, epoch)
            tb.flush()
            save_checkpoint(run_dir, state, epoch)
        if args.stop_after_epoch and epoch >= args.stop_after_epoch:
            if is_main:
                print(f"stopping after epoch {epoch} (--stop-after-epoch)",
                      flush=True)
            break


if __name__ == "__main__":
    main()
