#!/usr/bin/env python
"""Capture a device trace of the bench forward and aggregate op time by
source file:line (the workflow every round-2/3 optimization came from).

Usage: python tools/profile_fwd.py [--det] [--train] [--top 40]
Writes the raw trace under /tmp/jax-trace* and prints the aggregation.
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def aggregate(trace_dir: str, top: int):
    """Parse the .trace.json.gz and sum device-lane durations by the op's
    `source` metadata."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace under {trace_dir}"
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # device lanes: pid names containing "TPU" and thread named XLA Ops
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_src = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e["pid"], "")
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if "XLA Op" not in tname and "Steps" in tname:
            continue
        if "XLA Op" not in tname:
            continue
        dur = e.get("dur", 0) / 1e3                     # us -> ms
        args = e.get("args", {})
        src = args.get("source", "?")
        name = e.get("name", "?")
        by_src[src] += dur
        key = name.split(".")[0].rstrip("0123456789")
        by_op[key] += dur
        total += dur
    print(f"\n== total device op time: {total:.1f} ms (all captured steps)")
    print(f"== by source (top {top}):")
    for src, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:9.2f} ms  {src}")
    print(f"== by op family (top {top}):")
    for op, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:9.2f} ms  {op}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--det", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--trace-dir", default="/tmp/jax-trace")
    ap.add_argument("--dense-from", type=int, default=None,
                    help="det hybrid dense backbone level")
    ap.add_argument("--dtype", default=None,
                    help="det model compute dtype override")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.det and args.train:
        # the det train step at the real 160k-voxel cap (one-cycle Adam,
        # EAGER_INVERT gather backward)
        from link_tpu.data import det_pipeline as dp
        from link_tpu.data.nuscenes import SyntheticNuScenes
        from link_tpu.models.voxelnet import VoxelNet
        from link_tpu.train import det_trainer as DT
        from link_tpu.train import schedules
        from link_tpu.train.trainer import TrainState

        cap = 163840
        ds = SyntheticNuScenes(length=2, mode="train", seed=0,
                               max_voxels=160000)
        batches = [dp.collate_det([ds[i]], cap) for i in range(2)]
        model = VoxelNet(num_input_features=5, batch_size=1,
                         grid_shape=(1440, 1440, 40),
                         capacities=(cap, cap // 2, cap // 4, cap // 8),
                         dense_from_level=args.dense_from,
                         dtype=args.dtype or "float32")
        b0 = batches[0]
        variables = jax.jit(model.init, static_argnums=5)(
            jax.random.PRNGKey(0), jnp.asarray(b0["voxels"]),
            jnp.asarray(b0["coords"]), jnp.asarray(b0["num_points"]),
            jnp.asarray(b0["nnz"]), False)
        lr_fn, mom_fn = schedules.one_cycle(1e-3, 1000)
        init_fn, step = DT.make_det_train_step(model, lr_fn, mom_fn,
                                               mesh=None)
        state = TrainState(step=jnp.int32(0), params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=init_fn(variables["params"]))

        def gb(b):
            g = {k: jnp.asarray(b[k])[None]
                 for k in ("voxels", "coords", "num_points", "nnz")}
            for key in ("hm", "anno_box", "ind", "mask", "cat"):
                g[key] = [jnp.asarray(v)[None] for v in b[key]]
            return g

        gbatches = [gb(b) for b in batches]
        t0 = time.perf_counter()
        state, m = step(state, gbatches[0])
        float(np.asarray(m["loss"]))
        print(f"# det-train compile+first: {time.perf_counter() - t0:.1f}s",
              flush=True)
        for s in (1, 2):
            t0 = time.perf_counter()
            state, m = step(state, gbatches[s % 2])
            float(np.asarray(m["loss"]))
            print(f"# steady: {time.perf_counter() - t0:.3f} s/step",
                  flush=True)
        jax.profiler.start_trace(args.trace_dir)
        state, m = step(state, gbatches[1])
        float(np.asarray(m["loss"]))
        jax.profiler.stop_trace()
        aggregate(args.trace_dir, args.top)
        return

    if args.det:
        # det INFERENCE at the real 160k-voxel cap: forward + on-device
        # decode, traced as ONE unwrapped call so every op keeps its
        # source attribution (a fori_loop wrapper would bundle the whole
        # body into a single anonymous `while` op in the trace)
        from link_tpu.data import det_pipeline as dp
        from link_tpu.data.nuscenes import SyntheticNuScenes
        from link_tpu.models.center_head import decode_boxes
        from link_tpu.models.voxelnet import VoxelNet

        cap = 163840
        ds = SyntheticNuScenes(length=2, mode="val", seed=0,
                               max_voxels=160000)
        batches = [dp.collate_det([ds[i]], cap) for i in range(2)]
        model = VoxelNet(num_input_features=5, batch_size=1,
                         grid_shape=(1440, 1440, 40),
                         capacities=(cap, cap // 2, cap // 4, cap // 8),
                         dense_from_level=args.dense_from,
                         dtype=args.dtype or "float32")
        num_classes = [len(t) for t in model.tasks]
        b0 = batches[0]
        variables = jax.jit(model.init, static_argnums=5)(
            jax.random.PRNGKey(0), jnp.asarray(b0["voxels"]),
            jnp.asarray(b0["coords"]), jnp.asarray(b0["num_points"]),
            jnp.asarray(b0["nnz"]), False)
        test_cfg = dict(
            post_center_limit_range=[-61.2, -61.2, -10., 61.2, 61.2, 10.],
            score_threshold=0.1, pc_range=[-54, -54],
            voxel_size=[0.075, 0.075], out_size_factor=8)

        @jax.jit
        def det_fwd(seed, variables, voxels, coords, npts, nnz):
            preds = model.apply(variables, voxels, coords, npts, nnz,
                                False)
            outs = decode_boxes(preds, test_cfg, num_classes)
            return sum(jnp.sum(sc) for _, sc, _, _ in outs) + 1e-9 * seed

        dargs = [[jnp.asarray(b[k]) for b in batches]
                 for k in ("voxels", "coords", "num_points", "nnz")]
        t0 = time.perf_counter()
        float(np.asarray(det_fwd(jnp.float32(0), variables,
                                 *[a[0] for a in dargs])))
        print(f"# compile+first: {time.perf_counter() - t0:.1f}s",
              flush=True)
        for s in (1, 2):
            t0 = time.perf_counter()
            float(np.asarray(det_fwd(jnp.float32(s), variables,
                                     *[a[s % 2] for a in dargs])))
            print(f"# steady: {(time.perf_counter() - t0) * 1e3:.1f} "
                  "ms/frame (host dispatch incl. tunnel)", flush=True)
        jax.profiler.start_trace(args.trace_dir)
        float(np.asarray(det_fwd(jnp.float32(3), variables,
                                 *[a[1] for a in dargs])))
        jax.profiler.stop_trace()
        aggregate(args.trace_dir, args.top)
        return

    from link_tpu.data.collate import collate_scans
    from link_tpu.data.semantic_kitti import SyntheticSemanticKITTI
    from link_tpu.models.linkunet import DEFAULT_CAPACITIES, ELKUNet
    from link_tpu.sparse.tensor import make_sparse_tensor

    from link_tpu.data.semantic_kitti import grid_extent

    caps = DEFAULT_CAPACITIES
    ds = SyntheticSemanticKITTI(length=2, num_points=80000,
                                n_raw_points=120000, split="train")
    ext = grid_extent(0.05, batch_size=1)
    batches = [collate_scans([ds[i]], caps[0], grid_extent=ext)
               for i in range(2)]
    model = ELKUNet(num_classes=20, cr=1.0, capacities=caps,
                    dtype="bfloat16", grid_extent=ext)
    b0 = batches[0]
    st0 = make_sparse_tensor(b0["feats"], b0["coords"], nnz=b0["nnz"],
                             base_sorted=True)
    params = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), st0, False)

    feats = jnp.stack([jnp.asarray(b["feats"]) for b in batches])
    coords = jnp.stack([jnp.asarray(b["coords"]) for b in batches])
    nnzs = jnp.stack([jnp.asarray(b["nnz"]) for b in batches])

    if args.train:
        # profile the REAL production step (remat model + plan-saving
        # policy + batch_stats + SGD), not an ad-hoc loss
        from link_tpu.train import trainer as T

        tmodel = ELKUNet(num_classes=20, cr=1.0, capacities=caps,
                         dtype="bfloat16", remat=True, grid_extent=ext)
        tvars = jax.jit(tmodel.init, static_argnums=2)(
            jax.random.PRNGKey(0), st0, False)
        tx = T.make_sgd(lambda _: 0.01)
        state = T.TrainState(step=jnp.int32(0), params=tvars["params"],
                             batch_stats=tvars["batch_stats"],
                             opt_state=tx.init(tvars["params"]))

        @jax.jit
        def step(seed, state, feats, coords, nnzs):
            batch = dict(feats=feats[0], coords=coords[0], nnz=nnzs[0],
                         labels=((jnp.abs(jnp.sum(coords[0], -1)) + seed)
                                 % 19 + 1).astype(jnp.int32))
            return T.seg_train_step(tmodel, tx, state, batch)

        t0 = time.perf_counter()
        s1, m = step(jnp.int32(0), state, feats, coords, nnzs)
        float(np.asarray(m["loss"]))
        print(f"# compile+first: {time.perf_counter() - t0:.1f}s",
              flush=True)
        for s in (1, 2):
            t0 = time.perf_counter()
            s1, m = step(jnp.int32(s), s1, feats, coords, nnzs)
            float(np.asarray(m["loss"]))
            print(f"# steady: {time.perf_counter() - t0:.3f} s/step "
                  "(host-dispatch incl. tunnel)", flush=True)
        jax.profiler.start_trace(args.trace_dir)
        s1, m = step(jnp.int32(3), s1, feats, coords, nnzs)
        float(np.asarray(m["loss"]))
        jax.profiler.stop_trace()
        aggregate(args.trace_dir, args.top)
        return

    @jax.jit
    def fwd(seed, params, feats, coords, nnzs):
        def body(i, acc):
            k = i % 2
            st = make_sparse_tensor(feats[k], coords[k], nnz=nnzs[k],
                                    base_sorted=True)
            out = model.apply(params, st, False)
            return acc + jnp.sum(out) * (1.0 + i + seed) * 1e-9

        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(np.asarray(fwd(jnp.int32(0), params, feats, coords, nnzs)))
    print(f"# compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    for s in (1, 2):
        t0 = time.perf_counter()
        float(np.asarray(fwd(jnp.int32(s), params, feats, coords, nnzs)))
        print(f"# steady: {(time.perf_counter() - t0) / args.iters * 1e3:.1f}"
              f" ms/scan", flush=True)
    jax.profiler.start_trace(args.trace_dir)
    float(np.asarray(fwd(jnp.int32(3), params, feats, coords, nnzs)))
    jax.profiler.stop_trace()
    aggregate(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
