"""Benchmark: ELKUNet (LinK U-Net, cos_x:(2x3)^3) single-chip inference throughput.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no latency numbers (SURVEY.md §6);
its ad-hoc probe is dist_test.py's middle-third timing on one GPU. We
benchmark the same quantity — full-model forward scans/sec at batch 1,
80k-voxel SemanticKITTI-shaped scans — and compare against an estimated
reference GPU throughput of 10 scans/sec (~100 ms/scan for LinK-UNet
cr1.0 at 0.05 m on the reference's RTX-3090-class hardware; the paper's
headline latency scale). vs_baseline = ours / 10.

The timing loop runs on-device via lax.fori_loop: the TPU in this
environment sits behind a tunnel with ~100ms+ per-dispatch latency, so
host-side per-scan dispatch would measure the tunnel, not the chip.
"""

import json
import os
import time

# Persistent compilation cache: remote compile through the tunnel is slow
# (minutes for large modules); cache makes repeat runs start instantly.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import numpy as np

# Measured anchor under this estimate: tools/bench_reference.py runs the
# actual torch reference on CPU over these exact scans (0.163 scans/s,
# 1 thread) => the 10 scans/s GPU figure assumes ~61x CPU->GPU, in family
# for a 3090 on a gather+GEMM workload. Details: BASELINE.md "Measured
# CPU anchor".
REFERENCE_SCANS_PER_SEC = 10.0
# Reference det throughput estimate: CenterPoint-0.075voxel runs ~11 FPS
# on the reference's RTX-3090-class GPU; LinK's ELKv3 backbone adds the
# large-kernel branches => ~8 FPS (the repo publishes no det latency —
# SURVEY.md §6; dist_test.py --speed_test is the ad-hoc probe).
REFERENCE_DET_FRAMES_PER_SEC = 8.0


def emit_sections(jax, metric, loop_call, n_iters):
    """Capture ONE traced run of the already-compiled bench loop and emit
    a per-source device-time JSON line (ms/iteration, top entries) — the
    auditable per-section ledger VERDICT r4 weak-#7 asked for in driver
    artifacts. Never fatal; skipped with BENCH_SECTIONS=0."""
    if os.environ.get("BENCH_SECTIONS", "1") == "0":
        return
    try:
        import glob
        import shutil
        import tempfile

        import numpy as np
        from link_tpu.utils.profiling import trace_device_ms_by_source

        tdir = tempfile.mkdtemp(prefix="bench-trace-")
        try:
            jax.profiler.start_trace(tdir)
            loop_call()
            jax.profiler.stop_trace()
            by_src = trace_device_ms_by_source(tdir)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
        # the fori_loop wrapper op is attributed to THIS file and spans
        # (hence double-counts) its body — drop bench.py sources
        here = os.path.basename(__file__)
        rows = [(src, ms) for src, ms in by_src.items()
                if here not in src]
        rows.sort(key=lambda kv: -kv[1])
        total = sum(ms for _, ms in rows)
        top = {os.sep.join(src.split(os.sep)[-2:]): round(ms / n_iters, 2)
               for src, ms in rows[:12]}
        print(json.dumps({
            "metric": metric + "_sections",
            "unit": "ms/iter (device)",
            "total": round(total / n_iters, 2),
            "top": top,
        }), flush=True)
    except Exception as e:                     # pragma: no cover
        print(f"# sections capture failed ({metric}): {e!r}", flush=True)


def bench_det(jax, jnp):
    """nuScenes VoxelNet (SpMiddleResNetFHDELKv3 + RPN + CenterHead)
    single-frame inference: forward + on-device box decode at the real
    160k-voxel val capacity (reference probe: dist_test.py:155-191)."""
    from link_tpu.models.voxelnet import VoxelNet
    from link_tpu.models.center_head import decode_boxes
    from link_tpu.data.nuscenes import SyntheticNuScenes
    from link_tpu.data import det_pipeline as dp

    cap = 163840
    n_frames = 2
    ds = SyntheticNuScenes(length=n_frames, mode="val", seed=0,
                           max_voxels=160000)
    batches = [dp.collate_det([ds[i]], cap) for i in range(n_frames)]
    # dtype defaults bf16 (round 5): the post-overhaul re-A/B measured
    # +4% (6.891 vs 6.627 fps, device 141.4 vs 151.9 ms — window
    # selects/VPU bandwidth halve; per-tap gathers byte-FLAT at 54.3 ms,
    # confirming per-ROW descriptor pricing below the 256 B plateau),
    # and the accuracy gate the headline was waiting on is in
    # tests/test_det_bf16.py (heatmap scores, decoded centers/dims/vel,
    # raw rot outputs, conditioned yaw — all within detection-facing
    # tolerances; box decode itself is pinned f32 inside decode_boxes).
    # BENCH_DET_DTYPE=float32 restores the reference-matching dtype
    # (round-3 measured bf16 FLAT pre-overhaul).
    # Hybrid dense backbone (scn.py dense_from_level): levels >= L run
    # masked dense convs on the MXU. Measured on the v5e at the 160k cap:
    # dense-from-2 f32 2.34 fps / dense-from-1 f32 1.05 fps vs fully
    # sparse 2.93 — the sparse cost is concentrated at levels 0-1 (row
    # counts halve per level), so converting levels >=2 removes only
    # ~45 ms of sparse work while adding ~95 ms of f32 dense convs.
    # Default stays fully sparse; BENCH_DENSE_FROM=L for A/B.
    dense_env = os.environ.get("BENCH_DENSE_FROM", "")
    dense_from = int(dense_env) if dense_env else None
    det_dtype = os.environ.get("BENCH_DET_DTYPE", "bfloat16")
    model = VoxelNet(num_input_features=5, batch_size=1,
                     grid_shape=(1440, 1440, 40),
                     capacities=(cap, cap // 2, cap // 4, cap // 8),
                     dense_from_level=dense_from, dtype=det_dtype)
    num_classes = [len(t) for t in model.tasks]
    b0 = batches[0]
    variables = jax.jit(model.init, static_argnums=5)(
        jax.random.PRNGKey(0), jnp.asarray(b0["voxels"]),
        jnp.asarray(b0["coords"]), jnp.asarray(b0["num_points"]),
        jnp.asarray(b0["nnz"]), False)

    voxels = jnp.stack([jnp.asarray(b["voxels"]) for b in batches])
    coords = jnp.stack([jnp.asarray(b["coords"]) for b in batches])
    npts = jnp.stack([jnp.asarray(b["num_points"]) for b in batches])
    nnzs = jnp.stack([jnp.asarray(b["nnz"]) for b in batches])
    test_cfg = dict(
        post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
        score_threshold=0.1, pc_range=[-54, -54],
        voxel_size=[0.075, 0.075], out_size_factor=8)
    n_iters = 8

    @jax.jit
    def loop(seed, variables, voxels, coords, npts, nnzs):
        def body(i, acc):
            k = i % n_frames
            preds = model.apply(variables, voxels[k], coords[k], npts[k],
                                nnzs[k], False)
            outs = decode_boxes(preds, test_cfg, num_classes)
            s = sum(jnp.sum(sc) for _, sc, _, _ in outs)
            return acc + s * (1.0 + i + seed) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(np.asarray(loop(jnp.int32(0), variables, voxels, coords, npts,
                          nnzs)))
    print(f"# det compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    times = []
    for s in (1, 2):
        t0 = time.perf_counter()
        float(np.asarray(loop(jnp.int32(s), variables, voxels, coords,
                              npts, nnzs)))
        times.append(time.perf_counter() - t0)
    fps = n_iters / min(times)
    print(json.dumps({
        "metric": "nuscenes_det_infer",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_DET_FRAMES_PER_SEC, 3),
    }), flush=True)
    emit_sections(jax, "nuscenes_det_infer",
                  lambda: float(np.asarray(loop(
                      jnp.int32(3), variables, voxels, coords, npts,
                      nnzs))), n_iters)

    if os.environ.get("BENCH_TRAIN", "1") != "0":
        tds = SyntheticNuScenes(length=2, mode="train", seed=0,
                                max_voxels=160000)
        tbatches = [dp.collate_det([tds[i]], cap) for i in range(2)]
        # det TRAINING stays f32 (reference-matching) regardless of the
        # inference headline dtype: the round-5 chip A/B measured bf16
        # det-train FLAT (1.804 vs 1.806 fps — the backward is the same
        # per-row-priced descriptor gathers as the forward, and the
        # inference win came from the window-select VPU slices, which
        # the train trace doesn't dominate on), so there is no perf case
        # for moving the train numerics off the validated f32 path.
        tmodel = model if det_dtype == "float32" else VoxelNet(
            num_input_features=5, batch_size=1, grid_shape=(1440, 1440, 40),
            capacities=(cap, cap // 2, cap // 4, cap // 8),
            dense_from_level=dense_from)
        bench_det_train(jax, jnp, tmodel, tbatches)


def bench_seg_train(jax, jnp, model_kwargs, batches, caps):
    """Seg training-step throughput (the training north-star; VERDICT r4
    #4 asked for this in driver artifacts): the REAL production step —
    remat model + plan-saving policy + batch_stats + SGD — looped
    on-device. Reference quantity: scans/s/chip during train (the
    reference's 4-GPU recipe trains ~2.2 scans/s/GPU at batch 2)."""
    import numpy as np
    from link_tpu.models.linkunet import ELKUNet
    from link_tpu.train import trainer as T

    model = ELKUNet(**dict(model_kwargs, remat=True))
    from link_tpu.sparse.tensor import make_sparse_tensor
    b0 = batches[0]
    st0 = make_sparse_tensor(b0["feats"], b0["coords"], nnz=b0["nnz"],
                             base_sorted=True)
    tvars = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), st0, False)
    tx = T.make_sgd(lambda _: 0.01)
    state = T.TrainState(step=jnp.int32(0), params=tvars["params"],
                         batch_stats=tvars["batch_stats"],
                         opt_state=tx.init(tvars["params"]))
    feats = jnp.stack([jnp.asarray(b["feats"]) for b in batches])
    coords = jnp.stack([jnp.asarray(b["coords"]) for b in batches])
    nnzs = jnp.stack([jnp.asarray(b["nnz"]) for b in batches])
    n_iters = 4
    n_scans = feats.shape[0]

    @jax.jit
    def loop(seed, state):
        def body(i, carry):
            st, acc = carry
            k = i % n_scans
            batch = dict(
                feats=feats[k], coords=coords[k], nnz=nnzs[k],
                labels=((jnp.abs(jnp.sum(coords[k], -1)) + seed + i)
                        % 19 + 1).astype(jnp.int32))
            st, m = T.seg_train_step(model, tx, st, batch)
            return st, acc + m["loss"]

        return jax.lax.fori_loop(0, n_iters, body, (state, jnp.float32(0)))

    t0 = time.perf_counter()
    st1, acc = loop(jnp.int32(0), state)
    float(np.asarray(acc))
    print(f"# seg-train compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    times = []
    for s in (1, 2):
        t0 = time.perf_counter()
        _, acc = loop(jnp.int32(s), st1)
        float(np.asarray(acc))
        times.append(time.perf_counter() - t0)
    sps = n_iters / min(times)
    print(json.dumps({
        "metric": "semantic_kitti_train",
        "value": round(sps, 3),
        "unit": "scans/sec/chip",
        "vs_baseline": round(sps / 2.2, 3),
    }), flush=True)


def bench_det_train(jax, jnp, model, batches):
    """Det training-step throughput: one-cycle Adam + EAGER_INVERT gather
    backward at the 160k cap. Reference quantity: frames/s/chip during
    train (the reference's 4-GPU recipe runs ~2 frames/s/GPU)."""
    import numpy as np
    from link_tpu.train import det_trainer as DT
    from link_tpu.train import schedules
    from link_tpu.train.trainer import TrainState

    b0 = batches[0]
    variables = jax.jit(model.init, static_argnums=5)(
        jax.random.PRNGKey(0), jnp.asarray(b0["voxels"]),
        jnp.asarray(b0["coords"]), jnp.asarray(b0["num_points"]),
        jnp.asarray(b0["nnz"]), False)
    lr_fn, mom_fn = schedules.one_cycle(1e-3, 1000)
    init_fn, step = DT.make_det_train_step(model, lr_fn, mom_fn, mesh=None)
    state = TrainState(step=jnp.int32(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=init_fn(variables["params"]))

    def gb(b):
        g = {k: jnp.asarray(b[k])[None]
             for k in ("voxels", "coords", "num_points", "nnz")}
        for key in ("hm", "anno_box", "ind", "mask", "cat"):
            g[key] = [jnp.asarray(v)[None] for v in b[key]]
        return g

    # stack the frames along a leading axis and index inside an on-device
    # fori_loop: per-step host dispatch would pay the ~100 ms tunnel RTT
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                     *[gb(b) for b in batches])
    n_frames = len(batches)
    n_iters = 4

    @jax.jit
    def loop(seed, state):
        def body(i, carry):
            st, acc = carry
            k = (i + seed) % n_frames
            batch = jax.tree_util.tree_map(lambda x: x[k], stacked)
            st, m = step(st, batch)
            return st, acc + m["loss"]

        return jax.lax.fori_loop(0, n_iters, body, (state, jnp.float32(0)))

    t0 = time.perf_counter()
    st1, acc = loop(jnp.int32(0), state)
    float(np.asarray(acc))
    print(f"# det-train compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    times = []
    for s in (1, 2):
        t0 = time.perf_counter()
        _, acc = loop(jnp.int32(s), st1)
        float(np.asarray(acc))
        times.append(time.perf_counter() - t0)
    fps = n_iters / min(times)
    print(json.dumps({
        "metric": "nuscenes_det_train",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 2.0, 3),
    }), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from link_tpu.models.linkunet import ELKUNet, DEFAULT_CAPACITIES
    from link_tpu.data.semantic_kitti import SyntheticSemanticKITTI
    from link_tpu.data.collate import collate_scans
    from link_tpu.sparse.tensor import make_sparse_tensor

    from link_tpu.data.semantic_kitti import grid_extent

    caps = DEFAULT_CAPACITIES
    n_scans = 4
    # split="train" applies the reference's 80k-voxel cap (val runs uncapped
    # in the reference and needs larger capacities).
    ds = SyntheticSemanticKITTI(length=n_scans, num_points=80000,
                                n_raw_points=120000, split="train")
    # static domain bound -> RankGrid joins at the coarse levels + ELK aux
    ext = grid_extent(0.05, batch_size=1)
    batches = [collate_scans([ds[i]], caps[0], grid_extent=ext)
               for i in range(n_scans)]

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    model = ELKUNet(num_classes=20, cr=1.0, capacities=caps, dtype=dtype,
                    grid_extent=ext)

    b0 = batches[0]
    st = make_sparse_tensor(b0["feats"], b0["coords"], nnz=b0["nnz"], base_sorted=True)
    t0 = time.perf_counter()
    params = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), st, False)
    jax.block_until_ready(params)
    print(f"# init: {time.perf_counter() - t0:.1f}s", flush=True)

    feats = jnp.stack([jnp.asarray(b["feats"]) for b in batches])
    coords = jnp.stack([jnp.asarray(b["coords"]) for b in batches])
    nnzs = jnp.stack([jnp.asarray(b["nnz"]) for b in batches])

    n_iters = 16

    # NB: the remote TPU relay in this environment memoizes identical
    # (executable, args) calls and its block_until_ready doesn't reliably
    # block — so every timed call gets a distinct seed and timing forces
    # host materialization.
    @jax.jit
    def bench_loop(seed, params, feats, coords, nnzs):
        def body(i, acc):
            k = i % n_scans
            st = make_sparse_tensor(feats[k], coords[k], nnz=nnzs[k], base_sorted=True)
            out = model.apply(params, st, False)
            return acc + jnp.sum(out) * (1.0 + i + seed) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(np.asarray(bench_loop(jnp.int32(0), params, feats, coords, nnzs)))
    print(f"# compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    times = []
    for s in (1, 2, 3):
        t0 = time.perf_counter()
        float(np.asarray(bench_loop(jnp.int32(s), params, feats, coords,
                                    nnzs)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    scans_per_sec = n_iters / dt
    emit_sections(jax, "semantic_kitti_elkunet_infer",
                  lambda: float(np.asarray(bench_loop(
                      jnp.int32(4), params, feats, coords, nnzs))),
                  n_iters)

    # secondary metric first (detection); the primary seg line stays LAST
    # so drivers that parse the final line keep tracking the same metric
    if os.environ.get("BENCH_DET", "1") != "0":
        try:
            bench_det(jax, jnp)
        except Exception as e:                        # never mask the seg line
            print(f"# det bench failed: {e!r}", flush=True)

    if os.environ.get("BENCH_TRAIN", "1") != "0":
        try:
            mk = dict(num_classes=20, cr=1.0, capacities=caps, dtype=dtype,
                      grid_extent=ext)
            bench_seg_train(jax, jnp, mk, batches, caps)
        except Exception as e:                        # never mask the seg line
            print(f"# seg-train bench failed: {e!r}", flush=True)

    print(json.dumps({
        "metric": "semantic_kitti_elkunet_infer",
        "dtype": dtype,
        "value": round(scans_per_sec, 3),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / REFERENCE_SCANS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
