"""Det bf16 TRAINING dynamics gate (round 5).

tests/test_det_bf16.py validates bf16 det *inference*; this is the
training-side twin. NOTE the round-5 chip A/B measured bf16 det-train
FLAT (1.804 vs 1.806 fps — the backward is the same per-row-priced
descriptor gathers as the forward), so bench.py keeps det TRAINING on
the reference-matching f32 path; this test documents that the bf16
option (`VoxelNet(dtype=)` through make_det_train_step) nonetheless
trains correctly. Mixed precision here means: params, optimizer state
and loss reductions stay f32 (the one-cycle Adam chain never sees
bf16), only the model COMPUTE dtype flips — the same split the seg
training bench uses.

A sharp per-step pin is impossible (the f32-vs-torch A/B in
test_det_convergence_ab.py already measured ~x1.5/step error growth
from 1e-6 seeds in f32 — bf16 injects ~1e-2 seeds), so the gate is
statistical over a short horizon:

- step-0 loss (pure forward on shared init) agrees to ~1%;
- the bf16 loss curve tracks f32 within a generous relative envelope;
- both curves end materially below their start (training works).

Reference semantics: the reference trains det in f32 (no AMP in
det3d/torchie/apis/train.py), so bf16 training is a TPU-side
substitution that must be shown not to break the loss dynamics.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow        # two full train-step CPU compiles

TASKS = None  # model default task table


def _make_batch(rng, i):
    from link_tpu.data import det_pipeline as dp

    pr = (-12, -12, -2, 12, 12, 2)
    pts = rng.uniform(-11, 11, (2000, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.9, 1.9, 2000)
    voxels, coors, nppv = dp.points_to_voxel(
        pts, (0.5, 0.5, 0.1), pr, max_points=5, max_voxels=3000)
    boxes = np.array([[0.0, 0.5 * (i + 1), 0.0, 2.0, 4.0, 1.5, 0, 0, 0.1],
                      [3.0, -2.0, 0.2, 2.2, 4.5, 1.6, 0, 0, -0.4]],
                     np.float32)
    targets = dp.assign_label(boxes, np.array([1, 1]), pc_range=pr,
                              voxel_size=(0.5, 0.5, 0.1),
                              out_size_factor=8, max_objs=10)
    s = dp.collate_det([{"voxels": voxels, "coords_zyx": coors,
                         "num_points": nppv, "targets": targets}],
                       voxel_capacity=4096, max_objs=10, max_points=5)
    g = {k: np.asarray(s[k])[None] if k == "nnz" else s[k][None]
         for k in ("voxels", "coords", "num_points", "nnz")}
    for key in ("hm", "anno_box", "ind", "mask", "cat"):
        g[key] = [np.asarray(v)[None] for v in s[key]]
    return g


def _run(dtype, batches, steps):
    import jax
    import jax.numpy as jnp

    from link_tpu.models.voxelnet import VoxelNet
    from link_tpu.train import det_trainer as DT
    from link_tpu.train import schedules
    from link_tpu.train.trainer import TrainState

    kw = dict(num_input_features=5, batch_size=1, grid_shape=(48, 48, 40),
              capacities=(4096, 2048, 1024, 512))
    model = VoxelNet(**kw) if dtype is None else VoxelNet(**kw, dtype=dtype)
    b0 = batches[0]
    # init in f32 regardless of compute dtype: params are f32 either way
    init_model = VoxelNet(**kw)
    variables = init_model.init(
        jax.random.PRNGKey(0), jnp.asarray(b0["voxels"][0]),
        jnp.asarray(b0["coords"][0]), jnp.asarray(b0["num_points"][0]),
        jnp.asarray(b0["nnz"][0]), False)
    lr_fn, mom_fn = schedules.one_cycle(1e-3, steps)
    init_fn, step = DT.make_det_train_step(model, lr_fn, mom_fn, mesh=None)
    state = TrainState(step=jnp.int32(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=init_fn(variables["params"]))
    losses = []
    for t in range(steps):
        b = {k: jnp.asarray(v) if not isinstance(v, list)
             else [jnp.asarray(x) for x in v]
             for k, v in batches[t % len(batches)].items()}
        state, m = step(state, b)
        losses.append(float(m["loss"]))
    return np.asarray(losses)


def test_det_train_bf16_tracks_f32():
    rng = np.random.default_rng(17)
    batches = [_make_batch(rng, i) for i in range(2)]
    steps = 10
    l32 = _run(None, batches, steps)
    l16 = _run("bfloat16", batches, steps)

    assert np.isfinite(l32).all() and np.isfinite(l16).all(), (l32, l16)
    # shared-init forward: loss agreement at step 0 (measured 1.1% —
    # the focal log terms amplify bf16 feature rounding; 3% bound)
    assert abs(l16[0] - l32[0]) / abs(l32[0]) < 0.03, (l32[0], l16[0])
    # curve tracking: statistical envelope. Individual steps can spike
    # (measured: one step at 0.66 rel before re-converging to 0.13 —
    # bf16 seeds ~1e-2 into chaotic focal dynamics, so a per-step max
    # gate is flaky by construction); gate the median and the endpoint.
    rel = np.abs(l16 - l32) / np.maximum(np.abs(l32), 1e-6)
    assert np.median(rel) < 0.25, rel
    assert rel[-1] < 0.3, rel
    # both train: material decrease over the horizon
    assert l32[-1] < 0.7 * l32[0], l32
    assert l16[-1] < 0.7 * l16[0], l16
