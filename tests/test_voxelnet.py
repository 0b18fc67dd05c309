"""End-to-end VoxelNet forward + loss on a tiny grid (CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from link_tpu.models.voxelnet import VoxelNet
from link_tpu.models.center_head import center_head_loss
from link_tpu.data import det_pipeline as dp


def _tiny_sample(rng, grid=(48, 48, 40), vs=(0.5, 0.5, 0.1)):
    pr = (-12, -12, -2, 12, 12, 2)
    pts = rng.uniform(-11, 11, (3000, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.9, 1.9, 3000)
    pts[:, 4] = 0
    voxels, coors, nppv = dp.points_to_voxel(pts, vs, pr, max_points=5,
                                             max_voxels=4000)
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.0, 0.0, 0.1],
                      [5.0, -3.0, 0.0, 0.5, 0.5, 1.8, 0.0, 0.0, 0.0]])
    classes = np.array([1, 9])  # car, pedestrian
    targets = dp.assign_label(boxes, classes, pc_range=pr, voxel_size=vs,
                              out_size_factor=8, max_objs=20)
    return {"voxels": voxels, "coords_zyx": coors, "num_points": nppv,
            "targets": targets}


@pytest.mark.slow  # ~209 s CPU full-model compile (round-3 durations)
def test_voxelnet_forward_and_loss():
    rng = np.random.default_rng(50)
    sample = _tiny_sample(rng)
    batch = dp.collate_det([sample], voxel_capacity=4096, max_objs=20,
                           max_points=5)

    model = VoxelNet(num_input_features=5, batch_size=1,
                     grid_shape=(48, 48, 40),
                     capacities=(4096, 2048, 1024, 512))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["voxels"]),
                           jnp.asarray(batch["coords"]),
                           jnp.asarray(batch["num_points"]),
                           jnp.asarray(batch["nnz"]), False)
    preds = model.apply(variables, jnp.asarray(batch["voxels"]),
                        jnp.asarray(batch["coords"]),
                        jnp.asarray(batch["num_points"]),
                        jnp.asarray(batch["nnz"]), False)
    assert len(preds) == 6
    # grid 48 -> backbone /8 -> 6; RPN keeps 6 (stride1 concat stride2 up)
    assert preds[0]["hm"].shape == (1, 6, 6, 1)
    assert preds[1]["hm"].shape[-1] == 2

    example = {k: [jnp.asarray(v) for v in batch[k]]
               for k in ("hm", "anno_box", "ind", "mask", "cat")}
    # downscale targets to the model's map: rebuild with matching fmap size
    # (assign_label used out_size_factor 8 on 48 grid -> 6x6 maps) OK.
    assert example["hm"][0].shape == (1, 6, 6, 1)

    loss, logs = center_head_loss(preds, example)
    assert np.isfinite(float(loss))

    def loss_fn(params):
        p = model.apply({**variables, "params": params},
                        jnp.asarray(batch["voxels"]),
                        jnp.asarray(batch["coords"]),
                        jnp.asarray(batch["num_points"]),
                        jnp.asarray(batch["nnz"]), False)
        l, _ = center_head_loss(p, example)
        return l

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0
