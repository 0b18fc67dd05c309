"""Device-mesh / data-parallel plumbing (GSPMD).

The reference's two distributed stacks — torchpack's MPI launcher + torch
DDP for segmentation (segmentation/train.py:41-100) and
torch.distributed.launch + NCCL for detection (detection/tools/train.py:
84-117, core/utils/dist_utils.py:8-57) — collapse on TPU into a single
1-D `data` Mesh with NamedSharding annotations: XLA inserts the gradient
all-reduce over ICI, and no user-level communication code exists.

This module owns the mesh and sharding helpers; `train.trainer` and
`train.det_trainer` build their jitted steps on top of them.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_data_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (per-device batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stack_device_batches(batches) -> Any:
    """Stack per-device host batches along a new leading device axis (the
    axis `data_sharded` partitions). Tree-mapped so nested batch entries —
    e.g. detection targets, whose per-task lists have heterogeneous class
    counts and cannot stack across tasks — stack leaf-wise."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def shard_step(step_fn: Callable, mesh: Mesh, out_state: bool = True):
    """Wrap a per-replica step for DP execution via shard_map. Batch arrays
    must carry a leading device axis; state is replicated.

    Note: prefer the GSPMD vmap formulation (train.trainer.make_dp_train_step)
    for big models — XLA's manual-sharding pass compiles pathologically
    slowly on graphs with many sort/scatter ops; the vmap+NamedSharding form
    partitions trivially along the device axis."""

    def sharded(state, batch):
        local = jax.tree_util.tree_map(lambda x: x[0], batch)
        return step_fn(state, local)

    in_specs = (P(), P(DATA_AXIS))
    out_specs = (P(), P()) if out_state else P()
    return jax.shard_map(sharded, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
