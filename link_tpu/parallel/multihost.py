"""Multi-host (multi-process) data-parallel plumbing.

The reference trains multi-process from day one: torchpack's MPI launcher
(`segmentation/train.py:41-45`, rank discovery -> torch.distributed) and
`torch.distributed.launch` with NCCL env:// rendezvous or SLURM
(`detection/tools/train.py:84-117`). The TPU-native equivalent replaces
both launchers with `jax.distributed.initialize()` + ONE global GSPMD
mesh: gradients ride ICI/DCN through the collectives XLA inserts for the
NamedSharding-annotated jit step, and the only per-process code left is

  * per-process dataset sharding (`process_shard_indices` — the
    DistributedSampler equivalent, reference
    `detection/det3d/datasets/loader/sampler.py:16-64`),
  * assembling the global batch from each process's addressable shard
    (`make_global_batch` — every process must call the same jit with the
    same GLOBAL array, but can only materialize its own devices' rows),
  * gathering metrics/detections across processes for evaluation
    (`allgather_host` — reference `all_gather` of result dicts at
    `detection/tools/dist_test.py:189`, seg counter allreduce at
    `segmentation/core/callbacks.py:56-61`).

Everything here is process-count-agnostic: on a single process (CI, the
8-device CPU mesh, the one-chip bench) the exact same code paths run with
process_count == 1, which is what makes the multi-host path unit-testable
without a pod.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import DATA_AXIS


def maybe_initialize(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Join the multi-process runtime when configured; no-op otherwise.

    Explicit args win; else the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod metadata auto-detection inside jax.distributed.initialize)
    drive the rendezvous — the TPU-native replacement for the reference's
    NCCL env:// init (tools/train.py:87) and torchpack `dist.init()`.

    Returns the process index (0 on single-process runs).
    """
    want = (coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    nproc = num_processes
    if nproc is None and os.environ.get("JAX_NUM_PROCESSES"):
        nproc = int(os.environ["JAX_NUM_PROCESSES"])
    if want and (nproc is None or nproc > 1):
        kwargs = {}
        if coordinator:
            kwargs["coordinator_address"] = coordinator
        if nproc is not None:
            kwargs["num_processes"] = nproc
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
    return jax.process_index()


def process_info() -> tuple:
    return jax.process_index(), jax.process_count()


def process_shard_indices(indices: np.ndarray, samples_per_step: int,
                          process_index: Optional[int] = None,
                          process_count: Optional[int] = None) -> np.ndarray:
    """This process's rows of an epoch's (already shuffled) index order.

    Equivalent to the reference DistributedSampler's rank slice
    (sampler.py:54-60): pad to a whole number of global steps, then take
    a contiguous per-process block of each step's `samples_per_step`
    window so every process sees the same number of steps.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per_proc = samples_per_step // pc
    if samples_per_step % pc:
        raise ValueError(
            f"global batch {samples_per_step} not divisible by "
            f"process count {pc}")
    nsteps = len(indices) // samples_per_step
    indices = indices[:nsteps * samples_per_step].reshape(
        nsteps, pc, per_proc)
    return indices[:, pi, :].reshape(-1)


def local_mesh_devices(mesh: Mesh) -> List:
    """This process's devices in global-mesh order (the order
    `make_global_batch` expects its per-device batches in)."""
    pi = jax.process_index()
    return [d for d in mesh.devices.flat if d.process_index == pi]


def make_global_batch(mesh: Mesh, per_dev_batches: Sequence[Any]) -> Any:
    """Assemble the GLOBAL device-stacked batch from this process's
    per-local-device host batches (pytrees, one per local mesh device).

    Single-process: reduces to stack + device_put with the data-axis
    sharding. Multi-host: every process contributes only its addressable
    shards via jax.make_array_from_single_device_arrays, and the jit step
    sees one global (ndev_global, ...) array — no cross-host data motion.
    """
    local = local_mesh_devices(mesh)
    if len(per_dev_batches) != len(local):
        raise ValueError(f"{len(per_dev_batches)} per-device batches for "
                         f"{len(local)} local mesh devices")
    ndev_global = mesh.devices.size
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def build(*leaves):
        arrs = [jax.device_put(np.asarray(leaf)[None], d)
                for leaf, d in zip(leaves, local)]
        global_shape = (ndev_global,) + tuple(np.asarray(leaves[0]).shape)
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, arrs)

    return jax.tree_util.tree_map(build, *per_dev_batches)


def allgather_host(x: Any) -> Any:
    """Gather a (possibly nested) numeric pytree from every process onto
    every host, leading axis = process. Single-process: adds the leading
    axis and returns. Multi-host: jax.experimental.multihost_utils."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda a: np.asarray(a)[None], x)
    from jax.experimental import multihost_utils
    return jax.tree_util.tree_map(
        lambda a: np.asarray(multihost_utils.process_allgather(
            np.asarray(a))), x)


def gather_detections(sample_ids: np.ndarray, boxes: np.ndarray,
                      scores: np.ndarray, labels: np.ndarray,
                      counts: np.ndarray):
    """Multi-host gather of per-sample detection arrays (the reference
    all_gathers python dicts, dist_test.py:189 — TPU-native form packs the
    numeric payload and allgathers arrays; string tokens resolve from
    sample_ids on the host).

    All inputs are this process's padded arrays:
      sample_ids (S,), boxes (S, D, 9), scores (S, D), labels (S, D),
      counts (S,) — D = per-sample detection cap.
    Returns the same tuple concatenated over processes.
    """
    packed = allgather_host(dict(ids=sample_ids, boxes=boxes, scores=scores,
                                 labels=labels, counts=counts))
    cat = {k: np.concatenate(list(v), axis=0) for k, v in packed.items()}
    return (cat["ids"], cat["boxes"], cat["scores"], cat["labels"],
            cat["counts"])
