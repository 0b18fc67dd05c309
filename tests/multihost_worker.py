"""Worker for tests/test_multihost_procs.py — runs in its OWN process.

argv: <process_id> <num_processes> <coordinator addr|-> <out.json>
      [devices_per_process]

Joins the jax.distributed rendezvous (the TPU-native replacement for the
reference's MPI/torch.distributed launchers — segmentation/train.py:41-45,
detection/tools/train.py:84-117), builds the global data mesh over ALL
processes' CPU devices, assembles one global batch from this process's
addressable shards via make_global_batch, runs one jitted
value_and_grad + SGD step over it, and allgathers a per-process token.
Deterministic inputs keyed by GLOBAL device position make the result
independent of process count — the parent compares the 2-process run
against a 1-process run of this same script.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    out = sys.argv[4]
    ndev_local = int(sys.argv[5]) if len(sys.argv) > 5 else 4 // nproc

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev_local} "
        + os.environ.get("XLA_FLAGS", ""))
    sys.path.insert(0, REPO)

    import numpy as np
    import jax
    # sitecustomize pre-imports jax with the axon TPU platform pinned, so
    # the env var alone is too late (same dance as tests/conftest.py:17)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from link_tpu import parallel as par
    from link_tpu.parallel import multihost as mh

    if nproc > 1:
        got_pid = mh.maybe_initialize(coordinator=coord,
                                      num_processes=nproc, process_id=pid)
        assert got_pid == pid, (got_pid, pid)
    assert jax.process_count() == nproc, jax.process_count()

    mesh = par.make_data_mesh(jax.devices())
    flat = list(mesh.devices.flat)
    # per-GLOBAL-device deterministic payload: device at mesh position g
    # carries x = full((2, 2), g + 1) — identical across process counts
    per_dev = [{"x": np.full((2, 2), flat.index(d) + 1, np.float32)}
               for d in mh.local_mesh_devices(mesh)]
    gb = mh.make_global_batch(mesh, per_dev)

    @jax.jit
    def step(w, b):
        def loss_fn(w):
            return jnp.mean((b["x"] * w - 1.0) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(w)
        return loss, w - 0.1 * g

    loss, w1 = step(jnp.float32(3.0), gb)
    ag = mh.allgather_host({"token": np.int32(100 + pid)})

    with open(out, "w") as f:
        json.dump({"pid": pid, "nproc": jax.process_count(),
                   "ndev": jax.device_count(),
                   "loss": float(loss), "w1": float(w1),
                   "tokens": np.asarray(ag["token"]).ravel().tolist()}, f)


if __name__ == "__main__":
    main()
