"""TRUE multi-process multihost smoke test (VERDICT r4 next #8).

tests/test_multihost.py exercises the multihost code paths with injected
process indices inside ONE process; this test spawns 2 REAL processes
that rendezvous through jax.distributed.initialize on CPU (2 local
devices each -> a 4-device global mesh), assemble a global batch from
per-process addressable shards via make_global_batch, run one jitted
value_and_grad + SGD step, and allgather a per-process token — the
TPU-native equivalent of the reference's MPI N-rank launch
(segmentation/train.py:41-45) actually crossing process boundaries.

The parent also runs the same worker single-process with 4 local devices
and asserts the 2-process loss/updated-weight equal the single-process
values bit-level (deterministic inputs keyed by global device position).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow          # 3 subprocess jax cold-starts

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = os.environ.copy()
    # the workers set their own platform/device-count flags; strip any
    # outer test-session settings that would fight them
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_COORDINATOR_ADDRESS",
              "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
              # relay vars: with these set, sitecustomize registers the
              # axon PJRT plugin and the first get_backend() in a fresh
              # process blocks claiming the single TPU — CPU-only
              # workers must never touch the relay
              "PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
              "PJRT_LIBRARY_PATH", "AXON_POOL_SVC_OVERRIDE",
              "AXON_LOOPBACK_RELAY"):
        env.pop(k, None)
    return env


def test_two_process_step_matches_single_process(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = _clean_env()

    outs = [tmp_path / f"p{i}.json" for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", coord, str(outs[i]), "2"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    single_out = tmp_path / "single.json"
    log = subprocess.run(
        [sys.executable, WORKER, "0", "1", "-", str(single_out), "4"],
        env=env, capture_output=True, timeout=300)
    assert log.returncode == 0, log.stderr.decode()[-3000:]

    r0, r1 = (json.loads(o.read_text()) for o in outs)
    rs = json.loads(single_out.read_text())

    for r in (r0, r1):
        assert r["nproc"] == 2
        assert r["ndev"] == 4
    assert rs["nproc"] == 1 and rs["ndev"] == 4

    # every process computed the same global step, equal to the
    # single-process run on identical global data
    assert r0["loss"] == r1["loss"] == rs["loss"]
    assert r0["w1"] == r1["w1"] == rs["w1"]
    # allgather_host crossed the process boundary: both tokens, both hosts
    assert sorted(r0["tokens"]) == sorted(r1["tokens"]) == [100, 101]
    assert rs["tokens"] == [100]
