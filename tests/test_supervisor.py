"""Failure-recovery: supervisor restart loop + train-CLI checkpoint resume.

The reference's recovery capability is manual resume from epoch
checkpoints (SURVEY §5; detection/tools/train.py:77 `--resume_from`,
torchie trainer.resume at trainer.py:497-510, segmentation
train.py:165-184). This suite pins our equivalent (`--resume auto` on
both train CLIs) and the beyond-reference supervisor
(link_tpu/train/supervisor.py) that automates the relaunch.

The resume-parity test is the load-bearing one: a run trained 1 epoch,
killed, and resumed must produce the SAME epoch-2 metrics as an
uninterrupted 2-epoch run — full TrainState (params, batch_stats,
optimizer + schedule position) round-trips through the checkpoint.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Child for supervisor unit tests: bumps an attempt counter file, exits 3
# until the counter reaches the requested number of crashes, then 0.
CHILD = """
import sys
from pathlib import Path
p = Path(sys.argv[1])
n = int(p.read_text()) if p.exists() else 0
p.write_text(str(n + 1))
sys.exit(3 if n < int(sys.argv[2]) else 0)
"""


def _child_cmd(tmp_path, crashes):
    counter = tmp_path / "attempts"
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    return [sys.executable, str(script), str(counter), str(crashes)], counter


def test_inject_resume():
    from link_tpu.train.supervisor import inject_resume

    cmd = ["python", "tools/seg_train.py", "cfg.yaml", "--run-dir", "r"]
    assert inject_resume(cmd) == cmd + ["--resume", "auto"]
    # caller-chosen resume behavior is left alone
    explicit = cmd + ["--resume", "some/ckpt.msgpack"]
    assert inject_resume(explicit) == explicit


def test_supervisor_restarts_until_success(tmp_path):
    from link_tpu.train.supervisor import supervise

    cmd, counter = _child_cmd(tmp_path, crashes=2)
    delays = []
    code = supervise(cmd, max_restarts=5, backoff=0.5, resume=False,
                     log=lambda s: None, _sleep=delays.append)
    assert code == 0
    assert counter.read_text() == "3"        # 2 crashes + 1 success
    # exponential backoff between consecutive fast crashes
    assert delays == [0.5, 1.0]


def test_supervisor_gives_up(tmp_path):
    from link_tpu.train.supervisor import supervise

    cmd, counter = _child_cmd(tmp_path, crashes=99)
    code = supervise(cmd, max_restarts=2, backoff=0.01, resume=False,
                     log=lambda s: None, _sleep=lambda s: None)
    assert code == 3
    assert counter.read_text() == "3"        # 1 launch + 2 restarts


def test_supervisor_cli_requires_stable_run_dir():
    from link_tpu.train.supervisor import main

    # injecting --resume auto without a stable --run-dir is a footgun
    # (nothing to resume from a fresh timestamped dir) -> argparse error
    with pytest.raises(SystemExit):
        main(["--", "python", "tools/seg_train.py", "cfg.yaml"])


def test_find_resume_and_meta(tmp_path):
    from link_tpu.train.checkpoint import (checkpoint_meta, find_resume,
                                           load_checkpoint, save_checkpoint)

    d = str(tmp_path / "run")
    assert find_resume(d) is None
    state = {"w": np.arange(4, dtype=np.float32)}
    save_checkpoint(d, state, epoch=1)
    save_checkpoint(d, {"w": state["w"] + 1}, epoch=2)
    rp = find_resume(d)
    assert rp is not None
    # meta resolves through the latest.msgpack symlink to epoch_2's json
    assert checkpoint_meta(rp)["epoch"] == 2
    got = load_checkpoint(rp, {"w": np.zeros(4, np.float32)})
    np.testing.assert_array_equal(got["w"], state["w"] + 1)
    # symlink gone -> fall back to the highest epoch_N file
    os.remove(os.path.join(d, "latest.msgpack"))
    assert os.path.basename(find_resume(d)) == "epoch_2.msgpack"


def _cpu_child_env():
    """CPU-only, single-device, relay-free env for train-CLI children.

    - Pin ONE cpu device: the pytest session exports
      --xla_force_host_platform_device_count=8 (conftest); inheriting it
      would make the child compile an 8-device GSPMD step instead.
    - Strip the axon relay vars: with them set, sitecustomize registers
      the axon PJRT plugin and the FIRST get_backend() in every fresh
      process blocks claiming the single TPU through the relay (even
      under JAX_PLATFORMS=cpu — backends() initializes the registered
      plugin). CPU-only children must never touch the relay.
    """
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
              "PJRT_LIBRARY_PATH", "AXON_POOL_SVC_OVERRIDE",
              "AXON_LOOPBACK_RELAY"):
        env.pop(k, None)
    return env


def _run_seg(args, timeout=2400):   # cold .jax_cache: CPU-compiling the
    # tiny ELKUNet train+eval steps dominates; warm runs take ~1-2 min
    env = _cpu_child_env()
    base = [sys.executable, os.path.join(REPO, "tools", "seg_train.py"),
            os.path.join(REPO, "configs/semantic_kitti/linkunet/default.yaml"),
            "--synthetic",
            "batch_size=1", "model.cr=0.25",
            "model.capacities=[2048,1024,512,256,128]",
            "dataset.num_points=1500", "dataset.synthetic_length=2"]
    return subprocess.run(base + args, env=env, cwd=REPO, timeout=timeout,
                          capture_output=True, text=True)


def _epoch_rows(run_dir):
    rows = {}
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "epoch" in rec:
                rows[rec["epoch"]] = rec
    return rows


@pytest.mark.slow
def test_seg_train_resume_parity(tmp_path):
    """interrupted-after-epoch-1 + `--resume auto` == straight 2-epoch run."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")

    ra = _run_seg(["--run-dir", a, "--epochs", "2"])
    assert ra.returncode == 0, ra.stderr[-2000:]

    # the interrupted leg runs the SAME 2-epoch recipe (the LR schedule
    # spans num_epochs, so a shorter --epochs would train epoch 1 under
    # a different cosine) and stops cleanly after checkpointing epoch 1
    rb1 = _run_seg(["--run-dir", b, "--epochs", "2",
                    "--stop-after-epoch", "1"])
    assert rb1.returncode == 0, rb1.stderr[-2000:]
    rb2 = _run_seg(["--run-dir", b, "--epochs", "2", "--resume", "auto"])
    assert rb2.returncode == 0, rb2.stderr[-2000:]
    assert "resumed" in rb2.stdout and "epoch 2" in rb2.stdout

    ea, eb = _epoch_rows(a), _epoch_rows(b)
    assert set(ea) == {1, 2} and set(eb) == {1, 2}
    # epoch-2 dynamics identical: the checkpoint round-trips the FULL
    # TrainState (flax serialization is exact) and batch seeding is
    # epoch-keyed, so the resumed epoch replays bit-for-bit
    np.testing.assert_allclose(eb[2]["loss/train"], ea[2]["loss/train"],
                               rtol=1e-6)
    np.testing.assert_allclose(eb[2]["iou/val"], ea[2]["iou/val"],
                               rtol=1e-6)
    # and the resumed run rotated its checkpoints like the straight run
    assert os.path.exists(os.path.join(b, "epoch_2.msgpack"))


@pytest.mark.slow
def test_supervisor_end_to_end_with_seg_train(tmp_path):
    """supervise() relaunches a crashed training run and it completes.

    Crash injection: the first attempt stops after checkpointing epoch 1
    (--stop-after-epoch, same 2-epoch recipe) and the wrapper then exits
    nonzero (simulating a mid-recipe worker death with a valid checkpoint
    on disk); the supervisor's relaunch resumes from epoch 1 and
    completes the recipe.
    """
    from link_tpu.train.supervisor import supervise

    run_dir = str(tmp_path / "run")
    flag = tmp_path / "crashed_once"
    wrapper = tmp_path / "flaky_train.py"
    wrapper.write_text(f"""
import os, subprocess, sys
repo = {REPO!r}
flag = {str(flag)!r}
first = not os.path.exists(flag)
cmd = [sys.executable, os.path.join(repo, "tools", "seg_train.py"),
       os.path.join(repo, "configs/semantic_kitti/linkunet/default.yaml"),
       "--synthetic", "batch_size=1", "model.cr=0.25",
       "model.capacities=[2048,1024,512,256,128]",
       "dataset.num_points=1500", "dataset.synthetic_length=2",
       "--run-dir", {run_dir!r}, "--epochs", "2"] \
    + (["--stop-after-epoch", "1"] if first else []) + sys.argv[1:]
code = subprocess.call(cmd, cwd=repo)
if first:
    open(flag, "w").close()
    sys.exit(17)          # die AFTER checkpointing epoch 1
sys.exit(code)
""")
    env = _cpu_child_env()
    logs = []
    code = supervise([sys.executable, str(wrapper)], max_restarts=2,
                     backoff=0.01, env=env, log=logs.append,
                     _sleep=lambda s: None)
    assert code == 0, logs
    assert any("restarting" in l for l in logs)
    rows = _epoch_rows(run_dir)
    assert set(rows) == {1, 2}               # epoch 2 ran on the relaunch
    assert os.path.exists(os.path.join(run_dir, "epoch_2.msgpack"))
