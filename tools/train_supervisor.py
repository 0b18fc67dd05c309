#!/usr/bin/env python
"""Crash/preemption-tolerant training launcher.

Wraps a train CLI and relaunches it from its latest checkpoint until the
recipe completes (the reference's recovery story is manual resume from
epoch checkpoints — SURVEY §5, detection/tools/train.py:77; this
automates it for long TPU runs on preemptible capacity).

Usage:
  python tools/train_supervisor.py --max-restarts 20 -- \
      python tools/seg_train.py configs/semantic_kitti/linkunet/default.yaml \
      --run-dir runs/linkunet-a --synthetic

The wrapped command must write checkpoints to a STABLE --run-dir;
`--resume auto` is appended automatically (attempt 1 finds no checkpoint
and starts fresh). SIGTERM/SIGINT are forwarded to the child and stop
the loop without restarting.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from link_tpu.train.supervisor import main

if __name__ == "__main__":
    sys.exit(main())
