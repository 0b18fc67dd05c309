"""Checkpoint save/restore with rotation + best-metric tracking.

Replaces torchpack Saver(max_to_keep)/MaxSaver (reference:
segmentation/train.py:137-139, core/trainers.py:106-118) and torchie's
CheckpointHook with `latest.pth` symlink and meta dict
(detection/det3d/torchie/trainer/checkpoint.py:235-260,
trainer.py:345-359). State = full TrainState (params, batch_stats,
optimizer, step) + JSON meta (epoch, config snapshot, metric history).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(directory: str, state: Any, epoch: int,
                    meta: Optional[Dict] = None, max_to_keep: int = 4,
                    metric: Optional[float] = None,
                    metric_name: str = "iou/val") -> str:
    os.makedirs(directory, exist_ok=True)
    state = jax.device_get(state)
    path = os.path.join(directory, f"epoch_{epoch}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    meta = dict(meta or {})
    meta.update({"epoch": epoch})
    if metric is not None:
        meta[metric_name] = float(metric)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)

    latest = os.path.join(directory, "latest.msgpack")
    if os.path.islink(latest) or os.path.exists(latest):
        os.remove(latest)
    os.symlink(os.path.basename(path), latest)

    # Best-metric tracking (MaxSaver semantics).
    if metric is not None:
        best_meta_path = os.path.join(directory, "best.json")
        best = -float("inf")
        if os.path.exists(best_meta_path):
            with open(best_meta_path) as f:
                best = json.load(f).get(metric_name, -float("inf"))
        if metric > best:
            best_path = os.path.join(directory, "best.msgpack")
            if os.path.exists(best_path):
                os.remove(best_path)
            os.link(path, best_path)
            with open(best_meta_path, "w") as f:
                json.dump({metric_name: float(metric), "epoch": epoch}, f)

    # Rotate old epoch checkpoints.
    cks = sorted(
        (p for p in os.listdir(directory)
         if p.startswith("epoch_") and p.endswith(".msgpack")),
        key=lambda p: int(p.split("_")[1].split(".")[0]))
    for old in cks[:-max_to_keep]:
        op = os.path.join(directory, old)
        os.remove(op)
        if os.path.exists(op + ".json"):
            os.remove(op + ".json")
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into a template TrainState (handles latest/best symlinks)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def find_resume(directory: str) -> Optional[str]:
    """Resolve the newest checkpoint in a run dir, or None if the dir has
    none (fresh start). Prefers the `latest.msgpack` symlink (reference:
    torchie `latest.pth`, trainer.py:345-359); falls back to the highest
    epoch_N file if the symlink is missing or dangling."""
    latest = os.path.join(directory, "latest.msgpack")
    if os.path.exists(latest):          # follows the symlink
        return latest
    if not os.path.isdir(directory):
        return None
    cks = sorted(
        (p for p in os.listdir(directory)
         if p.startswith("epoch_") and p.endswith(".msgpack")),
        key=lambda p: int(p.split("_")[1].split(".")[0]))
    return os.path.join(directory, cks[-1]) if cks else None


def checkpoint_meta(path: str) -> Dict:
    mp = os.path.realpath(path) + ".json"   # latest.msgpack -> epoch_N.msgpack.json
    if os.path.exists(mp):
        with open(mp) as f:
            return json.load(f)
    return {}
