"""Streaming mean-IoU metric with cross-replica reduction.

Reference: segmentation/core/callbacks.py:19-98 (MeanIoU): per-class
total_seen / total_correct / total_positive counters, allreduce-summed at
epoch end; classes never seen count as IoU 1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def iou_counters(preds: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray,
                 num_classes: int, ignore_label: int = 0):
    """Per-class (seen, correct, positive) int32 counters for one batch.
    Rows whose label == ignore_label are excluded, like callbacks.py:40-47.
    Device-side; `psum` the result across replicas for SyncBN-style eval."""
    keep = valid & (labels != ignore_label)
    cls = jnp.arange(num_classes)

    def per_class(c):
        is_l = (labels == c) & keep
        is_p = (preds == c) & keep
        seen = jnp.sum(is_l.astype(jnp.int32))
        positive = jnp.sum(is_p.astype(jnp.int32))
        correct = jnp.sum((is_l & is_p).astype(jnp.int32))
        return seen, correct, positive

    seen, correct, positive = jax.vmap(per_class)(cls)
    return jnp.stack([seen, correct, positive], axis=0)  # (3, C)


def miou_from_counters(counters: np.ndarray, ignore_label: int = 0) -> float:
    """callbacks.py:62-77: unseen classes contribute IoU 1; the ignore
    class is excluded from the average."""
    seen, correct, positive = counters
    ious = []
    for c in range(counters.shape[1]):
        if c == ignore_label:
            continue
        if seen[c] == 0:
            ious.append(1.0)
        else:
            union = seen[c] + positive[c] - correct[c]
            ious.append(correct[c] / max(union, 1))
    return float(np.mean(ious))


class MeanIoU:
    """Host-side accumulator wrapping the device counters."""

    def __init__(self, num_classes: int, ignore_label: int = 0,
                 name: str = "iou/val"):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.name = name
        self.reset()

    def reset(self):
        self.counters = np.zeros((3, self.num_classes), np.int64)

    def update(self, counters) -> None:
        self.counters += np.asarray(counters, np.int64)

    def compute(self) -> float:
        return miou_from_counters(self.counters, self.ignore_label)

    def per_class(self) -> np.ndarray:
        seen, correct, positive = self.counters
        union = np.maximum(seen + positive - correct, 1)
        iou = correct / union
        iou[seen == 0] = 1.0
        return iou
