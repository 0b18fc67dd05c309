"""LR schedules (optax-compatible callables).

Reference: segmentation/core/schedulers.py:7-20 (cosine with warmup,
stepped per iteration) and detection/det3d/solver/learning_schedules_fastai.py
:77-97 (OneCycle: two cosine-annealed phases for lr and momentum).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warmup(base_lr: float, num_epochs: int, global_batch_size: int,
                  dataset_size: int, world_size: int = 1):
    """Per-iteration multiplier schedule from schedulers.py:7-20:
    warmup_iters = 0 if single replica else 1000 // world_size; then cosine
    over num_epochs * iters_per_epoch."""
    warmup_iters = 0 if world_size == 1 else 1000 // world_size
    iter_per_epoch = (dataset_size + global_batch_size - 1) // global_batch_size
    total = num_epochs * iter_per_epoch

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (step + 1) / jnp.maximum(warmup_iters, 1)
        ratio = (step - warmup_iters) / total
        cos = 0.5 * (1 + jnp.cos(jnp.pi * ratio))
        mult = jnp.where(step < warmup_iters, warm, cos)
        return base_lr * mult

    return schedule


def _annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1
    return end + (start - end) / 2.0 * cos_out


def one_cycle(lr_max: float, total_steps: int, moms=(0.95, 0.85),
              div_factor: float = 10.0, pct_start: float = 0.4):
    """fastai OneCycle (learning_schedules_fastai.py:77-97): phase 1 ramps
    lr_max/div -> lr_max while momentum anneals high -> low; phase 2
    anneals lr_max -> (lr_max/div)/1e4 and momentum back up. NOTE the
    phase-2 floor is low_lr/1e4 (learning_schedules_fastai.py:88), not
    lr_max/1e4 — golden-pinned in tests/test_golden_losses.py. Phase
    boundary is int(pct_start*total) like LRSchedulerStep's int() arms.
    Returns (lr_fn, mom_fn)."""
    low = lr_max / div_factor
    split = int(pct_start * total_steps)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = jnp.clip(step / jnp.maximum(split, 1), 0, 1)
        p2 = jnp.clip((step - split) / jnp.maximum(total_steps - split, 1), 0, 1)
        return jnp.where(step < split,
                         _annealing_cos(low, lr_max, p1),
                         _annealing_cos(lr_max, low / 1e4, p2))

    def mom_fn(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = jnp.clip(step / jnp.maximum(split, 1), 0, 1)
        p2 = jnp.clip((step - split) / jnp.maximum(total_steps - split, 1), 0, 1)
        return jnp.where(step < split,
                         _annealing_cos(moms[0], moms[1], p1),
                         _annealing_cos(moms[1], moms[0], p2))

    return lr_fn, mom_fn
