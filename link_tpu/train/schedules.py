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


def lr_updater(policy: str, base_lr: float, *, by_epoch: bool = True,
               steps_per_epoch: int = 1, max_steps: int = 1,
               max_epochs: int = 1, warmup: str = None,
               warmup_iters: int = 0, warmup_ratio: float = 0.1, **kw):
    """The torchie LrUpdaterHook family as a pure step->lr callable
    (reference: detection/det3d/torchie/trainer/hooks/lr_updater.py:10-175;
    unused by the published LinK configs — they train one_cycle — but part
    of the trainer surface, so ported for completeness).

    policy: fixed | step (kw: step=int|milestones list, gamma=0.1) |
    exp (kw: gamma) | poly (kw: power=1.0, min_lr=0.0) | inv (kw: gamma,
    power=1.0) | cosine (kw: target_lr=0.0).

    by_epoch=True evaluates the policy on progress = step//steps_per_epoch
    (the hook recomputes lr in before_train_epoch) with max progress
    max_epochs; by_epoch=False on progress = step with max progress
    max_steps. warmup (constant|linear|exp) overrides the first
    warmup_iters ITERATIONS in both modes, scaling the policy lr at the
    current progress (before_train_iter semantics, lr_updater.py:67-83).
    All arithmetic is jnp so the callable feeds optax.inject_hyperparams.
    """
    gamma = kw.get("gamma", 0.1)

    def regular(progress, max_progress):
        progress = jnp.asarray(progress, jnp.float32)
        if policy == "fixed":
            return jnp.full_like(progress, base_lr)
        if policy == "step":
            s = kw["step"]
            if isinstance(s, int):
                exp = progress // s
            else:
                ms = jnp.asarray(s, jnp.float32)
                exp = jnp.sum(progress[..., None] >= ms, axis=-1)
            return base_lr * gamma ** exp
        if policy == "exp":
            return base_lr * gamma ** progress
        if policy == "poly":
            power = kw.get("power", 1.0)
            min_lr = kw.get("min_lr", 0.0)
            coeff = (1 - progress / max_progress) ** power
            return (base_lr - min_lr) * coeff + min_lr
        if policy == "inv":
            power = kw.get("power", 1.0)
            return base_lr * (1 + gamma * progress) ** (-power)
        if policy == "cosine":
            target = kw.get("target_lr", 0.0)
            return target + 0.5 * (base_lr - target) * (
                1 + jnp.cos(jnp.pi * progress / max_progress))
        raise ValueError(f"unknown lr policy {policy!r}")

    def lr_fn(step):
        step = jnp.asarray(step, jnp.int32)
        if by_epoch:
            reg = regular(step // steps_per_epoch, max_epochs)
        else:
            reg = regular(step, max_steps)
        if warmup is None:
            return reg
        it = jnp.asarray(step, jnp.float32)
        if warmup == "constant":
            wl = reg * warmup_ratio
        elif warmup == "linear":
            k = (1 - it / warmup_iters) * (1 - warmup_ratio)
            wl = reg * (1 - k)
        elif warmup == "exp":
            wl = reg * warmup_ratio ** (1 - it / warmup_iters)
        else:
            raise ValueError(f"unknown warmup {warmup!r}")
        return jnp.where(step < warmup_iters, wl, reg)

    return lr_fn
