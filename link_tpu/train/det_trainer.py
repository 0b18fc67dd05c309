"""Detection training runtime: one-cycle Adam + grad clip + DP step.

Replaces torchie's Trainer + OptimizerHook + fastai OptimWrapper/OneCycle
(reference: detection/det3d/torchie/trainer/trainer.py:138-610,
hooks/optimizer.py:7-22 (clip 35), solver/fastai_optim.py:121,
learning_schedules_fastai.py:77-97, apis/train.py:156-337).

The fastai wrapper's "true weight decay" (decoupled, applied to weights
only, not BN/bias layer groups) maps to optax.add_decayed_weights with a
mask; the per-iteration OneCycle lr/momentum schedule maps to
inject_hyperparams(scale_by_adam)(b1=mom_fn(step)).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.center_head import center_head_loss
from .trainer import DATA_AXIS, TrainState, _data_sharded, _replicated


def _decay_mask(params):
    """Weights-only decay mask (rank>=2 'kernel' arrays) for the
    bn_wd=False variant. NOTE: the published recipe does NOT use it —
    build_one_cycle_optimizer passes bn_wd=True (apis/train.py:164-169),
    and OptimWrapper.step then decays the BN/bias group too
    (fastai_optim.py:158-173), so every parameter gets true weight
    decay. Golden-pinned in tests/test_golden_losses.py."""
    def mask_fn(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return name == "kernel" and getattr(leaf, "ndim", 0) >= 2
    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_one_cycle_adam(lr_fn: Callable, mom_fn: Callable,
                        weight_decay: float = 0.01,
                        grad_clip: float = 35.0,
                        bn_wd: bool = True) -> optax.GradientTransformation:
    """Adam whose lr AND beta1 follow the OneCycle schedules, with
    decoupled (fastai "true") wd and global-norm clip 35
    (optimizer_config in configs/...elkv3.py:207). bn_wd=True matches
    the reference build (decay applies to BN/bias params as well).
    Returns a standard GradientTransformation: optax.inject_hyperparams
    threads the schedules through its own step counter, so the chain
    state is built once and never re-derived."""

    @optax.inject_hyperparams
    def _tx(b1, learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.scale_by_adam(b1=b1, b2=0.99),
            optax.add_decayed_weights(
                weight_decay, mask=None if bn_wd else _decay_mask),
            optax.scale_by_learning_rate(learning_rate),
        )

    return _tx(b1=mom_fn, learning_rate=lr_fn)


def make_det_train_step(model, lr_fn, mom_fn, mesh,
                        weight_decay: float = 0.01, grad_clip: float = 35.0,
                        code_weights=(1.0,) * 6 + (0.2, 0.2, 1.0, 1.0),
                        weight: float = 0.25):
    tx = make_one_cycle_adam(lr_fn, mom_fn, weight_decay, grad_clip)

    def per_replica_loss(params, batch_stats, b):
        preds, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            b["voxels"], b["coords"], b["num_points"], b["nnz"], True,
            mutable=["batch_stats"])
        example = {k: b[k] for k in ("hm", "anno_box", "ind", "mask", "cat")}
        loss, logs = center_head_loss(preds, example, weight, code_weights)
        return loss, (mut["batch_stats"], logs)

    def step(state: TrainState, gbatch: Dict):
        def loss_fn(params):
            losses, (bs, logs) = jax.vmap(
                per_replica_loss, in_axes=(None, None, 0))(
                    params, state.batch_stats, gbatch)
            mean0 = lambda t: jax.tree_util.tree_map(
                lambda x: jnp.mean(x, axis=0), t)
            return jnp.mean(losses), (mean0(bs), mean0(logs))

        # trace-time flag: strided spconv plans get eager inverse maps so
        # the conv backward runs gather-form (conv._gm); restored before
        # the trace ends so predict/eval traces don't pay the inverts
        from ..sparse import spconv_engine as _se
        _se.EAGER_INVERT = True
        try:
            (loss, (new_bs, logs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        finally:
            _se.EAGER_INVERT = False
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=new_params,
                           batch_stats=new_bs, opt_state=new_opt),
                {"loss": loss, **logs})

    if mesh is None:
        return tx.init, jax.jit(step)
    return tx.init, jax.jit(
        step, in_shardings=(_replicated(mesh), _data_sharded(mesh)),
        out_shardings=(_replicated(mesh), _replicated(mesh)),
        donate_argnums=0)


def make_det_predict_step(model, test_cfg: Dict, num_classes, mesh=None):
    """Forward + decode (NMS stays host-side, ops/nms.py), mirroring
    CenterHead.predict's device/host split."""
    from ..models.center_head import decode_boxes

    def step(state: TrainState, batch: Dict):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["voxels"], batch["coords"], batch["num_points"],
            batch["nnz"], False)
        return decode_boxes(preds, test_cfg, num_classes)

    return jax.jit(step)
