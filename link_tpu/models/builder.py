"""Name-dispatched factories (reference: segmentation/core/builder.py:16-124
make_dataset/make_model/make_criterion/make_optimizer/make_scheduler)."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import optax

from ..data.semantic_kitti import SemanticKITTI, SyntheticSemanticKITTI
from ..train import losses, schedules
from ..train.trainer import make_sgd
from .linkencoder import ELKEncoder
from .linkunet import DEFAULT_CAPACITIES, ELKUNet
from .minkunet import MinkUNet
from .spvcnn import SPVCNN


def make_dataset(cfg, split: str = "train"):
    name = cfg.dataset.name
    if name == "semantic_kitti":
        return SemanticKITTI(root=cfg.dataset.root, split=split,
                             voxel_size=cfg.dataset.voxel_size,
                             num_points=cfg.dataset.num_points)
    if name == "synthetic":
        return SyntheticSemanticKITTI(
            length=cfg.dataset.get("length", 64), split=split,
            voxel_size=cfg.dataset.voxel_size,
            num_points=cfg.dataset.num_points)
    raise NotImplementedError(name)


def make_model(cfg, bn_axis: Optional[str] = None,
               capacities: Optional[Tuple[int, ...]] = None,
               remat: bool = False, dtype: str = "float32"):
    m = cfg.model
    cr = m.get("cr", 1.0)
    caps = tuple(capacities or m.get("capacities", DEFAULT_CAPACITIES))
    num_classes = cfg.data.num_classes
    name = m.name
    if name == "linkunet":
        return ELKUNet(num_classes=num_classes, cr=cr, r=m.r, s=m.s,
                       groups=m.groups, baseop=m.base_op, capacities=caps,
                       bn_axis=bn_axis, remat=remat, dtype=dtype)
    if name == "linkencoder":
        return ELKEncoder(num_classes=num_classes, cr=cr, r=m.r, s=m.s,
                          groups=m.groups, baseop=m.base_op, capacities=caps,
                          bn_axis=bn_axis, remat=remat, dtype=dtype)
    if name == "minkunet":
        return MinkUNet(num_classes=num_classes, cr=cr, capacities=caps,
                        bn_axis=bn_axis, remat=remat, dtype=dtype)
    if name == "spvcnn":
        return SPVCNN(num_classes=num_classes, cr=cr,
                      pres=cfg.dataset.voxel_size, vres=cfg.dataset.voxel_size,
                      capacities=caps, bn_axis=bn_axis)
    raise NotImplementedError(name)


def make_criterion(cfg):
    name = cfg.criterion.name
    ignore = cfg.criterion.get("ignore_index", 0)
    if name == "cross_entropy":
        def crit(logits, labels, valid):
            ce = losses.cross_entropy(logits, labels, valid, ignore)
            return ce, {"loss_ce": ce}
        return crit
    if name == "lovasz_softmax":
        return partial(losses.segmentation_loss, ignore_index=ignore)
    raise NotImplementedError(name)


def make_optimizer(cfg, lr_schedule):
    o = cfg.optimizer
    if o.name == "sgd":
        return make_sgd(lr_schedule, momentum=o.momentum,
                        weight_decay=o.weight_decay, nesterov=o.nesterov)
    if o.name == "adam":
        return optax.chain(optax.add_decayed_weights(o.weight_decay),
                           optax.scale_by_adam(),
                           optax.scale_by_learning_rate(lr_schedule))
    if o.name == "adamw":
        return optax.adamw(lr_schedule, weight_decay=o.weight_decay)
    raise NotImplementedError(o.name)


def make_lr_schedule(cfg, world_size: int = 1):
    s = cfg.scheduler.name
    base_lr = cfg.optimizer.lr
    if s == "none":
        return lambda step: base_lr
    if s == "cosine_warmup":
        return schedules.cosine_warmup(
            base_lr, cfg.num_epochs, cfg.batch_size * world_size,
            cfg.data.training_size, world_size)
    if s == "cosine":
        return optax.cosine_decay_schedule(base_lr, cfg.num_epochs)
    raise NotImplementedError(s)
