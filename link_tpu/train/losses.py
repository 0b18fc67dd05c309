"""Segmentation losses: masked cross-entropy + jittable Lovász-softmax.

Reference: segmentation/core/trainers.py:64-73 (loss = CE(ignore 0) +
lovasz_softmax(softmax(out), targets, ignore=0)) and the standard Berman
Lovász implementation (segmentation/core/lovasz_losses.py:156-202).

The fixed-capacity twist: padded rows are folded into the "ignored" set.
For Lovász this is exact — masked rows get error 0, sort to the tail of the
descending error list, and the Lovász gradient is a prefix property, so
trailing zero-error rows contribute nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  valid: jnp.ndarray, ignore_index: int = 0) -> jnp.ndarray:
    """Mean NLL over rows with label != ignore_index (torch
    CrossEntropyLoss(ignore_index) semantics)."""
    keep = valid & (labels != ignore_index)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(lp, safe_labels[:, None], axis=1)[:, 0]
    w = keep.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def _lovasz_grad_from_sorted(fg_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors
    (lovasz_losses.py:21-32)."""
    gts = jnp.sum(fg_sorted)
    intersection = gts - jnp.cumsum(fg_sorted)
    union = gts + jnp.cumsum(1.0 - fg_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax(probas: jnp.ndarray, labels: jnp.ndarray,
                   valid: jnp.ndarray, ignore_index: int = 0) -> jnp.ndarray:
    """classes='present' Lovász-softmax over (N, C) probabilities
    (lovasz_losses.py:174-202)."""
    n, c = probas.shape
    keep = (valid & (labels != ignore_index)).astype(jnp.float32)

    iota = jnp.arange(n, dtype=jnp.int32)

    def class_loss(cls):
        fg = ((labels == cls).astype(jnp.float32)) * keep
        errors = jnp.abs(fg - probas[:, cls]) * keep
        # dot(errors_sorted, lovasz_grad) == dot(errors, w) with
        # w = lovasz_grad routed back to input order. Both permutations
        # run as stable multi-operand sorts over STOP-GRAD values — (N,)
        # per-element gathers/scatters are scalar-row descriptor traffic
        # on TPU (~25x slower than sort payloads, round-3 train profile)
        # and AD of a sorted-gather emits one. Gradient flows only
        # through the final dot: d_errors = w, elementwise.
        neg = -jax.lax.stop_gradient(errors)
        _, fg_sorted, pos = jax.lax.sort((neg, fg, iota), num_keys=1)
        grad = _lovasz_grad_from_sorted(fg_sorted)
        _, w = jax.lax.sort((pos, grad), num_keys=1)   # w[j] = grad@rank(j)
        loss = jnp.dot(errors, w)
        present = (jnp.sum(fg) > 0).astype(jnp.float32)
        return loss * present, present

    losses, presents = jax.vmap(class_loss)(jnp.arange(c))
    return jnp.sum(losses) / jnp.maximum(jnp.sum(presents), 1.0)


def segmentation_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      valid: jnp.ndarray, ignore_index: int = 0):
    """CE + Lovász as combined in SemanticKITTITrainer._run_step."""
    ce = cross_entropy(logits, labels, valid, ignore_index)
    probas = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    lov = lovasz_softmax(probas, labels, valid, ignore_index)
    return ce + lov, {"loss_ce": ce, "loss_lovasz": lov}
