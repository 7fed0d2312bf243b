"""Segmentation losses: 0.4·CE + 0.6·soft-Dice (trainer.py:141-143).

Vectorized over classes (the reference loops classes in Python,
utils.py:43-46); numerics are identical because the per-class terms are
independent sums. All accumulation in fp32.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over all pixels; logits (B, H, W, K), labels (B, H, W) int.

    Computed as -sum(one_hot * log_softmax) rather than the integer-label
    gather: per-pixel class gathers serialize on TPU (measured 17.8 ms of
    a 143 ms train step at bs=24), the one-hot contraction is a fused
    multiply+reduce. Same value (one_hot picks out logp[label])."""
    lg = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(lg, axis=-1)
    onehot = jax.nn.one_hot(labels, lg.shape[-1], dtype=jnp.float32)
    return -jnp.sum(onehot * logp, axis=-1).mean()


def dice_loss(logits: jnp.ndarray, labels: jnp.ndarray,
              num_classes: int, weight: Optional[Sequence[float]] = None,
              apply_softmax: bool = True, smooth: float = 1e-5) -> jnp.ndarray:
    """Soft Dice, per-class over the whole batch, averaged over classes
    (utils.py:24-47, smooth 1e-5, classes include background)."""
    p = logits.astype(jnp.float32)
    if apply_softmax:
        p = jax.nn.softmax(p, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    # Sum over batch and spatial dims, per class.
    axes = tuple(range(p.ndim - 1))
    intersect = jnp.sum(p * onehot, axis=axes)
    z = jnp.sum(p * p, axis=axes)
    y = jnp.sum(onehot, axis=axes)  # onehot**2 == onehot
    dice = (2.0 * intersect + smooth) / (z + y + smooth)
    per_class = 1.0 - dice
    if weight is not None:
        per_class = per_class * jnp.asarray(weight, jnp.float32)
    return per_class.mean()


def shuffle_labels_wide(labels: jnp.ndarray, p: int = 4) -> jnp.ndarray:
    """Permute (B, H, W) integer labels into the wide-head token order
    (B, (H/p)·(W/p), p²): wide logit (n, q) with n = h·(W/p) + w and
    q = p1·p + p2 is output pixel (h·p + p1, w·p + p2) — the inverse of
    the FinalPatchExpand pixel shuffle ('b (h w) (p1 p2 c)'). CE and Dice
    reduce over all pixels, so loss(wide_logits, wide_labels) equals
    loss(logits, labels) up to fp32 reduction order; the labels carry no
    gradient, so this transpose is the cheap side of the commute
    (models/decoder.py DecoderLayer.wide_head)."""
    B, H, W = labels.shape
    h, w = H // p, W // p
    return labels.reshape(B, h, p, w, p).transpose(0, 1, 3, 2, 4) \
        .reshape(B, h * w, p * p)


def segmentation_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      num_classes: int, ce_weight: float = 0.4,
                      dice_weight: float = 0.6):
    """Returns (total, ce, dice) — the reference's training loss combo.

    One-hot and softmax are computed once and shared between the two
    terms (softmax = exp(log_softmax); identical values)."""
    lg = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(lg, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    ce = -jnp.sum(onehot * logp, axis=-1).mean()

    p = jnp.exp(logp)
    axes = tuple(range(p.ndim - 1))
    intersect = jnp.sum(p * onehot, axis=axes)
    z = jnp.sum(p * p, axis=axes)
    y = jnp.sum(onehot, axis=axes)
    dice = (2.0 * intersect + 1e-5) / (z + y + 1e-5)
    dc = (1.0 - dice).mean()
    return ce_weight * ce + dice_weight * dc, ce, dc
