"""Segmentation losses: 0.4·CE + 0.6·soft-Dice (trainer.py:141-143).

Vectorized over classes (the reference loops classes in Python,
utils.py:43-46); numerics are identical because the per-class terms are
independent sums. All accumulation in fp32.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over all pixels; logits (B, H, W, K), labels (B, H, W) int."""
    lg = logits.astype(jnp.float32)
    return optax.softmax_cross_entropy_with_integer_labels(
        lg, labels.astype(jnp.int32)).mean()


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


def segmentation_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      num_classes: int, ce_weight: float = 0.4,
                      dice_weight: float = 0.6):
    """Returns (total, ce, dice) — the reference's training loss combo."""
    ce = cross_entropy_loss(logits, labels)
    dc = dice_loss(logits, labels, num_classes)
    return ce_weight * ce + dice_weight * dc, ce, dc
