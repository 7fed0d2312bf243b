"""Loss and metric tests.

Dice loss is validated against a direct per-class Python-loop
reimplementation of the reference formula (utils.py:24-47); HD95 against
brute-force surface distances on canned masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transception_tpu.eval.metrics import dice_coefficient, hd95, metric_per_case
from transception_tpu.train.losses import (
    cross_entropy_loss,
    dice_loss,
    segmentation_loss,
)


def _reference_dice(logits, labels, n_classes, smooth=1e-5):
    """Per-class loop, mirroring utils.py:24-47 in numpy."""
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    probs = np.asarray(probs, np.float64)
    onehot = np.eye(n_classes)[np.asarray(labels)]
    loss = 0.0
    for i in range(n_classes):
        score, target = probs[..., i], onehot[..., i]
        intersect = (score * target).sum()
        z, y = (score * score).sum(), (target * target).sum()
        loss += 1 - (2 * intersect + smooth) / (z + y + smooth)
    return loss / n_classes


def test_dice_loss_matches_reference_formula():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 8, 8, 9)).astype(np.float32)
    labels = rng.integers(0, 9, (2, 8, 8))
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels), 9))
    want = _reference_dice(logits, labels, 9)
    assert abs(got - want) < 1e-5


def test_dice_loss_perfect_prediction_near_zero():
    labels = np.zeros((1, 4, 4), np.int32)
    labels[0, :2] = 1
    logits = np.full((1, 4, 4, 3), -50.0, np.float32)
    for c in range(3):
        logits[..., c] = np.where(labels == c, 50.0, -50.0)
    loss = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels), 3))
    # Classes present are perfect; the absent class contributes ~0 via smooth.
    assert loss < 0.35


def test_segmentation_loss_weights():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 9)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 9, (2, 4, 4)))
    total, ce, dc = segmentation_loss(logits, labels, 9, 0.4, 0.6)
    assert abs(float(total) - (0.4 * float(ce) + 0.6 * float(dc))) < 1e-6


def test_ce_matches_manual():
    logits = jnp.asarray([[[[2.0, 0.0, -1.0]]]])
    labels = jnp.asarray([[[0]]])[..., 0]
    got = float(cross_entropy_loss(logits, labels.reshape(1, 1, 1)))
    p = np.exp([2.0, 0.0, -1.0])
    want = -np.log(p[0] / p.sum())
    assert abs(got - want) < 1e-6


def test_dice_coefficient_basic():
    a = np.zeros((8, 8), bool)
    b = np.zeros((8, 8), bool)
    a[2:6, 2:6] = True
    b[2:6, 2:6] = True
    assert dice_coefficient(a, b) == 1.0
    b[:] = False
    b[2:6, 2:4] = True
    assert abs(dice_coefficient(a, b) - 2 * 8 / (16 + 8)) < 1e-9


def test_hd95_known_distance():
    a = np.zeros((32, 32), bool)
    b = np.zeros((32, 32), bool)
    a[10:20, 10:20] = True
    b[10:20, 13:23] = True  # shifted 3 right
    d = hd95(a, b)
    assert 2.0 <= d <= 3.5  # 95th pct of surface distances for 3px shift


def test_metric_per_case_empty_conventions():
    empty = np.zeros((4, 4), bool)
    full = np.ones((4, 4), bool)
    assert metric_per_case(full, empty) == (1.0, 0.0)  # utils.py:57-58
    assert metric_per_case(empty, full) == (0.0, 0.0)
    assert metric_per_case(empty, empty) == (0.0, 0.0)


def test_hd95_identical_masks_zero():
    a = np.zeros((16, 16), bool)
    a[4:12, 4:12] = True
    assert hd95(a, a) == 0.0
