"""Volume evaluation metrics: binary Dice (DSC) and 95% Hausdorff (HD95).

medpy is not available in this image, so HD95 is implemented directly with
scipy distance transforms using medpy's definition (95th percentile of the
pooled directed surface distances, surfaces via connectivity-1 erosion).
The (1,0)/(0,0) empty-mask conventions follow utils.py:50-60.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import ndimage


def dice_coefficient(pred: np.ndarray, gt: np.ndarray) -> float:
    """Binary Dice: 2|A∩B| / (|A| + |B|)."""
    pred = np.asarray(pred, bool)
    gt = np.asarray(gt, bool)
    denom = pred.sum() + gt.sum()
    if denom == 0:
        return 0.0
    return float(2.0 * np.logical_and(pred, gt).sum() / denom)


def _surface(mask: np.ndarray) -> np.ndarray:
    """Border voxels: mask minus its connectivity-1 erosion."""
    struct = ndimage.generate_binary_structure(mask.ndim, 1)
    eroded = ndimage.binary_erosion(mask, structure=struct, iterations=1)
    return mask & ~eroded


def _directed_surface_distances(a: np.ndarray, b: np.ndarray,
                                spacing=None) -> np.ndarray:
    """Distances from surface voxels of `a` to the surface of `b`."""
    sa = _surface(a)
    sb = _surface(b)
    dt = ndimage.distance_transform_edt(~sb, sampling=spacing)
    return dt[sa]


def hd95(pred: np.ndarray, gt: np.ndarray, spacing=None) -> float:
    """95th percentile of the pooled symmetric surface distances."""
    pred = np.asarray(pred, bool)
    gt = np.asarray(gt, bool)
    if pred.sum() == 0 or gt.sum() == 0:
        return 0.0
    d1 = _directed_surface_distances(pred, gt, spacing)
    d2 = _directed_surface_distances(gt, pred, spacing)
    return float(np.percentile(np.hstack((d1, d2)), 95))


def metric_per_case(pred: np.ndarray, gt: np.ndarray,
                    spacing=None) -> Tuple[float, float]:
    """(dice, hd95) with the reference's empty-mask conventions
    (utils.py:50-60): pred>0 & gt==0 -> (1, 0); both empty/pred empty -> (0,0).

    spacing: optional per-axis voxel spacing for hd95 in physical units,
    e.g. (z_spacing, 1, 1) for a (D, H, W) volume. The reference's
    published protocol calls medpy hd95 with NO spacing (utils.py:54) —
    pass None for protocol parity."""
    pred = np.asarray(pred) > 0
    gt = np.asarray(gt) > 0
    if pred.sum() > 0 and gt.sum() > 0:
        return dice_coefficient(pred, gt), hd95(pred, gt, spacing)
    if pred.sum() > 0 and gt.sum() == 0:
        return 1.0, 0.0
    return 0.0, 0.0
