"""Cross-validate the scipy-based hd95/dice against an independent
brute-force oracle implementing medpy's published definition.

medpy is absent from this image, so the oracle reimplements its algorithm
(medpy.metric.binary.__surface_distances: surface = mask minus its
connectivity-1 binary erosion with border_value=0; directed distances =
euclidean distance from each surface voxel of A to the nearest surface
voxel of B; hd95 = 95th percentile of both directions pooled) from first
principles: surfaces by explicit face-neighbor checks, distances by O(n^2)
pairwise search — no shared code with eval/metrics.py beyond numpy.
"""

import numpy as np
import pytest

from transception_tpu.eval.metrics import dice_coefficient, hd95, metric_per_case


def brute_surface(mask: np.ndarray) -> np.ndarray:
    """Voxels of `mask` with any face-neighbor outside the mask (array
    edges count as outside — erosion border_value=0 semantics)."""
    mask = np.asarray(mask, bool)
    surf = np.zeros_like(mask)
    it = np.ndindex(mask.shape)
    for idx in it:
        if not mask[idx]:
            continue
        on_border = False
        for ax in range(mask.ndim):
            for d in (-1, 1):
                nb = list(idx)
                nb[ax] += d
                if nb[ax] < 0 or nb[ax] >= mask.shape[ax]:
                    on_border = True
                    break
                if not mask[tuple(nb)]:
                    on_border = True
                    break
            if on_border:
                break
        surf[idx] = on_border
    return surf


def brute_hd95(a: np.ndarray, b: np.ndarray, spacing=None) -> float:
    sa = np.argwhere(brute_surface(a)).astype(np.float64)
    sb = np.argwhere(brute_surface(b)).astype(np.float64)
    if spacing is not None:
        sa = sa * np.asarray(spacing, np.float64)
        sb = sb * np.asarray(spacing, np.float64)
    d_ab = np.sqrt(((sa[:, None, :] - sb[None, :, :]) ** 2).sum(-1)).min(1)
    d_ba = np.sqrt(((sb[:, None, :] - sa[None, :, :]) ** 2).sum(-1)).min(1)
    return float(np.percentile(np.hstack((d_ab, d_ba)), 95))


def _random_blob_masks(seed, shape=(10, 12, 11)):
    rng = np.random.default_rng(seed)
    yy, xx, zz = np.mgrid[: shape[0], : shape[1], : shape[2]]
    c1 = rng.integers(2, np.asarray(shape) - 2, 3)
    c2 = c1 + rng.integers(-2, 3, 3)
    r1 = rng.integers(2, 5)
    r2 = rng.integers(2, 5)
    a = ((yy - c1[0]) ** 2 + (xx - c1[1]) ** 2 + (zz - c1[2]) ** 2) < r1 ** 2
    b = ((yy - c2[0]) ** 2 + (xx - c2[1]) ** 2 + (zz - c2[2]) ** 2) < r2 ** 2
    return a, b


@pytest.mark.parametrize("seed", range(6))
def test_hd95_matches_bruteforce_random_blobs(seed):
    a, b = _random_blob_masks(seed)
    if a.sum() == 0 or b.sum() == 0:
        pytest.skip("degenerate draw")
    assert hd95(a, b) == pytest.approx(brute_hd95(a, b), abs=1e-9)


@pytest.mark.parametrize("seed", range(3))
def test_hd95_with_anisotropic_spacing(seed):
    a, b = _random_blob_masks(100 + seed)
    if a.sum() == 0 or b.sum() == 0:
        pytest.skip("degenerate draw")
    sp = (3.0, 1.0, 1.0)  # (z, y, x) like a CT with z_spacing=3
    assert hd95(a, b, sp) == pytest.approx(brute_hd95(a, b, sp), abs=1e-9)


def test_hd95_analytic_shifted_boxes():
    """Two identical 3x3x3 cubes shifted by 4 voxels along z: every surface
    voxel's nearest counterpart is the same cube shifted, so all directed
    distances are <= 4 with 95th percentile exactly 4."""
    a = np.zeros((12, 5, 5), bool)
    b = np.zeros((12, 5, 5), bool)
    a[1:4, 1:4, 1:4] = True
    b[5:8, 1:4, 1:4] = True
    # max directed distance = 4 (z-offset); both surfaces congruent.
    assert hd95(a, b) == pytest.approx(brute_hd95(a, b), abs=1e-9)
    assert hd95(a, b) <= 4.0 + 1e-9


def test_hd95_identical_masks_is_zero():
    a, _ = _random_blob_masks(7)
    assert hd95(a, a.copy()) == 0.0


def test_dice_analytic():
    a = np.zeros((4, 4), bool)
    b = np.zeros((4, 4), bool)
    a[:2] = True   # 8 voxels
    b[1:3] = True  # 8 voxels, overlap 4
    assert dice_coefficient(a, b) == pytest.approx(2 * 4 / 16)


def test_metric_per_case_empty_conventions():
    """utils.py:50-60: (1,0) if pred>0 & gt==0; (0,0) if pred empty."""
    full = np.ones((3, 3, 3))
    empty = np.zeros((3, 3, 3))
    assert metric_per_case(full, empty) == (1.0, 0.0)
    assert metric_per_case(empty, full) == (0.0, 0.0)
    assert metric_per_case(empty, empty) == (0.0, 0.0)


def test_metric_per_case_spacing_passthrough():
    a, b = _random_blob_masks(3)
    if a.sum() == 0 or b.sum() == 0:
        pytest.skip("degenerate draw")
    d_iso, h_iso = metric_per_case(a, b)
    d_mm, h_mm = metric_per_case(a, b, spacing=(3.0, 1.0, 1.0))
    assert d_iso == d_mm  # dice is spacing-free
    assert h_mm == pytest.approx(brute_hd95(a, b, (3.0, 1.0, 1.0)), abs=1e-9)
    assert h_iso == pytest.approx(brute_hd95(a, b), abs=1e-9)
