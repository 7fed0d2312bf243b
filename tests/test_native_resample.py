"""Native threaded resampler: bit-exactness vs scipy.ndimage.zoom.

The eval protocol's numbers depend on scipy's exact conventions (including
its coordinate-rounding cval artifact at some size ratios); the native
path must be indistinguishable. Skipped when no C toolchain is available.
"""

import numpy as np
import pytest
from scipy import ndimage

from transception_tpu.native import get_lib, zoom2d_batch

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C toolchain / native lib")


@pytest.mark.parametrize("shape,out_hw,order", [
    ((3, 512, 512), (224, 224), 3),   # the Synapse eval downsample
    ((3, 224, 224), (512, 512), 0),   # prediction back-map
    ((2, 64, 64), (224, 224), 3),     # upsample
    ((2, 100, 120), (224, 224), 3),   # non-square
    ((2, 224, 224), (147, 189), 0),
    ((1, 224, 224), (224, 224), 3),   # identity ratio
    ((2, 31, 57), (13, 224), 3),      # odd ratios both directions
])
def test_bit_exact_vs_scipy(shape, out_hw, order):
    rng = np.random.default_rng(0)
    vol = rng.random(shape).astype(np.float32)
    if order == 0:
        vol = np.round(vol * 8)
    got = zoom2d_batch(vol, *out_hw, order)
    want = np.stack([
        ndimage.zoom(vol[i], (out_hw[0] / shape[1], out_hw[1] / shape[2]),
                     order=order)
        for i in range(shape[0])])
    np.testing.assert_array_equal(got, want)


def test_threads_deterministic():
    vol = np.random.default_rng(1).random((8, 128, 128)).astype(np.float32)
    a = zoom2d_batch(vol, 224, 224, 3, threads=1)
    b = zoom2d_batch(vol, 224, 224, 3, threads=8)
    np.testing.assert_array_equal(a, b)


def test_inference_path_uses_native():
    from transception_tpu.eval.inference import (
        _resize_pred_back,
        _resize_slices_scipy,
    )
    vol = np.random.default_rng(2).random((4, 100, 100)).astype(np.float32)
    got = _resize_slices_scipy(vol, 64)
    want = np.stack([ndimage.zoom(vol[i], (0.64, 0.64), order=3)
                     for i in range(4)])
    np.testing.assert_allclose(got, want, atol=1e-6)
    pred = np.random.default_rng(3).integers(0, 9, (4, 64, 64)).astype(np.int32)
    back = _resize_pred_back(pred, 100, 100)
    want = np.stack([ndimage.zoom(pred[i], (100 / 64, 100 / 64), order=0)
                     for i in range(4)])
    np.testing.assert_array_equal(back, want)
