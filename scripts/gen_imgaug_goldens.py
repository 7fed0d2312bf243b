"""Generate cross-library golden fixtures for the augmentation port.

Run this OFFLINE in an environment that has imgaug installed (it is not in
the TPU image). For each op of the reference pipeline
(dataset_synapse.py:84-95) it:

  1. draws the op's random parameters,
  2. runs the real imgaug augmenter with those parameters on a fixed
     (image, one-hot segmap) pair, exactly like augment_seg
     (dataset_synapse.py:27-36),
  3. records input, parameters (as a replayable draw list), imgaug output,
     and a tolerance,

into tests/golden/imgaug/*.npz. tests/test_augment_properties.py
::test_imgaug_goldens then asserts the numpy port reproduces the outputs.

Usage:  python scripts/gen_imgaug_goldens.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

try:
    import imgaug.augmenters as iaa
    from imgaug.augmentables.segmaps import SegmentationMapsOnImage
except ImportError:
    sys.exit("imgaug is required to generate goldens (pip install imgaug)")


OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden", "imgaug")


def _fixture():
    rng = np.random.default_rng(0)
    img = rng.random((64, 64)).astype(np.float32)
    lbl = rng.integers(0, 9, (64, 64)).astype(np.int32)
    return img, lbl


def _apply_imgaug(aug, img, lbl):
    det = aug.to_deterministic()
    segmap = SegmentationMapsOnImage(lbl.astype(np.int32), shape=img.shape)
    out_img = det.augment_image(img)
    out_lbl = det.augment_segmentation_maps(segmap).get_arr()
    return out_img, out_lbl.astype(np.float32)


def main():
    os.makedirs(OUT, exist_ok=True)
    img, lbl = _fixture()

    # (name of transception_tpu.data.augment fn, imgaug augmenter factory,
    #  replay draws for the numpy port, atol)
    cases = [
        ("aug_flipud", lambda: iaa.Flipud(1.0), [0.0], 1e-6),
        ("aug_fliplr", lambda: iaa.Fliplr(1.0), [0.0], 1e-6),
        ("aug_gaussian_blur", lambda: iaa.GaussianBlur(sigma=1.0), [], 2e-2),
        ("aug_linear_contrast",
         lambda: iaa.LinearContrast(1.3), [(1.3 - 0.5) / 1.0], 1e-5),
        ("aug_affine_rotate",
         lambda: iaa.Affine(rotate=25.0, order=1),
         [(25.0 + 40.0) / 80.0], 5e-2),
        ("aug_affine_shear",
         lambda: iaa.Affine(shear=10.0, order=1),
         [(10.0 + 16.0) / 32.0], 5e-2),
        ("aug_affine_translate",
         lambda: iaa.Affine(translate_percent={"y": 0.1, "x": -0.05},
                            order=1),
         [(0.1 + 0.2) / 0.4, (-0.05 + 0.2) / 0.4], 5e-2),
        ("aug_affine_scale",
         lambda: iaa.Affine(scale={"x": 1.5, "y": 0.8}, order=1),
         [(1.5 - 0.5) / 1.5, (0.8 - 0.5) / 1.5], 5e-2),
    ]

    for name, make_aug, draws, atol in cases:
        out_img, out_lbl = _apply_imgaug(make_aug(), img, lbl.astype(np.float32))
        np.savez(
            os.path.join(OUT, f"{name}.npz"),
            op=name, img=img, lbl=lbl.astype(np.float32),
            out_img=out_img, out_lbl=out_lbl,
            draws=np.asarray(draws, np.float64), atol=atol)
        print(f"wrote {name}.npz")

    print(f"goldens in {OUT}; run pytest tests/test_augment_properties.py"
          "::test_imgaug_goldens")


if __name__ == "__main__":
    main()
