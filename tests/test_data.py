"""Data pipeline tests: determinism, sharding, augmentation sanity."""

import numpy as np
import pytest

from transception_tpu.data.augment import (
    augment_slice,
    normalize_image,
    random_generator_augment,
    zoom_to,
)
from transception_tpu.data.loader import HostDataLoader
from transception_tpu.data.synapse import (
    SyntheticSliceDataset,
    SyntheticVolumeDataset,
)


def test_synthetic_slice_shapes():
    ds = SyntheticSliceDataset(length=10, img_size=64)
    item = ds.get(0, np.random.default_rng(0))
    assert item["image"].shape == (64, 64, 1)
    assert item["label"].shape == (64, 64)
    assert item["label"].dtype == np.int32


def test_loader_deterministic_across_restarts():
    ds = SyntheticSliceDataset(length=32, img_size=32, augment=True)
    def first_batch():
        dl = HostDataLoader(ds, batch_size=8, seed=7, num_workers=2)
        dl.set_epoch(3)
        return next(iter(dl))
    b1, b2 = first_batch(), first_batch()
    np.testing.assert_array_equal(b1["image"], b2["image"])
    np.testing.assert_array_equal(b1["label"], b2["label"])


def test_loader_host_sharding_partitions_batch():
    ds = SyntheticSliceDataset(length=32, img_size=32)
    full = next(iter(HostDataLoader(ds, 8, shuffle=False, num_workers=1)))
    h0 = next(iter(HostDataLoader(ds, 8, shuffle=False, num_workers=1,
                                  process_index=0, process_count=2)))
    h1 = next(iter(HostDataLoader(ds, 8, shuffle=False, num_workers=1,
                                  process_index=1, process_count=2)))
    assert h0["image"].shape[0] == 4 and h1["image"].shape[0] == 4
    np.testing.assert_array_equal(
        np.concatenate([h0["image"], h1["image"]]), full["image"])


def test_loader_epoch_reshuffles():
    ds = SyntheticSliceDataset(length=64, img_size=32)
    dl = HostDataLoader(ds, 16, seed=1, num_workers=1)
    dl.set_epoch(0)
    a = next(iter(dl))["case_name"]
    dl.set_epoch(1)
    b = next(iter(dl))["case_name"]
    assert a != b


def test_augment_preserves_label_values():
    rng = np.random.default_rng(0)
    img = rng.random((96, 96)).astype(np.float32)
    lbl = rng.integers(0, 9, (96, 96)).astype(np.float32)
    for seed in range(8):
        ai, al = augment_slice(img, lbl, np.random.default_rng(seed))
        assert ai.shape == img.shape
        assert al.shape == lbl.shape
        assert set(np.unique(al)).issubset(set(np.unique(lbl)) | {0.0})


def test_zoom_to_resizes_and_label_stays_integer():
    img = np.random.default_rng(0).random((100, 120)).astype(np.float32)
    lbl = np.random.default_rng(1).integers(0, 9, (100, 120)).astype(np.float32)
    zi, zl = zoom_to(img, lbl, 64)
    assert zi.shape == (64, 64) and zl.shape == (64, 64)
    assert np.allclose(zl, np.round(zl))


def test_normalize_range():
    img = np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4)
    out = normalize_image(img)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


def test_random_generator_augment_runs():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32))
    lbl = rng.integers(0, 3, (32, 32)).astype(float)
    ai, al = random_generator_augment(img, lbl, rng)
    assert ai.shape == (32, 32)


def test_loader_early_break_shuts_down_cleanly():
    """Breaking mid-epoch must not leave producer threads alive."""
    import threading
    ds = SyntheticSliceDataset(length=64, img_size=32)
    before = threading.active_count()
    for _ in range(5):
        it = iter(HostDataLoader(ds, 8, num_workers=2, prefetch=1))
        next(it)
        it.close()
    import time
    time.sleep(1.0)
    assert threading.active_count() <= before + 2


def test_synthetic_volume():
    ds = SyntheticVolumeDataset(length=2, hw=64)
    v = ds.get(0)
    assert v["image"].ndim == 3
    assert v["image"].shape[1:] == (64, 64)
