"""Synapse multi-organ CT datasets (datasets/dataset_synapse.py:75-128).

Train split: {case}_sliceNNN.npz files with 'image'/'label' (H, W) arrays,
augmented + zoomed to img_size. Test split: {case}.npy.h5 whole volumes.
Synthetic variants generate deterministic random data with the same shapes
for environments without the dataset (tests, benchmarks).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from transception_tpu.data.augment import augment_slice, normalize_image, zoom_to


def read_list(list_dir: str, split: str) -> List[str]:
    path = os.path.join(list_dir, f"{split}.txt")
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


class SynapseSliceDataset:
    """Training slices (dataset_synapse.py:102-112)."""

    def __init__(self, base_dir: str, list_dir: str, img_size: int = 224,
                 augment: bool = True, split: str = "train"):
        self.base_dir = base_dir
        self.img_size = img_size
        self.augment = augment
        self.samples = read_list(list_dir, split)

    def __len__(self):
        return len(self.samples)

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        name = self.samples[idx]
        data = np.load(os.path.join(self.base_dir, name + ".npz"))
        image = np.asarray(data["image"], np.float32)
        label = np.asarray(data["label"], np.float32)
        if self.augment:
            image, label = augment_slice(image, label, rng)
        image, label = zoom_to(image, label, self.img_size)
        return {
            "image": normalize_image(image)[..., None],  # (H, W, 1)
            "label": label.astype(np.int32),
            "case_name": name,
        }


class SynapseVolumeDataset:
    """Test volumes (dataset_synapse.py:114-118): {case}.npy.h5 with
    'image'/'label' (D, H, W)."""

    def __init__(self, base_dir: str, list_dir: str, split: str = "test_vol"):
        self.base_dir = base_dir
        self.samples = read_list(list_dir, split)

    def __len__(self):
        return len(self.samples)

    def get(self, idx: int) -> Dict[str, np.ndarray]:
        import h5py
        name = self.samples[idx]
        path = os.path.join(self.base_dir, f"{name}.npy.h5")
        with h5py.File(path, "r") as f:
            image = np.asarray(f["image"][:], np.float32)
            label = np.asarray(f["label"][:], np.float32)
        return {"image": image, "label": label, "case_name": name}


class SyntheticSliceDataset:
    """Deterministic random slices with Synapse-like statistics, for tests
    and throughput benchmarks when no dataset is mounted."""

    def __init__(self, length: int = 2211, img_size: int = 224,
                 num_classes: int = 9, raw_size: int = 512,
                 augment: bool = False):
        self.length = length
        self.img_size = img_size
        self.num_classes = num_classes
        self.raw_size = raw_size
        self.augment = augment

    def __len__(self):
        return self.length

    def get(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        g = np.random.default_rng(idx)
        image = g.random((self.img_size, self.img_size), np.float32)
        label = g.integers(0, self.num_classes,
                           (self.img_size, self.img_size)).astype(np.float32)
        if self.augment:
            image, label = augment_slice(image, label, rng)
            image, label = zoom_to(image, label, self.img_size)
        return {
            "image": normalize_image(image)[..., None],
            "label": label.astype(np.int32),
            "case_name": f"synthetic_{idx:05d}",
        }


class SyntheticVolumeDataset:
    """Deterministic random volumes (D varies per case like real Synapse)."""

    def __init__(self, length: int = 2, hw: int = 512, num_classes: int = 9):
        self.length = length
        self.hw = hw
        self.num_classes = num_classes

    def __len__(self):
        return self.length

    def get(self, idx: int) -> Dict[str, np.ndarray]:
        g = np.random.default_rng(1000 + idx)
        d = int(g.integers(16, 24))
        image = g.random((d, self.hw, self.hw), np.float32)
        label = g.integers(0, self.num_classes,
                           (d, self.hw, self.hw)).astype(np.float32)
        return {"image": image, "label": label,
                "case_name": f"synthetic_vol_{idx}"}


def _make_isic(path: str, img_size: int, augment: bool):
    from transception_tpu.data.isic import (
        ISICDataset,
        ISICPreprocessedDataset,
        SyntheticISICDataset,
    )
    if path.endswith((".npz", ".npy")) and os.path.exists(path):
        return ISICPreprocessedDataset(path, img_size, augment)
    if os.path.isdir(path):
        # Official layout: <root>/images + <root>/masks, or the ISIC dir
        # names (Task1-2_Training_Input / Task1_Training_GroundTruth).
        for img_sub, mask_sub in (
                ("images", "masks"),
                ("ISIC2018_Task1-2_Training_Input",
                 "ISIC2018_Task1_Training_GroundTruth")):
            i, m = os.path.join(path, img_sub), os.path.join(path, mask_sub)
            if os.path.isdir(i) and os.path.isdir(m):
                return ISICDataset(i, m, img_size, augment)
    return SyntheticISICDataset(img_size=img_size, augment=augment)


def make_train_dataset(cfg) -> object:
    """DataConfig -> dataset; falls back to synthetic when files absent."""
    if cfg.dataset == "isic":
        return _make_isic(cfg.root_path, cfg.img_size, cfg.augment)
    if cfg.dataset == "synthetic" or not os.path.isdir(cfg.root_path):
        return SyntheticSliceDataset(length=cfg.synthetic_len,
                                     img_size=cfg.img_size,
                                     num_classes=cfg.num_classes,
                                     augment=cfg.augment)
    return SynapseSliceDataset(cfg.root_path, cfg.list_dir,
                               img_size=cfg.img_size, augment=cfg.augment)


def make_test_dataset(cfg) -> object:
    if cfg.dataset == "isic":
        return _make_isic(cfg.test_path, cfg.img_size, augment=False)
    if cfg.dataset == "synthetic" or not os.path.isdir(cfg.test_path):
        return SyntheticVolumeDataset(num_classes=cfg.num_classes)
    return SynapseVolumeDataset(cfg.test_path, cfg.list_dir)
