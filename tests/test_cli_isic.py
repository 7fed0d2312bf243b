"""CLI + ISIC pipeline tests (synthetic data; tiny shapes)."""

import os

import numpy as np
import pytest

from conftest import tiny_config


def test_isic_synthetic_pipeline():
    from transception_tpu.data.isic import SyntheticISICDataset
    ds = SyntheticISICDataset(length=4, img_size=64)
    item = ds.get(0, np.random.default_rng(0))
    assert item["image"].shape == (64, 64, 3)
    assert set(np.unique(item["label"])).issubset({0, 1})


def test_isic_dice_eval_runs():
    import jax
    import jax.numpy as jnp
    from transception_tpu.data.isic import SyntheticISICDataset, dice_eval
    from transception_tpu.models.transception import MSTransception

    cfg = tiny_config(num_classes=2)
    model = MSTransception(cfg)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    ds = SyntheticISICDataset(length=4, img_size=32)
    d = dice_eval(model, v, ds, img_size=32, batch=2, log=None)
    assert 0.0 <= d <= 1.0


def test_isic_eval_protocol_auditable(tmp_path):
    """VERDICT r2 #8: the ISIC eval must be as auditable as the Synapse
    path — per-case dice/iou log lines, an aggregate line, and optional
    prediction export; the logged dice must equal an independent
    recomputation from the exported prediction masks."""
    import jax
    import jax.numpy as jnp
    from transception_tpu.data.isic import SyntheticISICDataset, dice_eval
    from transception_tpu.models.transception import MSTransception

    cfg = tiny_config(num_classes=2)
    model = MSTransception(cfg)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    ds = SyntheticISICDataset(length=3, img_size=32)
    lines = []
    save = tmp_path / "preds"
    d = dice_eval(model, v, ds, img_size=32, batch=2, log=lines.append,
                  save_path=str(save))
    case_lines = [ln for ln in lines if ln.startswith("case ")]
    assert len(case_lines) == 3
    assert all("dice" in ln and "iou" in ln for ln in case_lines)
    assert any(ln.startswith("ISIC eval: mean_dice") and "mean_iou" in ln
               for ln in lines)
    # exported masks exist and reproduce the logged per-case dice
    from PIL import Image
    from transception_tpu.eval.metrics import dice_coefficient
    rng = np.random.default_rng(0)
    for i, ln in enumerate(case_lines):
        name = ln.split()[1]
        logged = float(ln.split()[3])
        mask = np.asarray(Image.open(save / f"{name}_pred.png")) > 127
        gt = ds.get(i, rng)["label"] > 0
        np.testing.assert_allclose(dice_coefficient(mask, gt), logged,
                                   atol=1e-6)
    assert 0.0 <= d <= 1.0


def test_isic_argmax_equals_threshold_convention():
    """For a 2-class head, argmax over logits == p(lesion) > 0.5 — the
    documented ISIC threshold convention."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 8, 8, 2)), jnp.float32)
    by_argmax = np.asarray(jnp.argmax(logits, -1))
    prob = np.asarray(jnp.exp(logits[..., 1]) /
                      (jnp.exp(logits[..., 0]) + jnp.exp(logits[..., 1])))
    by_threshold = (prob > 0.5).astype(np.int64)
    np.testing.assert_array_equal(by_argmax, by_threshold)


def test_isic_raw_layout(tmp_path):
    from PIL import Image
    from transception_tpu.data.isic import ISICDataset
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("ISIC_0000000", "ISIC_0000001"):
        Image.fromarray(
            (rng.random((80, 100, 3)) * 255).astype(np.uint8)).save(
            img_dir / f"{name}.jpg")
        Image.fromarray(
            (rng.random((80, 100)) > 0.5).astype(np.uint8) * 255).save(
            mask_dir / f"{name}_segmentation.png")
    ds = ISICDataset(str(img_dir), str(mask_dir), img_size=64, augment=True)
    assert len(ds) == 2
    item = ds.get(0, np.random.default_rng(1))
    assert item["image"].shape == (64, 64, 3)
    assert item["label"].shape == (64, 64)


def test_isic_preprocessed_layout(tmp_path):
    from transception_tpu.data.isic import ISICPreprocessedDataset
    rng = np.random.default_rng(0)
    path = tmp_path / "isic_train.npz"
    np.savez(path,
             image=rng.random((3, 96, 96, 3)).astype(np.float32),
             label=(rng.random((3, 96, 96)) > 0.5).astype(np.float32))
    ds = ISICPreprocessedDataset(str(path), img_size=64, augment=True)
    assert len(ds) == 3
    item = ds.get(1, np.random.default_rng(1))
    assert item["image"].shape == (64, 64, 3)
    assert set(np.unique(item["label"])).issubset({0, 1})


def test_dataset_factory_isic_positive(tmp_path):
    from PIL import Image
    from transception_tpu.core.config import DataConfig
    from transception_tpu.data.isic import ISICDataset
    from transception_tpu.data.synapse import make_train_dataset
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        tmp_path / "images" / "ISIC_0.jpg")
    Image.fromarray(np.zeros((32, 32), np.uint8)).save(
        tmp_path / "masks" / "ISIC_0_segmentation.png")
    cfg = DataConfig(dataset="isic", root_path=str(tmp_path), img_size=32,
                     num_classes=2)
    ds = make_train_dataset(cfg)
    assert isinstance(ds, ISICDataset)
    assert len(ds) == 1


def test_dataset_factory_isic_fallback():
    from transception_tpu.core.config import DataConfig
    from transception_tpu.data.isic import SyntheticISICDataset
    from transception_tpu.data.synapse import make_test_dataset, make_train_dataset
    cfg = DataConfig(dataset="isic", root_path="/nonexistent",
                     test_path="/nonexistent", img_size=32, num_classes=2)
    assert isinstance(make_train_dataset(cfg), SyntheticISICDataset)
    assert isinstance(make_test_dataset(cfg), SyntheticISICDataset)


def test_cli_configs_roundtrip():
    """CLI flags -> configs (br_config mapping, ISIC class override)."""
    import argparse
    from transception_tpu.cli.common import (
        add_data_args,
        add_model_args,
        add_train_args,
        build_configs,
    )
    p = argparse.ArgumentParser()
    add_model_args(p)
    add_data_args(p)
    add_train_args(p)
    args = p.parse_args(["--br_config", "3", "--dataset", "ISIC",
                         "--batch_size", "30"])
    mcfg, dcfg, tcfg = build_configs(args)
    assert mcfg.br_ch_att_list == (False, True, False, True)
    assert mcfg.num_classes == 2 and dcfg.num_classes == 2
    assert tcfg.scaled_lr() == pytest.approx(0.05 * 30 / 24)
    assert tcfg.eval_device_resample is False
    args = p.parse_args(["--dataset", "Synapse", "--eval_device_resample"])
    assert build_configs(args)[2].eval_device_resample is True


def test_cli_train_smoke(tmp_path):
    """End-to-end: the train CLI on synthetic data for 2 steps."""
    from transception_tpu.cli.train import main
    state, hist = main([
        "--dataset", "synthetic", "--img_size", "32", "--batch_size", "4",
        "--max_epochs", "1", "--eval_interval", "1",
        "--output_dir", str(tmp_path), "--max_steps", "2",
        "--dtype", "float32", "--no_pallas", "--dp_size", "1",
        "--num_layers", "1,1,1", "--num_path", "2,2,2",
        "--stage1_layers", "1",
    ])
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / "log.txt")


def test_cli_train_smoke_eval_device_resample(tmp_path):
    """--eval_device_resample routes the in-training eval through the
    on-device operator-matmul resample end-to-end."""
    from transception_tpu.cli.train import main
    state, hist = main([
        "--dataset", "synthetic", "--img_size", "32", "--batch_size", "4",
        "--max_epochs", "1", "--eval_interval", "1",
        "--output_dir", str(tmp_path), "--max_steps", "1",
        "--dtype", "float32", "--no_pallas", "--dp_size", "1",
        "--num_layers", "1,1,1", "--num_path", "2,2,2",
        "--stage1_layers", "1", "--eval_device_resample",
    ])
    assert int(state.step) == 1
    assert len(hist["dice"]) == 1  # the eval actually ran
