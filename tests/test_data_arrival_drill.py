"""Offline "data-arrival drill" (VERDICT r3 #6): exercise the full
prepare → train → convert → eval chain on DISK-REAL files, never touching
the synthetic fallback, so the day real Synapse data arrives nothing in
the pipeline is untested.

Chain under test (reference counterparts in parens):
  1. scripts/prepare_synapse.py --from-raw on a synthesized raw NIfTI
     layout (TransUNet preprocessing: HU clip + min-max + 13→9 label
     remap) → train_npz/ + test_vol_h5/ on disk.
  2. cli/train.py on the produced npz slices (trainer.py:72-230) — real
     SynapseSliceDataset, imgaug-port augmentation on, finite losses.
  3. A random-init reference .pth converted by the torch2flax converter
     (test.py:185-187 load path).
  4. cli/test.py --is_savenii over the produced .npy.h5 volumes
     (test.py:104-123 + utils.py:100-109) — finite DSC/HD95, valid
     .nii.gz round-trip.

Marked slow: includes a full-size (224²) CPU eval compile for the
converted reference weights.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from reference_shim import load_reference_mstr  # noqa: E402

mstr = load_reference_mstr()


def _make_raw_dataset(raw_dir):
    """Synthesize the raw challenge layout: img/label NIfTI pairs for
    every case in lists/lists_Synapse (imgXXXX.nii.gz, HU-ish values;
    labelXXXX.nii.gz, raw 13-organ ids)."""
    import prepare_synapse as prep
    from transception_tpu.eval.nifti import save_nifti

    os.makedirs(raw_dir, exist_ok=True)
    cases = sorted({n.split("_")[0] for n in prep.read_list("train")})
    cases += prep.read_list("test_vol")
    rng = np.random.default_rng(0)
    for case in cases:
        num = case.replace("case", "")
        img = rng.normal(50.0, 200.0, (3, 48, 48)).astype(np.float32)
        lbl = rng.choice([0, 1, 6, 8, 11], (3, 48, 48),
                         p=[0.6, 0.1, 0.1, 0.1, 0.1]).astype(np.float32)
        save_nifti(os.path.join(raw_dir, f"img{num}.nii.gz"), img,
                   (1.0, 1.0, 1.0))
        save_nifti(os.path.join(raw_dir, f"label{num}.nii.gz"), lbl,
                   (1.0, 1.0, 1.0))
    return cases


@pytest.mark.slow
@pytest.mark.skipif(mstr is None,
                    reason="reference model not importable in this env")
def test_data_arrival_drill(tmp_path):
    import prepare_synapse as prep

    raw = str(tmp_path / "raw")
    out = str(tmp_path / "synapse")
    _make_raw_dataset(raw)
    prep.from_raw(raw, out)

    # Produced layout sanity: [0,1] images, benchmark labels, h5 volumes.
    train_files = sorted(os.listdir(os.path.join(out, "train_npz")))
    assert len(train_files) == 18 * 3
    s = np.load(os.path.join(out, "train_npz", train_files[0]))
    assert s["image"].shape == (48, 48)
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0 + 1e-6
    assert set(np.unique(s["label"])) <= {0, 1, 2, 4, 5, 6, 7, 8}
    vol_files = sorted(os.listdir(os.path.join(out, "test_vol_h5")))
    assert len(vol_files) == 12

    # Drill lists: the produced slice names + 2 test volumes (the real
    # train.txt indexes the full 2211-slice release; the drill's raw
    # volumes are 3 slices deep).
    lists = tmp_path / "lists"
    lists.mkdir()
    (lists / "train.txt").write_text(
        "\n".join(f[:-4] for f in train_files) + "\n")
    (lists / "test_vol.txt").write_text(
        "\n".join(f[:-7] for f in vol_files[:2]) + "\n")

    # Train a few steps via the CLI on the produced npz files — assert the
    # loader resolved to the real dataset, not the synthetic fallback.
    from transception_tpu.core.config import DataConfig
    from transception_tpu.data.synapse import (
        SynapseSliceDataset,
        make_train_dataset,
    )
    dcfg = DataConfig(dataset="synapse",
                      root_path=os.path.join(out, "train_npz"),
                      test_path=os.path.join(out, "test_vol_h5"),
                      list_dir=str(lists), img_size=32)
    assert isinstance(make_train_dataset(dcfg), SynapseSliceDataset)

    from transception_tpu.cli.train import main as train_main
    state, hist = train_main([
        "--dataset", "Synapse",
        "--root_path", os.path.join(out, "train_npz"),
        "--test_path", os.path.join(out, "test_vol_h5"),
        "--list_dir", str(lists),
        "--img_size", "32", "--num_layers", "1,1,1", "--num_path", "2,2,2",
        "--stage1_layers", "1", "--dtype", "float32", "--no_pallas",
        "--batch_size", "4", "--max_epochs", "1", "--max_steps", "2",
        "--eval_interval", "999", "--num_workers", "2",
        "--output_dir", str(tmp_path / "train_out"),
    ])
    assert int(state.step) >= 2
    losses = [h["loss"] for h in hist] if isinstance(hist, list) else None
    if losses:
        assert np.isfinite(losses).all()

    # Convert a random-init reference .pth and eval it over the produced
    # h5 volumes with NIfTI export (the full published eval surface).
    import torch
    ref = mstr.MSTransception(num_classes=9)
    pth = str(tmp_path / "ref_random.pth")
    torch.save(ref.state_dict(), pth)

    from transception_tpu.cli.test import main as test_main
    eval_out = str(tmp_path / "eval_out")
    mean_dice, mean_hd95 = test_main([
        "--dataset", "Synapse",
        "--test_path", os.path.join(out, "test_vol_h5"),
        "--list_dir", str(lists),
        "--weight_pth", pth, "--no_pallas", "--no_vectorize_paths",
        "--eval_batch", "4", "--is_savenii",
        "--output_dir", eval_out,
    ])
    assert np.isfinite(mean_dice) and np.isfinite(mean_hd95)

    # Log-format parity with the reference (VERDICT r4 #5): the per-case,
    # per-class, and summary lines must match test.py:116-122's '%'-format
    # output byte-for-byte (after the shared '[%H:%M:%S.%03d] ' prefix),
    # so the day real data arrives the published-table comparison is
    # copy-paste. '%f' prints 6 decimals -> \d+\.\d{6}.
    import re
    log_text = (tmp_path / "eval_out" / "test_log" / "eval.txt").read_text()
    body = [line.split("] ", 1)[1] for line in log_text.splitlines()
            if "] " in line]
    num = r"\d+\.\d{6}"
    pats = {
        "iters": rf"^2 test iterations per epoch$",
        "case": rf"^idx \d+ case \S+ mean_dice {num} mean_hd95 {num}$",
        "class": rf"^Mean class [1-8] mean_dice {num} mean_hd95 {num}$",
        "summary": (rf"^Testing performance in best val model: "
                    rf"mean_dice : {num} mean_hd95 : {num}$"),
    }
    counts = {k: sum(bool(re.match(p, l)) for l in body)
              for k, p in pats.items()}
    assert counts["iters"] == 1, body[:5]
    assert counts["case"] == 2, body  # 2 drill volumes
    assert counts["class"] == 8, body  # classes 1..8
    assert counts["summary"] == 1, body[-3:]

    # NIfTI export round-trips.
    from transception_tpu.eval.nifti import load_nifti
    preds = sorted(os.listdir(os.path.join(eval_out, "predictions")))
    case0 = vol_files[0][:-7]
    assert f"{case0}_pred.nii.gz" in preds
    vol, spacing = load_nifti(
        os.path.join(eval_out, "predictions", f"{case0}_pred.nii.gz"))
    assert vol.shape == (3, 48, 48)
    assert set(np.unique(vol)) <= set(range(9))
