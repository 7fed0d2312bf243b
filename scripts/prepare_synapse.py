"""Prepare the Synapse multi-organ CT dataset for this framework.

The published 82.24-DSC recipe (reference README.md:44-61) uses the
TransUNet preprocessing of the MICCAI 2015 Multi-Atlas Abdomen Labeling
challenge ("Synapse") data: 18 train cases as per-slice .npz files and 12
test cases as whole-volume .npy.h5 files. The raw data requires
registration on synapse.org (accession syn3193805), so this script cannot
download it; it converts/validates a local copy into the layout the
loaders expect:

    <out>/train_npz/case00XX_sliceNNN.npz   keys: image (H,W) f32 in [0,1],
                                                  label (H,W) int in [0,8]
    <out>/test_vol_h5/case00XX.npy.h5       keys: image (D,H,W), label (D,H,W)

Three input modes:
  --from-preprocessed DIR : the ready-made TransUNet release (the folder
      containing train_npz/ and test_vol_h5/) — verified and symlinked or
      copied into place.
  --from-raw DIR : raw NIfTI volumes (imgXXXX.nii.gz + labelXXXX.nii.gz,
      Abdomen/RawData/Training): clips HU to [-125, 275], min-max
      normalizes to [0,1], splits train cases into slices, writes test
      volumes. Matches the TransUNet preprocessing described in its README.
  --verify-only DIR : check an existing layout against
      lists/lists_Synapse/*.txt and report gaps.

After preparation:
    python -m transception_tpu.cli.train --dataset Synapse \
        --root_path <out>/train_npz --test_path <out>/test_vol_h5 \
        --batch_size 16 --base_lr 0.05 --max_epochs 500 --eval_schedule reference
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# 13-organ raw challenge labels -> 8-organ Synapse benchmark remap used by
# TransUNet. Raw ids: 1 spleen, 2 right kidney, 3 left kidney,
# 4 gallbladder, 5 esophagus, 6 liver, 7 stomach, 8 aorta, 9 IVC,
# 10 portal/splenic veins, 11 pancreas, 12/13 adrenal glands.
# Benchmark ids: 1 aorta, 2 gallbladder, 3 kidney L, 4 kidney R, 5 liver,
# 6 pancreas, 7 spleen, 8 stomach; everything else -> 0.
RAW_TO_BENCH = {1: 7, 2: 4, 3: 3, 4: 2, 6: 5, 7: 8, 8: 1, 11: 6}


def read_list(split):
    with open(os.path.join(REPO, "lists", "lists_Synapse",
                           f"{split}.txt")) as f:
        return [ln.strip() for ln in f if ln.strip()]


def verify(out_dir: str) -> int:
    train = read_list("train")
    test = read_list("test_vol")
    missing = 0
    for name in train:
        p = os.path.join(out_dir, "train_npz", name + ".npz")
        if not os.path.exists(p):
            missing += 1
    print(f"train slices: {len(train) - missing}/{len(train)} present")
    tmissing = 0
    for name in test:
        p = os.path.join(out_dir, "test_vol_h5", name + ".npy.h5")
        if not os.path.exists(p):
            tmissing += 1
    print(f"test volumes: {len(test) - tmissing}/{len(test)} present")
    if missing == 0 and len(train) > 0:
        sample = np.load(os.path.join(out_dir, "train_npz",
                                      train[0] + ".npz"))
        img, lbl = sample["image"], sample["label"]
        assert img.ndim == 2 and lbl.shape == img.shape, "bad slice shapes"
        assert 0.0 <= img.min() and img.max() <= 1.0 + 1e-6, (
            "images must be min-max normalized to [0,1] "
            f"(got [{img.min()}, {img.max()}])")
        assert int(lbl.max()) <= 8, "labels must be the 9-class benchmark set"
        print("sample slice validated (shapes, [0,1] range, 9-class labels)")
    return missing + tmissing


def from_preprocessed(src: str, out_dir: str, link: bool):
    os.makedirs(out_dir, exist_ok=True)
    for sub in ("train_npz", "test_vol_h5"):
        s = os.path.join(src, sub)
        d = os.path.join(out_dir, sub)
        if not os.path.isdir(s):
            sys.exit(f"missing {s}")
        if os.path.exists(d):
            print(f"{d} already exists, skipping")
            continue
        if link:
            os.symlink(os.path.abspath(s), d)
        else:
            shutil.copytree(s, d)
        print(f"{'linked' if link else 'copied'} {sub}")


def from_raw(src: str, out_dir: str):
    import h5py
    from transception_tpu.eval.nifti import load_nifti
    os.makedirs(os.path.join(out_dir, "train_npz"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "test_vol_h5"), exist_ok=True)
    train_cases = sorted({n.split("_")[0] for n in read_list("train")})
    test_cases = read_list("test_vol")

    def load_case(case):  # case = 'case0005' -> img0005/label0005
        num = case.replace("case", "")
        img, _ = load_nifti(os.path.join(src, f"img{num}.nii.gz"))
        lbl, _ = load_nifti(os.path.join(src, f"label{num}.nii.gz"))
        img = np.clip(img.astype(np.float32), -125, 275)
        img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
        bench = np.zeros_like(lbl, np.uint8)
        for raw_id, bench_id in RAW_TO_BENCH.items():
            bench[lbl == raw_id] = bench_id
        return img, bench

    for case in train_cases:
        img, lbl = load_case(case)
        for i in range(img.shape[0]):
            np.savez(os.path.join(out_dir, "train_npz",
                                  f"{case}_slice{i:03d}.npz"),
                     image=img[i], label=lbl[i])
        print(f"{case}: {img.shape[0]} train slices")
    for case in test_cases:
        img, lbl = load_case(case)
        with h5py.File(os.path.join(out_dir, "test_vol_h5",
                                    f"{case}.npy.h5"), "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lbl)
        print(f"{case}: test volume {img.shape}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--from-preprocessed", metavar="DIR")
    p.add_argument("--from-raw", metavar="DIR")
    p.add_argument("--verify-only", metavar="DIR")
    p.add_argument("--out", default="./data/Synapse")
    p.add_argument("--copy", action="store_true",
                   help="copy instead of symlink for --from-preprocessed")
    args = p.parse_args()
    if args.verify_only:
        sys.exit(1 if verify(args.verify_only) else 0)
    if args.from_preprocessed:
        from_preprocessed(args.from_preprocessed, args.out, not args.copy)
    elif args.from_raw:
        from_raw(args.from_raw, args.out)
    else:
        p.error("one of --from-preprocessed/--from-raw/--verify-only needed")
    verify(args.out)


if __name__ == "__main__":
    main()
