"""Pure-numpy NIfTI-1 writer: byte-level header checks + round-trip +
eval-CLI export path (reference utils.py:100-109 parity)."""

import gzip
import struct

import numpy as np

from transception_tpu.eval.nifti import load_nifti, save_nifti


def test_header_bytes_are_standard_nifti1(tmp_path):
    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    path = str(tmp_path / "v.nii.gz")
    save_nifti(path, vol, spacing=(1.0, 1.0, 2.5))
    with gzip.open(path, "rb") as f:
        blob = f.read()
    assert struct.unpack_from("<i", blob, 0)[0] == 348      # sizeof_hdr
    dim = struct.unpack_from("<8h", blob, 40)
    assert dim[:4] == (3, 4, 3, 2)                           # ndim, nx, ny, nz
    assert struct.unpack_from("<h", blob, 70)[0] == 16       # float32
    assert struct.unpack_from("<h", blob, 72)[0] == 32       # bitpix
    pixdim = struct.unpack_from("<8f", blob, 76)
    assert pixdim[1:4] == (1.0, 1.0, 2.5)
    assert struct.unpack_from("<f", blob, 108)[0] == 352.0   # vox_offset
    assert struct.unpack_from("<h", blob, 254)[0] == 1       # sform_code
    assert blob[344:348] == b"n+1\x00"                       # magic
    # voxels start at 352 in x-fastest order == C order of (D, H, W)
    data = np.frombuffer(blob, np.float32, count=vol.size, offset=352)
    np.testing.assert_array_equal(data.reshape(vol.shape), vol)


def test_roundtrip_dtypes_and_plain_nii(tmp_path):
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.uint8, np.int16):
        vol = (rng.random((5, 6, 7)) * 100).astype(dtype)
        for ext in ("nii", "nii.gz"):
            path = str(tmp_path / f"v_{np.dtype(dtype).name}.{ext}")
            save_nifti(path, vol, spacing=(1.0, 1.0, 3.0))
            back, spacing = load_nifti(path)
            assert back.dtype == np.dtype(dtype)
            np.testing.assert_array_equal(back, vol)
            assert spacing == (1.0, 1.0, 3.0)


def test_reproducible_bytes(tmp_path):
    vol = np.zeros((2, 2, 2), np.float32)
    p1, p2 = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.nii.gz")
    save_nifti(p1, vol)
    save_nifti(p2, vol)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_run_inference_saves_nii_volumes(tmp_path):
    """run_inference(save_path=...) writes {case}_img/_pred/_gt.nii.gz with
    (1, 1, z_spacing) like the reference's test_save_path flow."""
    import jax
    import jax.numpy as jnp
    from conftest import tiny_config
    from transception_tpu.data.synapse import SyntheticVolumeDataset
    from transception_tpu.eval.inference import run_inference
    from transception_tpu.models.transception import MSTransception

    cfg = tiny_config()
    model = MSTransception(cfg)
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 1), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    ds = SyntheticVolumeDataset(length=1, hw=48, num_classes=cfg.num_classes)
    run_inference(model, v, ds, cfg.num_classes, patch_size=cfg.img_size,
                  batch=4, log=None, save_path=str(tmp_path), z_spacing=5.0)
    case = ds.get(0)["case_name"]
    for kind in ("img", "pred", "gt"):
        vol, spacing = load_nifti(str(tmp_path / f"{case}_{kind}.nii.gz"))
        assert vol.shape == ds.get(0)["image"].shape
        assert spacing == (1.0, 1.0, 5.0)
    pred, _ = load_nifti(str(tmp_path / f"{case}_pred.nii.gz"))
    assert pred.max() < cfg.num_classes
