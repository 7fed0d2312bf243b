"""Slice-batched volume inference path (tiny model, synthetic volume)."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import CPU_DEVICES, tiny_config
from transception_tpu.data.synapse import SyntheticVolumeDataset
from transception_tpu.eval.inference import make_predictor, run_inference
from transception_tpu.eval.inference import (
    test_single_volume as eval_single_volume,  # alias: not a pytest test
)
from transception_tpu.models.transception import MSTransception


def _model_and_vars(cfg):
    model = MSTransception(cfg)
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 1), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    return model, v


def test_predictor_handles_padding_and_dtype():
    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    predict = make_predictor(model, v, cfg.img_size, batch=4)
    out = predict(np.random.default_rng(0).random((6, 32, 32)).astype(np.float32))
    assert out.shape == (6, 32, 32)
    assert out.dtype == np.uint8
    assert out.max() < cfg.num_classes


def test_fp32_predictor_is_true_fp32_end_to_end():
    """The published-protocol fp32 path (--dtype float32, reference
    utils.py:72-76) must ship fp32 inputs — predictions must equal running
    the model directly on the fp32 arrays, with no bf16 quantization."""
    cfg = tiny_config()  # dtype float32
    model, v = _model_and_vars(cfg)
    predict = make_predictor(model, v, cfg.img_size, batch=4)
    x = np.random.default_rng(2).random((3, 32, 32)).astype(np.float32)
    direct = np.asarray(jnp.argmax(
        model.apply(v, jnp.asarray(x)[..., None], train=False), axis=-1))
    np.testing.assert_array_equal(predict(x), direct.astype(np.uint8))


def test_transfer_dtype_follows_model_dtype():
    import ml_dtypes
    from transception_tpu.eval.inference import default_transfer_dtype
    fp32_model = MSTransception(tiny_config())
    bf16_model = MSTransception(tiny_config(dtype="bfloat16"))
    assert default_transfer_dtype(fp32_model) == np.dtype(np.float32)
    assert default_transfer_dtype(bf16_model) == np.dtype(ml_dtypes.bfloat16)


def test_single_volume_protocol():
    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    predict = make_predictor(model, v, cfg.img_size, batch=4)
    rng = np.random.default_rng(1)
    image = rng.random((5, 48, 48)).astype(np.float32)
    label = rng.integers(0, cfg.num_classes, (5, 48, 48)).astype(np.float32)
    metrics = eval_single_volume(image, label, predict, cfg.num_classes,
                                 patch_size=cfg.img_size)
    assert len(metrics) == cfg.num_classes - 1
    for d, h in metrics:
        assert 0.0 <= d <= 1.0 and h >= 0.0


def test_zoom0_gather_matches_scipy_bitexact():
    """The index-gather order-0 back-resize must reproduce scipy
    ndimage.zoom(order=0) bit-exactly, including awkward non-integer
    ratios and up/down-sampling (the protocol's utils.py:84-87 step)."""
    from scipy import ndimage
    from transception_tpu.eval.inference import _resize_pred_back
    rng = np.random.default_rng(0)
    for ph, pw, h, w in [(32, 32, 48, 48), (32, 32, 512, 512),
                         (224, 224, 147, 189), (224, 224, 512, 512),
                         (17, 23, 61, 37)]:
        pred = rng.integers(0, 9, (3, ph, pw)).astype(np.uint8)
        got = _resize_pred_back(pred, h, w)
        want = np.stack([ndimage.zoom(pred[i], (h / ph, w / pw), order=0)
                         for i in range(3)])
        np.testing.assert_array_equal(got, want)


def test_pipelined_volume_predict_matches_unpipelined():
    """predict_volume (chunked resample overlapped with compute) must be
    numerically identical to resample-all-then-predict."""
    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    predict = make_predictor(model, v, cfg.img_size, batch=4)
    from transception_tpu.eval.inference import _resize_slices_scipy
    vol = np.random.default_rng(3).random((7, 48, 48)).astype(np.float32)
    want = predict((_resize_slices_scipy(vol, cfg.img_size) - 0.5) / 0.5)
    got = predict.predict_volume(vol)
    np.testing.assert_array_equal(got, want)


def test_device_predictor_serving_path():
    from transception_tpu.eval.inference import make_device_predictor
    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    predict = make_device_predictor(model, v, cfg.img_size, batch=4)
    vol = np.random.default_rng(0).random((5, 48, 48)).astype(np.float32)
    out = predict(vol)
    assert out.shape == (5, 48, 48)
    assert out.dtype == np.uint8
    assert out.max() < cfg.num_classes


def test_device_predictor_matches_host_protocol():
    """The all-on-device serving path now has protocol semantics: exact
    operator-matmul spline in, bit-exact order-0 gather back — it must
    agree with the host protocol path (spline + predict + back-resize)
    up to fp32-vs-fp64 resample rounding."""
    from transception_tpu.eval.inference import (
        _resize_pred_back,
        _resize_slices_scipy,
        make_device_predictor,
    )
    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    vol = np.random.default_rng(21).random((5, 48, 40)).astype(np.float32)
    host = make_predictor(model, v, cfg.img_size, batch=4)
    want = _resize_pred_back(host.predict_volume(vol), 48, 40)
    got = make_device_predictor(model, v, cfg.img_size, batch=4)(vol)
    assert got.shape == want.shape
    agreement = (got == want).mean()
    assert agreement >= 0.995, f"pixel agreement {agreement:.4f}"


def test_run_inference_over_dataset():
    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    ds = SyntheticVolumeDataset(length=3, hw=48, num_classes=cfg.num_classes)
    lines = []
    dice, hd95 = run_inference(model, v, ds, cfg.num_classes,
                               patch_size=cfg.img_size, batch=4,
                               log=lines.append)
    assert 0.0 <= dice <= 1.0
    assert hd95 >= 0.0
    # Per-case lines must stay in case order even though metrics are
    # computed on a worker thread overlapping the next volume's predict.
    case_lines = [ln for ln in lines if ln.startswith("idx ")]
    assert [ln.split()[1] for ln in case_lines] == ["0", "1", "2"]
    assert sum(ln.startswith("Mean class") for ln in lines) == \
        cfg.num_classes - 1


def test_dp_sharded_predictor_matches_unsharded():
    """Data-parallel eval (batch sharded over the mesh 'data' axis) must
    produce bit-identical argmax maps to the single-device path — the
    CLAUDE.md-mandated value-parity check for any new sharding rule (the
    GSPMD miscompiles we bisected in r2 corrupted values silently)."""
    from transception_tpu.parallel.mesh import make_mesh

    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    slices = np.random.default_rng(7).random((11, 32, 32)).astype(np.float32)

    want = make_predictor(model, v, cfg.img_size, batch=8)(slices)

    mesh = make_mesh(dp_size=4, tp_size=1, devices=CPU_DEVICES[:4])
    got = make_predictor(model, v, cfg.img_size, batch=8, mesh=mesh)(slices)
    np.testing.assert_array_equal(got, want)


def test_dp_sharded_predictor_rejects_indivisible_batch():
    from transception_tpu.parallel.mesh import make_mesh
    import pytest

    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    mesh = make_mesh(dp_size=4, tp_size=1, devices=CPU_DEVICES[:4])
    with pytest.raises(ValueError, match="divisible"):
        make_predictor(model, v, cfg.img_size, batch=6, mesh=mesh)


def test_kernel_fallback_predictor_matches_plain():
    """kernel_fallback=True walks the shared ladder (first rung compiles
    on CPU) and must be output-identical to the plain predictor."""
    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    slices = np.random.default_rng(11).random((5, 32, 32)).astype(np.float32)
    want = make_predictor(model, v, cfg.img_size, batch=4)(slices)
    got = make_predictor(model, v, cfg.img_size, batch=4,
                         kernel_fallback=True)(slices)
    np.testing.assert_array_equal(got, want)

def test_zoom_operator_matches_scipy_2d():
    """The separable-operator claim behind device_resample: for 2-D input,
    A_h @ img @ A_w.T must equal ndimage.zoom(img, ..., order=3) — down-
    AND up-sampling, non-square, float64 exact up to roundoff."""
    from scipy import ndimage
    from transception_tpu.eval.inference import _zoom_operator
    rng = np.random.default_rng(5)
    for h, w, oh, ow in [(37, 29, 17, 17), (48, 40, 32, 32),
                         (17, 23, 32, 32), (64, 64, 64, 64)]:
        img = rng.random((h, w))
        want = ndimage.zoom(img, (oh / h, ow / w), order=3)
        got = _zoom_operator(h, oh) @ img @ _zoom_operator(w, ow).T
        assert want.shape == got.shape == (oh, ow)
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_device_resample_volume_matches_host_protocol():
    """device_resample=True moves the spline on device; predictions must
    agree with the host-spline protocol path up to fp32-matmul-vs-fp64
    rounding of the resample (~1e-6 input delta → rare argmax flips)."""
    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    vol = np.random.default_rng(9).random((6, 48, 40)).astype(np.float32)
    want = make_predictor(model, v, cfg.img_size, batch=4).predict_volume(vol)
    got = make_predictor(model, v, cfg.img_size, batch=4,
                         device_resample=True).predict_volume(vol)
    assert got.shape == want.shape and got.dtype == want.dtype
    agreement = (got == want).mean()
    assert agreement >= 0.995, f"pixel agreement {agreement:.4f}"


def test_device_resample_dp_sharded_matches_unsharded():
    """device_resample under a data mesh (raw slices sharded on batch,
    operators replicated) must be bit-identical to the unsharded
    device-resample path — the mandated value-parity check for any new
    sharded program (GSPMD miscompiles corrupt silently)."""
    from transception_tpu.parallel.mesh import make_mesh

    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    vol = np.random.default_rng(17).random((9, 48, 40)).astype(np.float32)
    want = make_predictor(model, v, cfg.img_size, batch=4,
                          device_resample=True).predict_volume(vol)
    mesh = make_mesh(dp_size=4, tp_size=1, devices=CPU_DEVICES[:4])
    got = make_predictor(model, v, cfg.img_size, batch=4, mesh=mesh,
                         device_resample=True).predict_volume(vol)
    np.testing.assert_array_equal(got, want)


def test_device_resample_passthrough_at_patch_size():
    """A volume already at patch resolution must take the identical
    no-resample path under device_resample."""
    cfg = tiny_config()
    model, v = _model_and_vars(cfg)
    vol = np.random.default_rng(13).random((5, 32, 32)).astype(np.float32)
    want = make_predictor(model, v, cfg.img_size, batch=4).predict_volume(vol)
    got = make_predictor(model, v, cfg.img_size, batch=4,
                         device_resample=True).predict_volume(vol)
    np.testing.assert_array_equal(got, want)
