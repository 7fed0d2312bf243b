"""Shape/smoke tests for the legacy model family (Transception,
MISSFormer, EffMISSFormer) and their encoder variants."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import tiny_config
from transception_tpu.models.legacy import (
    EffMISSFormer,
    MISSFormer,
    MiT3Inception3Branches,
    Transception,
    torch_nearest_resize,
)

TINY = tiny_config()


def _run(model, img=32, batch=2, train=False):
    x = jnp.zeros((batch, img, img, 1), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    if train:
        fwd = jax.jit(lambda v, x: model.apply(
            v, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)}))
        out, _ = fwd(v, x)
    else:
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    return out


# Dilated (dil_conv=1) inception branches need >=96px inputs — the 5x5
# dilation-2 kernels shrink small stage-4 maps to nothing (the reference
# only ever runs them at 224).
def test_transception_forward_dilated():
    cfg = dataclasses.replace(TINY, img_size=96)
    out = _run(Transception(cfg), img=96)
    assert out.shape == (2, 96, 96, 9)


def test_transception_sk_concat():
    cfg = dataclasses.replace(TINY, dil_conv=0)
    out = _run(Transception(cfg, concat="sk"), train=True)
    assert out.shape == (2, 32, 32, 9)


def test_transception_no_dil():
    cfg = dataclasses.replace(TINY, dil_conv=0)
    out = _run(Transception(cfg))
    assert out.shape == (2, 32, 32, 9)


def test_transception_3branches():
    cfg = dataclasses.replace(TINY, dil_conv=0)
    out = _run(Transception(cfg, encoder="3branches"))
    assert out.shape == (2, 32, 32, 9)


def test_missformer_forward():
    out = _run(MISSFormer(TINY))
    assert out.shape == (2, 32, 32, 9)


def test_missformer_no_bridge():
    out = _run(MISSFormer(TINY, if_bridge=False))
    assert out.shape == (2, 32, 32, 9)


def test_effmissformer_forward():
    out = _run(EffMISSFormer(TINY))
    assert out.shape == (2, 32, 32, 9)


def test_torch_nearest_resize_matches_floor_convention():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    up = torch_nearest_resize(x, 8, 8)
    # torch F.interpolate nearest: src = floor(dst * in / out).
    want_rows = (np.arange(8) * 4) // 8
    np.testing.assert_array_equal(
        np.asarray(up[0, :, 0, 0]), np.asarray(x[0, want_rows, 0, 0]))
    down = torch_nearest_resize(x, 2, 2)
    np.testing.assert_array_equal(
        np.asarray(down[0, :, :, 0]), np.asarray(x[0, ::2, ::2, 0]))


def test_registry_creates_all_models():
    from transception_tpu.models.registry import MODEL_REGISTRY, create_model
    for name in MODEL_REGISTRY:
        m = create_model(name, TINY)
        assert m is not None


def test_resinception_variants():
    """comment.py's MiT_3_ResInception (dead in the reference) rebuilt:
    forward shape for the '15' default and the '135' 3-branch set."""
    import jax
    import jax.numpy as jnp
    from conftest import tiny_config
    from transception_tpu.models.legacy import ResInceptionTransception

    for inception in ("15", "135"):
        cfg = tiny_config()
        model = ResInceptionTransception(cfg, inception=inception)
        x = jnp.zeros((2, 32, 32, 1), jnp.float32)
        v = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), x, train=False)
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
        assert out.shape == (2, 32, 32, 9)


def test_resinception_registry():
    from transception_tpu.models.registry import MODEL_REGISTRY
    assert "resinception" in MODEL_REGISTRY
    assert "resinception_135" in MODEL_REGISTRY
