"""MultiRes blocks, padding patch embed, 4-stage inception encoder."""

import jax
import jax.numpy as jnp
import pytest

from conftest import tiny_config


def _init_apply(mod, x, train=False):
    v = jax.jit(mod.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    return jax.jit(
        lambda v, x: mod.apply(v, x, train=False))(v, x)


@pytest.mark.parametrize("branches,expected_streams", [
    (("res",), 1), (("3",), 1), (("5",), 1),
    (("res", "3"), 2), (("res", "5"), 2), (("res", "3", "5", "7"), 4),
])
def test_multires_block_variants(branches, expected_streams):
    from transception_tpu.ops.multires import MultiResBlock
    mod = MultiResBlock(U=16, branches=branches, dtype=jnp.float32)
    x = jnp.zeros((2, 16, 16, 8), jnp.float32)
    out = _init_apply(mod, x)
    # Each stream contributes (16/2)^2 = 64 tokens of width U.
    assert out.shape == (2, 64 * expected_streams, 16)


def test_conv_block_act_orders():
    from transception_tpu.ops.multires import ConvBlock, ResConvBlock
    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    for act in ("relu", "sigmoid", "none"):
        out = _init_apply(ConvBlock(8, act=act, dtype=jnp.float32), x)
        assert out.shape == (1, 8, 8, 8)
    out = _init_apply(ResConvBlock(8, dtype=jnp.float32), x)
    assert out.shape == (1, 8, 8, 8)


def test_padding_patch_embed():
    from transception_tpu.models.legacy import OverlapPatchEmbedFusePadding
    mod = OverlapPatchEmbedFusePadding(16, 3, 2, 0, target_size=8,
                                       dtype=jnp.float32)
    x = jnp.zeros((1, 12, 12, 4), jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    t, H, W = mod.apply(v, x)
    assert (H, W) == (8, 8)
    assert t.shape == (1, 64, 16)


def test_mit_inception_4stage():
    from transception_tpu.models.legacy import MiTInception4Stage
    # k3/p0 stride-2 embeds need >=48px inputs (stage-4 map would vanish).
    cfg = tiny_config(img_size=64)
    mod = MiTInception4Stage(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = jax.jit(mod.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    outs = jax.jit(lambda v, x: mod.apply(v, x, train=False))(v, x)
    assert [o.shape[-1] for o in outs] == list(cfg.dims)
    assert outs[0].shape[1] == 16 and outs[3].shape[1] == 2
