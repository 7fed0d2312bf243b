"""Fast module-level parity: the 5 [KERNEL] ops (SURVEY.md §2.1) checked
against the live reference modules on small shapes. Complements the slow
full-model parity with second-level regression coverage.

Weights flow flax -> torch (reverse of the converter) so each test is
independent of the converter's name mapping.
"""

import numpy as np
import pytest

from reference_shim import load_reference_mstr

mstr = load_reference_mstr()
pytestmark = pytest.mark.skipif(
    mstr is None, reason="reference model not importable in this env")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _t(x):
    import torch
    return torch.from_numpy(np.asarray(x, np.float32))


def _set_linear(tmod, kernel, bias=None):
    import torch
    with torch.no_grad():
        tmod.weight.copy_(_t(np.asarray(kernel).T))
        if bias is not None and tmod.bias is not None:
            tmod.bias.copy_(_t(bias))


def _set_conv(tmod, kernel, bias=None):
    import torch
    with torch.no_grad():
        tmod.weight.copy_(_t(np.transpose(np.asarray(kernel), (3, 2, 0, 1))))
        if bias is not None and tmod.bias is not None:
            tmod.bias.copy_(_t(bias))


def _set_ln(tmod, scale, bias):
    import torch
    with torch.no_grad():
        tmod.weight.copy_(_t(scale))
        tmod.bias.copy_(_t(bias))


def test_efficient_attention_parity():
    """MSTr.py:80-143 vs ops.attention.EfficientAttention (1x1 conv == dense)."""
    import torch
    from transception_tpu.ops.attention import EfficientAttention
    C, H, W = 32, 7, 9
    ref = mstr.EfficientAttention(C, C, C, head_count=1).eval()
    mine = EfficientAttention(C, C, head_count=1, dtype=jnp.float32)
    x = np.random.default_rng(0).normal(size=(2, H * W, C)).astype(np.float32)
    v = mine.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = v["params"]
    for name, tmod in (("keys", ref.keys), ("queries", ref.queries),
                       ("values", ref.values),
                       ("reprojection", ref.reprojection)):
        k = np.asarray(p[name]["kernel"])
        _set_conv(tmod, k[None, None], np.asarray(p[name]["bias"]))
    got = np.asarray(mine.apply(v, jnp.asarray(x)))
    with torch.no_grad():
        xt = _t(x).transpose(1, 2).reshape(2, C, H, W)
        want = ref(xt).reshape(2, C, H * W).transpose(1, 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_factoratt_crpe_parity():
    """MSTr.py:755-886 (FactorAtt + ConvRelPosEnc) on a 7x7 map."""
    import torch
    from flax import linen as nn
    from transception_tpu.ops.attention import (
        ConvRelPosEnc,
        FactorAttConvRelPosEnc,
    )
    dim, h, H, W = 32, 8, 7, 7
    crpe_ref = mstr.ConvRelPosEnc(Ch=dim // h, h=h, window={3: 2, 5: 3, 7: 3})
    ref = mstr.FactorAtt_ConvRelPosEnc(dim, num_heads=h, qkv_bias=True,
                                       shared_crpe=crpe_ref).eval()

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            crpe = ConvRelPosEnc(dim // h, h, dtype=jnp.float32, name="crpe")
            return FactorAttConvRelPosEnc(dim, num_heads=h,
                                          dtype=jnp.float32,
                                          name="fa")(x, H, W, crpe)

    mine = Wrap()
    x = np.random.default_rng(1).normal(size=(2, H * W, dim)).astype(np.float32)
    v = mine.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = v["params"]
    _set_linear(ref.qkv, p["fa"]["qkv"]["kernel"], p["fa"]["qkv"]["bias"])
    _set_linear(ref.proj, p["fa"]["proj"]["kernel"], p["fa"]["proj"]["bias"])
    for j, conv in enumerate(crpe_ref.conv_list):
        k = np.asarray(p["crpe"][f"conv_{j}"]["kernel"])
        b = np.asarray(p["crpe"][f"conv_{j}"]["bias"])
        _set_conv(conv, k, b)
    got = np.asarray(mine.apply(v, jnp.asarray(x)))
    with torch.no_grad():
        want = ref(_t(x), size=(H, W)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mixffn_skip_parity():
    """MSTr.py:889-902."""
    import torch
    from transception_tpu.ops.common import MixFFNSkip
    c1, c2, H, W = 16, 64, 5, 6
    ref = mstr.MixFFN_skip(c1, c2).eval()
    mine = MixFFNSkip(c1, c2, dtype=jnp.float32)
    x = np.random.default_rng(2).normal(size=(2, H * W, c1)).astype(np.float32)
    v = mine.init(jax.random.PRNGKey(0), jnp.asarray(x), H, W)
    p = v["params"]
    _set_linear(ref.fc1, p["fc1"]["kernel"], p["fc1"]["bias"])
    _set_linear(ref.fc2, p["fc2"]["kernel"], p["fc2"]["bias"])
    _set_conv(ref.dwconv.dwconv, p["dwconv"]["dwconv"]["kernel"],
              p["dwconv"]["dwconv"]["bias"])
    _set_ln(ref.norm1, p["norm1"]["ln"]["scale"], p["norm1"]["ln"]["bias"])
    got = np.asarray(mine.apply(v, jnp.asarray(x), H, W))
    with torch.no_grad():
        want = ref(_t(x), H, W).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_coordatt_parity():
    """MSTr.py:1304-1348 (default IFF) incl. the silu gates."""
    import torch
    from transception_tpu.ops.fusion import CoordAtt
    C, H, W, out = 32, 6, 7, 16
    ref = mstr.CoordAtt(C, out, reduction=16).eval()
    mine = CoordAtt(out, reduction=16, dtype=jnp.float32)
    x = np.random.default_rng(3).normal(size=(2, H, W, C)).astype(np.float32)
    v = mine.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = v["params"]
    for name, tmod in (("conv1", ref.conv1), ("conv_h", ref.conv_h),
                       ("conv_w", ref.conv_w),
                       ("conv_in_out", ref.conv_in_out)):
        _set_conv(tmod, p[name]["kernel"], p[name]["bias"])
    # BN at eval uses running stats (identity-ish defaults).
    got = np.asarray(mine.apply(v, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = ref(_t(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bridge_channel_attention_parity():
    """MSTr.py:2295-2353 — the raw (B,N,C)->(B,C,N) reshape quirk."""
    import torch
    from transception_tpu.models.bridge import MEfficientChannelAtten
    dim, N = 64, 90
    ref = mstr.M_EfficientChannelAtten(dim, 1, None).eval()
    mine = MEfficientChannelAtten(dim, 1, dtype=jnp.float32)
    x = np.random.default_rng(4).normal(size=(2, N, dim)).astype(np.float32)
    v = mine.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = v["params"]
    for name, tmod in (("q", ref.q), ("k", ref.k), ("v", ref.v),
                       ("proj", ref.proj)):
        _set_linear(tmod, p[name]["kernel"], p[name]["bias"])
    got = np.asarray(mine.apply(v, jnp.asarray(x)))
    with torch.no_grad():
        want = ref(_t(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_scale_reduce_spatial_attention_parity():
    """MSTr.py:2209-2292 at the real 224 geometry (hardcoded in the ref)."""
    import torch
    from transception_tpu.models.bridge import BridgeGeometry, MEfficientSelfAtten
    dim = 64
    geo = BridgeGeometry(224, (64, 128, 320, 512), 64)
    ref = mstr.M_EfficientSelfAtten(dim, 1, [1, 2, 4, 8]).eval()
    mine = MEfficientSelfAtten(dim, 1, geo, (1, 2, 4, 8), dtype=jnp.float32)
    x = np.random.default_rng(5).normal(
        size=(1, geo.total, dim)).astype(np.float32)
    v = mine.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = v["params"]
    _set_linear(ref.q, p["q"]["kernel"], p["q"]["bias"])
    _set_linear(ref.kv, p["kv"]["kernel"], p["kv"]["bias"])
    _set_linear(ref.proj, p["proj"]["kernel"], p["proj"]["bias"])
    sr = p["scale_reduce"]
    for j in range(3):
        _set_conv(getattr(ref.scale_reduce, f"sr{j}"),
                  sr[f"sr{j}"]["kernel"], sr[f"sr{j}"]["bias"])
    _set_ln(ref.scale_reduce.norm, sr["norm"]["ln"]["scale"],
            sr["norm"]["ln"]["bias"])
    got = np.asarray(mine.apply(v, jnp.asarray(x)))
    with torch.no_grad():
        want = ref(_t(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-4)
