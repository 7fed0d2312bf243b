"""Whole-block fused MHCA kernel (CPE -> LN1 -> FactorAtt+CRPE -> res ->
LN2 -> MixFFN_skip -> res, networks/MSTr.py:905-946): numerics vs the
reference mirror and the XLA module chain, eligibility gates, grads, and
param-tree/fold compatibility under the stages' nn.vmap path-stacking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transception_tpu.ops.attention import MHCAEncoder
from transception_tpu.ops.pallas.mhca_block import _reference_impl
from transception_tpu.ops.pallas.mhca_block_kernel import (
    eligible_block,
    fused_mhca_block,
)

WIN = ((3, 2), (5, 3), (7, 3))


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape) * 0.3, dtype)


def _params(C, heads, hidden, seed=0, window=WIN):
    Ch = C // heads
    crpe_ks, crpe_bs = [], []
    for i, (w, h) in enumerate(window):
        crpe_ks.append(_rand((w, w, 1, h * Ch), seed + 20 + i))
        crpe_bs.append(_rand((h * Ch,), seed + 30 + i))
    return dict(
        cpe_k=_rand((3, 3, 1, C), seed), cpe_b=_rand((C,), seed + 1),
        ln1_s=_rand((C,), seed + 2) * 0.1 + 1.0,
        ln1_b=_rand((C,), seed + 3) * 0.1,
        qkv_k=_rand((C, 3 * C), seed + 4), qkv_b=_rand((3 * C,), seed + 5),
        crpe_ks=tuple(crpe_ks), crpe_bs=tuple(crpe_bs),
        proj_k=_rand((C, C), seed + 6), proj_b=_rand((C,), seed + 7),
        ln2_s=_rand((C,), seed + 8) * 0.1 + 1.0,
        ln2_b=_rand((C,), seed + 9) * 0.1,
        w1=_rand((C, hidden), seed + 10), b1=_rand((hidden,), seed + 11),
        dw=_rand((3, 3, 1, hidden), seed + 12),
        dwb=_rand((hidden,), seed + 13),
        ln_s=_rand((hidden,), seed + 14) * 0.1 + 1.0,
        ln_b=_rand((hidden,), seed + 15) * 0.1,
        w2=_rand((hidden, C), seed + 16), b2=_rand((C,), seed + 17))


_ORDER = ("cpe_k", "cpe_b", "ln1_s", "ln1_b", "qkv_k", "qkv_b",
          "crpe_ks", "crpe_bs", "proj_k", "proj_b", "ln2_s", "ln2_b",
          "w1", "b1", "dw", "dwb", "ln_s", "ln_b", "w2", "b2")


def _args(p):
    return tuple(p[k] for k in _ORDER)


@pytest.mark.parametrize("s,C,heads,hidden", [
    (8, 64, 8, 192),      # stage-2 channel geometry, small map
    (28, 64, 8, 192),     # TRUE MHCA stage-2 geometry (224 input)
    (14, 128, 8, 384),    # TRUE MHCA stage-3 geometry
])
def test_kernel_matches_reference(s, C, heads, hidden):
    x = _rand((2, s * s, C), 9)
    p = _params(C, heads, hidden)
    assert eligible_block(x.shape, C, heads, hidden, WIN, x.dtype)
    got = fused_mhca_block(x, *_args(p), s=s, heads=heads, hidden=hidden,
                           window=WIN, interpret=True)
    want = _reference_impl(x, *_args(p), s, heads, hidden, WIN)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_kernel_edge_padding():
    """The zero-padded VMEM windows (CPE 3x3, unified CRPE 7x7, FFN conv)
    must reproduce conv zero padding at all four map edges."""
    s, C, heads, hidden = 8, 64, 8, 192
    x = np.zeros((1, s * s, C), np.float32)
    xm = x.reshape(1, s, s, C)
    xm[0, 0], xm[0, -1], xm[0, :, 0], xm[0, :, -1] = 1.0, -1.0, 0.5, -0.5
    x = jnp.asarray(x)
    p = _params(C, heads, hidden, 40)
    got = fused_mhca_block(x, *_args(p), s=s, heads=heads, hidden=hidden,
                           window=WIN, interpret=True)
    want = _reference_impl(x, *_args(p), s, heads, hidden, WIN)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_vmapped_kernel_matches_vmapped_reference():
    """jax.vmap over path-stacked weights (the nn.vmap MHCA encoders)
    must equal the vmapped reference chain."""
    P, s, C, heads, hidden = 2, 8, 64, 8, 192
    x = _rand((P, 1, s * s, C), 11)
    ps = [_params(C, heads, hidden, 50 + 100 * i) for i in range(P)]
    stacked = [jax.tree_util.tree_map(lambda *a: jnp.stack(a),
                                      *[_args(p) for p in ps])]
    args = (x,) + tuple(stacked[0])
    got = jax.vmap(lambda *a: fused_mhca_block(
        *a, s=s, heads=heads, hidden=hidden, window=WIN, interpret=True))(
        *args)
    want = jax.vmap(lambda *a: _reference_impl(
        *a, s, heads, hidden, WIN))(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_reference_impl_matches_module():
    """The VJP's reference mirror must equal the flax MHCAEncoder chain
    (1 layer, all folds off) on shared params (fp32)."""
    s, C, heads, hidden = 8, 64, 8, 192
    x = _rand((2, s, s, C), 3)
    enc = MHCAEncoder(C, num_layers=1, num_heads=heads, mlp_ratio=3,
                      use_pallas=False, block_fold=False,
                      dtype=jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), x)
    prm = v["params"]
    lay, mlp = prm["layers_0"], prm["layers_0"]["mlp"]
    out_mod = enc.apply(v, x)
    out_ref = _reference_impl(
        x.reshape(2, s * s, C),
        prm["cpe"]["proj"]["kernel"], prm["cpe"]["proj"]["bias"],
        lay["norm1"]["ln"]["scale"], lay["norm1"]["ln"]["bias"],
        lay["factoratt_crpe"]["qkv"]["kernel"],
        lay["factoratt_crpe"]["qkv"]["bias"],
        tuple(prm["crpe"][f"conv_{i}"]["kernel"] for i in range(3)),
        tuple(prm["crpe"][f"conv_{i}"]["bias"] for i in range(3)),
        lay["factoratt_crpe"]["proj"]["kernel"],
        lay["factoratt_crpe"]["proj"]["bias"],
        lay["norm2"]["ln"]["scale"], lay["norm2"]["ln"]["bias"],
        mlp["fc1"]["kernel"], mlp["fc1"]["bias"],
        mlp["dwconv"]["dwconv"]["kernel"], mlp["dwconv"]["dwconv"]["bias"],
        mlp["norm1"]["ln"]["scale"], mlp["norm1"]["ln"]["bias"],
        mlp["fc2"]["kernel"], mlp["fc2"]["bias"],
        s, heads, hidden, WIN)
    np.testing.assert_allclose(
        np.asarray(out_mod.reshape(2, s * s, C)), np.asarray(out_ref),
        rtol=2e-5, atol=2e-5)


def test_eligibility():
    wide = ((3, 2), (5, 3), (7, 3))
    # TRUE published geometries (b=128): stage 2 and 3 fold, stage 4 odd.
    assert eligible_block((128, 28 * 28, 64), 64, 8, 192, wide,
                          jnp.bfloat16)
    assert eligible_block((128, 14 * 14, 128), 128, 8, 384, wide,
                          jnp.bfloat16)
    assert not eligible_block((128, 7 * 7, 320), 320, 8, 960, wide,
                              jnp.bfloat16)  # odd map side
    assert not eligible_block((1, 50, 64), 64, 8, 192, wide,
                              jnp.bfloat16)  # non-square
    assert not eligible_block((1, 64, 64), 64, 7, 192, wide,
                              jnp.bfloat16)  # C % heads
    assert not eligible_block((1, 64, 64), 64, 8, 192, ((3, 2), (5, 3)),
                              jnp.bfloat16)  # window covers 5 of 8 heads


def test_facade_bwd_matches_autodiff():
    from transception_tpu.ops.pallas import mhca_block as fa
    s, C, heads, hidden = 8, 64, 8, 192
    x = _rand((1, s * s, C), 1)
    p = _params(C, heads, hidden, 60)
    args = (x,) + _args(p)
    g = _rand((1, s * s, C), 2)
    _, vjp = jax.vjp(
        lambda *a: _reference_impl(*a, s, heads, hidden, WIN), *args)
    want = vjp(g)
    got = fa._fused_bwd(s, heads, hidden, WIN, args, g)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def _interp_patches(monkeypatch):
    import transception_tpu.ops.pallas.mhca_block as fa
    import transception_tpu.ops.pallas.mhca_block_kernel as mbk

    monkeypatch.setattr(fa, "_target_platform", lambda: "tpu")
    orig = mbk.fused_mhca_block

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(mbk, "fused_mhca_block", interp)


def test_block_fold_matches_unfolded(monkeypatch):
    """MHCAEncoder with block_fold (real kernel, interpret-mode Mosaic)
    must share the unfolded chain's param tree, init values, and outputs
    — including under the nn.vmap path-stacking the stages use — so
    train (unfolded) and eval (folded) read one checkpoint."""
    from flax import linen as nn

    _interp_patches(monkeypatch)
    P, B, H, W, C = 2, 1, 8, 8, 64

    def venc(block_fold):
        return nn.vmap(
            MHCAEncoder, in_axes=(0, None), out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )(C, num_layers=2, num_heads=8, mlp_ratio=3,
          block_fold=block_fold, dtype=jnp.float32)

    x = _rand((P, B, H, W, C), 23)
    folded, plain = venc(True), venc(False)
    v1 = folded.init(jax.random.PRNGKey(0), x, True)
    v2 = plain.init(jax.random.PRNGKey(0), x, True)
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(v1)[0],
            jax.tree_util.tree_flatten_with_path(v2)[0]):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(folded.apply(v1, x, True)),
        np.asarray(plain.apply(v1, x, True)), rtol=3e-5, atol=3e-5)


def test_block_fold_ineligible_geometry_falls_back(monkeypatch):
    """Odd map sides (stage 4's 7x7) must silently take the XLA chain
    even with block_fold on — identical outputs, no kernel engagement."""
    _interp_patches(monkeypatch)
    B, H, W, C = 1, 7, 7, 64
    x = _rand((B, H, W, C), 31)
    folded = MHCAEncoder(C, num_layers=1, num_heads=8, mlp_ratio=3,
                         block_fold=True, dtype=jnp.float32)
    plain = MHCAEncoder(C, num_layers=1, num_heads=8, mlp_ratio=3,
                        block_fold=False, dtype=jnp.float32)
    v = folded.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(folded.apply(v, x)),
        np.asarray(plain.apply(v, x)), rtol=1e-6, atol=1e-6)
