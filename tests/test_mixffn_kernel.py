"""Fused MixFFN_skip kernel: numerics vs the XLA module, halo handling at
map edges, grads, and param-tree compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transception_tpu.ops.common import MixFFNSkip
from transception_tpu.ops.pallas.mixffn import _reference_impl
from transception_tpu.ops.pallas.mixffn_kernel import (
    eligible,
    fused_mixffn_skip,
)


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape) * 0.3, dtype)


def _params(C, hidden, seed=0):
    return dict(
        w1=_rand((C, hidden), seed), b1=_rand((hidden,), seed + 1),
        dw=_rand((3, 3, hidden), seed + 2), dwb=_rand((hidden,), seed + 3),
        ls=_rand((hidden,), seed + 4) * 0.1 + 1.0,
        lb=_rand((hidden,), seed + 5) * 0.1,
        w2=_rand((hidden, C), seed + 6), b2=_rand((C,), seed + 7))


@pytest.mark.parametrize("s,C,hidden", [
    (8, 64, 256),     # tiny square, 2 tiles of 4 rows
    (16, 64, 256),    # 2 tiles of 8
    (56, 64, 256),    # the published bridge scale-0 geometry
    (28, 128, 512),   # bridge scale-1 geometry
])
def test_kernel_matches_reference(s, C, hidden):
    x = _rand((2, s * s, C), 9)
    p = _params(C, hidden)
    got = fused_mixffn_skip(x, p["w1"], p["b1"], p["dw"], p["dwb"],
                            p["ls"], p["lb"], p["w2"], p["b2"],
                            s=s, hidden=hidden, interpret=True)
    want = _reference_impl(x, p["w1"], p["b1"], p["dw"], p["dwb"],
                           p["ls"], p["lb"], p["w2"], p["b2"],
                           s, hidden, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_reference_impl_matches_module():
    """The VJP's reference chain must equal the flax MixFFNSkip module on
    shared params (fp32)."""
    s, C, hidden = 8, 32, 128
    x = _rand((2, s * s, C), 3)
    m = MixFFNSkip(C, hidden, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, s, s)
    prm = v["params"]
    out_mod = m.apply(v, x, s, s)
    out_ref = _reference_impl(
        x, prm["fc1"]["kernel"], prm["fc1"]["bias"],
        prm["dwconv"]["dwconv"]["kernel"].reshape(3, 3, hidden),
        prm["dwconv"]["dwconv"]["bias"],
        prm["norm1"]["ln"]["scale"], prm["norm1"]["ln"]["bias"],
        prm["fc2"]["kernel"], prm["fc2"]["bias"], s, hidden, 1e-5)
    np.testing.assert_allclose(np.asarray(out_mod), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_edge_rows_zero_padding():
    """The clamped-window halo must reproduce conv zero padding exactly:
    an input whose only energy sits in the top/bottom rows."""
    s, C, hidden = 8, 64, 256
    x = np.zeros((1, s * s, C), np.float32)
    x[0, :s] = 1.0          # top row
    x[0, -s:] = -1.0        # bottom row
    x = jnp.asarray(x)
    p = _params(C, hidden, 20)
    got = fused_mixffn_skip(x, p["w1"], p["b1"], p["dw"], p["dwb"],
                            p["ls"], p["lb"], p["w2"], p["b2"],
                            s=s, hidden=hidden, interpret=True)
    want = _reference_impl(x, p["w1"], p["b1"], p["dw"], p["dwb"],
                           p["ls"], p["lb"], p["w2"], p["b2"],
                           s, hidden, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_eligibility():
    assert eligible((128, 56 * 56, 64), 64, 256, jnp.bfloat16)
    assert eligible((128, 28 * 28, 128), 128, 512, jnp.bfloat16)
    # s=14/7: no row tiling satisfies the sublane rule -> XLA fallback
    assert not eligible((128, 14 * 14, 320), 320, 1280, jnp.bfloat16)
    assert not eligible((128, 7 * 7, 512), 512, 2048, jnp.bfloat16)
    assert not eligible((1, 50, 64), 64, 256, jnp.float32)  # non-square


def test_facade_bwd_matches_autodiff():
    from transception_tpu.ops.pallas import mixffn as fa
    s, C, hidden = 8, 32, 128
    x = _rand((1, s * s, C), 1)
    p = _params(C, hidden, 30)
    args = (x, p["w1"], p["b1"], p["dw"], p["dwb"], p["ls"], p["lb"],
            p["w2"], p["b2"])
    g = _rand((1, s * s, C), 2)
    _, vjp = jax.vjp(lambda *a: _reference_impl(*a, s, hidden, 1e-5), *args)
    want = vjp(g)
    got = fa._fused_bwd(s, hidden, 1e-5, args, g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_facade_bwd_traces_with_bf16_input():
    """Regression: with a bf16 x the reference-impl conv used
    preferred_element_type, whose transpose rule rejects a bf16-operand/
    fp32-cotangent pair — _fused_bwd raised TypeError the first time
    gradients flowed through a use_pallas model (500-epoch recipe run)."""
    from transception_tpu.ops.pallas import mixffn as fa
    s, C, hidden = 8, 32, 128
    x = _rand((1, s * s, C), 1).astype(jnp.bfloat16)
    p = _params(C, hidden, 30)
    args = (x, p["w1"], p["b1"], p["dw"], p["dwb"], p["ls"], p["lb"],
            p["w2"], p["b2"])
    g = _rand((1, s * s, C), 2).astype(jnp.bfloat16)
    got = fa._fused_bwd(s, hidden, 1e-5, args, g)  # must not raise
    _, vjp = jax.vjp(lambda *a: _reference_impl(*a, s, hidden, 1e-5), *args)
    want = vjp(g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-2)


def test_param_tree_identical_between_branches(monkeypatch):
    from transception_tpu.ops.pallas import mixffn as fa
    import transception_tpu.ops.pallas.mixffn_kernel as mk
    s, C, hidden = 8, 64, 256
    x = jnp.zeros((1, s * s, C), jnp.float32)

    xla = MixFFNSkip(C, hidden, use_pallas=False, dtype=jnp.float32)
    v_xla = xla.init(jax.random.PRNGKey(0), x, s, s)

    monkeypatch.setattr(fa, "_target_platform", lambda: "tpu")
    orig = mk.fused_mixffn_skip

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(mk, "fused_mixffn_skip", interp)
    fused = MixFFNSkip(C, hidden, use_pallas=True, dtype=jnp.float32)
    v_fused = fused.init(jax.random.PRNGKey(0), x, s, s)

    fa_flat = jax.tree_util.tree_flatten_with_path(v_xla)[0]
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(v_fused)[0]}
    assert len(fa_flat) == len(fb)
    for k, va in fa_flat:
        ks = jax.tree_util.keystr(k)
        assert ks in fb and va.shape == fb[ks].shape, ks
        np.testing.assert_array_equal(np.asarray(va), np.asarray(fb[ks]))
    xr = _rand((1, s * s, C), 5)
    np.testing.assert_allclose(
        np.asarray(fused.apply(v_fused, xr, s, s)),
        np.asarray(xla.apply(v_xla, xr, s, s)), rtol=5e-5, atol=5e-5)
