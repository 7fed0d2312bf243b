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
    (14, 128, 512),   # whole-map mode (MHCA stage-3 / decoder_2 geometry)
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


def test_whole_map_edge_padding():
    """Whole-map mode (rows == s) must reproduce conv zero padding at all
    four map edges (energy only on the border ring)."""
    s, C, hidden = 14, 64, 256
    x = np.zeros((1, s * s, C), np.float32)
    xm = x.reshape(1, s, s, C)
    xm[0, 0], xm[0, -1], xm[0, :, 0], xm[0, :, -1] = 1.0, -1.0, 0.5, -0.5
    x = jnp.asarray(x)
    p = _params(C, hidden, 21)
    got = fused_mixffn_skip(x, p["w1"], p["b1"], p["dw"], p["dwb"],
                            p["ls"], p["lb"], p["w2"], p["b2"],
                            s=s, hidden=hidden, interpret=True)
    want = _reference_impl(x, p["w1"], p["b1"], p["dw"], p["dwb"],
                           p["ls"], p["lb"], p["w2"], p["b2"],
                           s, hidden, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_vmapped_kernel_matches_vmapped_reference():
    """jax.vmap over path-stacked weights (the nn.vmap MHCA encoders)
    must equal the vmapped reference chain — the kernel's vector params
    ride as (1, n) blocks specifically so this batching lowers."""
    P, s, C, hidden = 3, 14, 64, 256
    x = _rand((P, 2, s * s, C), 11)
    ps = [_params(C, hidden, 30 + i) for i in range(P)]
    stacked = {k: jnp.stack([p[k] for p in ps]) for k in ps[0]}
    order = ("w1", "b1", "dw", "dwb", "ls", "lb", "w2", "b2")
    args = (x,) + tuple(stacked[k] for k in order)
    got = jax.vmap(lambda *a: fused_mixffn_skip(
        *a, s=s, hidden=hidden, interpret=True))(*args)
    want = jax.vmap(lambda *a: _reference_impl(*a, s, hidden, 1e-5))(*args)
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
    # s=14: no partial row tiling satisfies the sublane rule; the
    # whole-map mode (rows == s) covers it at the kernel level, but the
    # eligible() auto-gate excludes it (measured in-graph loss — see
    # _pick_rows), so module auto paths keep XLA there.
    from transception_tpu.ops.pallas.mixffn_kernel import _pick_rows
    assert _pick_rows(14, 320, 1280, 2) == 14
    assert _pick_rows(14, 320, 1280, 2, whole_map=False) == 0
    assert not eligible((128, 14 * 14, 320), 320, 1280, jnp.bfloat16)
    # s=7 (odd): Mosaic rejects the (7,7,C)->(49,C) cast even whole-map
    assert _pick_rows(7, 512, 2048, 2) == 0
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


# ---- LN+residual-folded variant (bridge norm2 fold, r3) ----

def _ln_params(C, groups, seed=20):
    g = C // groups
    pls = _rand((g,), seed) * 0.1 + 1.0
    plb = _rand((g,), seed + 1) * 0.1
    return pls, plb, jnp.tile(pls, groups), jnp.tile(plb, groups)


@pytest.mark.parametrize("s,C,hidden,groups", [
    (8, 64, 256, 1),      # bridge scale-0 grouping (mult=1)
    (16, 128, 512, 2),    # scale-1 grouping (mult=2)
    (8, 320, 1280, 5),    # scale-2 grouping (mult=5), small map
])
def test_folded_kernel_matches_reference(s, C, hidden, groups):
    from transception_tpu.ops.pallas.mixffn import _reference_impl_ln
    from transception_tpu.ops.pallas.mixffn_kernel import (
        eligible_ln,
        fused_mixffn_ln_skip,
    )
    x = _rand((2, s * s, C), 11, jnp.bfloat16)
    p = _params(C, hidden)
    _, _, lts, ltb = _ln_params(C, groups)
    assert eligible_ln(x.shape, C, hidden, groups, x.dtype)
    got = fused_mixffn_ln_skip(x, lts, ltb, p["w1"], p["b1"], p["dw"],
                               p["dwb"], p["ls"], p["lb"], p["w2"], p["b2"],
                               s=s, hidden=hidden, groups=groups,
                               interpret=True)
    want = _reference_impl_ln(x, lts, ltb, p["w1"], p["b1"], p["dw"],
                              p["dwb"], p["ls"], p["lb"], p["w2"], p["b2"],
                              s, hidden, groups, 1e-5, 1e-5)
    # Group stats go through selector dots (kernel) vs a reshape-mean
    # (reference): both fp32, but the different reduction order can move
    # outputs by a couple of bf16 ULPs at large magnitudes.
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.02, atol=0.1)


def test_folded_facade_grads_match_unfolded_composition():
    """d/dx of fused_mixffn_ln (VJP of the reference-impl mirror) must
    match the unfolded groupLN -> mixffn -> +x composition."""
    import transception_tpu.ops.pallas.mixffn_kernel as mk
    from transception_tpu.ops.pallas import mixffn as fa

    s, C, hidden, groups = 8, 64, 256, 2
    x = _rand((1, s * s, C), 13)
    p = _params(C, hidden)
    _, _, lts, ltb = _ln_params(C, groups)

    def folded(x):
        return fa.fused_mixffn_ln(
            x, lts, ltb, p["w1"], p["b1"], p["dw"], p["dwb"], p["ls"],
            p["lb"], p["w2"], p["b2"], s, hidden, groups).sum()

    def composed(x):
        xn = fa.group_ln(x, lts, ltb, groups)
        out = fa._reference_impl(xn, p["w1"], p["b1"], p["dw"], p["dwb"],
                                 p["ls"], p["lb"], p["w2"], p["b2"],
                                 s, hidden, 1e-5)
        return (out.astype(jnp.float32) + x.astype(jnp.float32)).sum()

    orig = mk.fused_mixffn_ln_skip

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    import unittest.mock as mock
    with mock.patch.object(mk, "fused_mixffn_ln_skip", interp):
        g1 = jax.grad(folded)(x)
    g2 = jax.grad(composed)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("s,C,hidden,groups", [
    (8, 64, 256, 1),      # partial tiling (rows=4, clamped halo windows)
    (16, 64, 256, 2),     # 2 tiles of 8, grouped LN
    (14, 128, 384, 1),    # whole-map mode (MHCA stage-3 geometry)
    (8, 320, 1280, 5),    # bridge scale-2 grouping
])
def test_flash_bwd_matches_reference_vjp(s, C, hidden, groups):
    """The flash Pallas backward (recompute-in-VMEM, on-chip weight-grad
    accumulation across batch x row-tile grid) must match jax.vjp of the
    jnp mirror on every input/param cotangent (fp32)."""
    from transception_tpu.ops.pallas.mixffn import _reference_impl_ln
    from transception_tpu.ops.pallas.mixffn_kernel import (
        eligible_ln_bwd,
        fused_mixffn_ln_skip_bwd,
    )
    x = _rand((2, s * s, C), 41)
    g = _rand((2, s * s, C), 42)
    p = _params(C, hidden, 43)
    _, _, lts, ltb = _ln_params(C, groups, 44)
    args = (x, lts, ltb, p["w1"], p["b1"], p["dw"], p["dwb"], p["ls"],
            p["lb"], p["w2"], p["b2"])
    assert eligible_ln_bwd(x.shape, C, hidden, groups, x.dtype)
    got = fused_mixffn_ln_skip_bwd(
        *args, g, s=s, hidden=hidden, groups=groups, interpret=True)
    _, vjp = jax.vjp(
        lambda *a: _reference_impl_ln(*a, s, hidden, groups, 1e-5, 1e-5),
        *args)
    want = vjp(g)
    names = ("dx", "dlts", "dltb", "dw1", "db1", "ddw", "ddwb", "dls",
             "dlb", "dw2", "db2")
    for n, a, b in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_flash_bwd_edge_energy():
    """Cotangent energy only on the map border: the clamped backward halo
    windows and the convᵀ zero rows must reproduce autodiff exactly."""
    from transception_tpu.ops.pallas.mixffn import _reference_impl_ln
    from transception_tpu.ops.pallas.mixffn_kernel import (
        fused_mixffn_ln_skip_bwd,
    )
    s, C, hidden, groups = 16, 64, 256, 1
    x = _rand((1, s * s, C), 51)
    g = np.zeros((1, s * s, C), np.float32)
    gm = g.reshape(1, s, s, C)
    gm[0, 0], gm[0, -1], gm[0, :, 0], gm[0, :, -1] = 1.0, -1.0, 0.5, -0.5
    g = jnp.asarray(g)
    p = _params(C, hidden, 52)
    _, _, lts, ltb = _ln_params(C, groups, 53)
    args = (x, lts, ltb, p["w1"], p["b1"], p["dw"], p["dwb"], p["ls"],
            p["lb"], p["w2"], p["b2"])
    got = fused_mixffn_ln_skip_bwd(
        *args, g, s=s, hidden=hidden, groups=groups, interpret=True)
    _, vjp = jax.vjp(
        lambda *a: _reference_impl_ln(*a, s, hidden, groups, 1e-5, 1e-5),
        *args)
    want = vjp(g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_flash_bwd_bf16_grads_close():
    """bf16 inputs: the flash backward recomputes in fp32 where autodiff
    of the mirror rounds per-op — grads agree within bf16 tolerance."""
    from transception_tpu.ops.pallas.mixffn import _reference_impl_ln
    from transception_tpu.ops.pallas.mixffn_kernel import (
        fused_mixffn_ln_skip_bwd,
    )
    s, C, hidden, groups = 8, 64, 256, 1
    x = _rand((1, s * s, C), 61).astype(jnp.bfloat16)
    g = _rand((1, s * s, C), 62).astype(jnp.bfloat16)
    p = _params(C, hidden, 63)
    _, _, lts, ltb = _ln_params(C, groups, 64)
    args = (x, lts, ltb, p["w1"], p["b1"], p["dw"], p["dwb"], p["ls"],
            p["lb"], p["w2"], p["b2"])
    got = fused_mixffn_ln_skip_bwd(
        *args, g, s=s, hidden=hidden, groups=groups, interpret=True)
    _, vjp = jax.vjp(
        lambda *a: _reference_impl_ln(*a, s, hidden, groups, 1e-5, 1e-5),
        *args)
    want = vjp(g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-2)


def test_flash_bwd_eligibility():
    from transception_tpu.ops.pallas.mixffn_kernel import eligible_ln_bwd
    # Published train geometries: ETB s=56, bridge scales, MHCA stages.
    assert eligible_ln_bwd((24, 56 * 56, 64), 64, 256, 1, jnp.bfloat16)
    assert eligible_ln_bwd((24, 28 * 28, 128), 128, 512, 2, jnp.bfloat16)
    assert eligible_ln_bwd((24, 14 * 14, 320), 320, 1280, 5, jnp.bfloat16)
    assert eligible_ln_bwd((24, 28 * 28, 64), 64, 192, 1, jnp.bfloat16)
    # Odd map sides (bridge scale-3 / MHCA stage-4) stay on the vjp path.
    assert not eligible_ln_bwd((24, 7 * 7, 512), 512, 2048, 8,
                               jnp.bfloat16)


def test_flash_bwd_module_grads_match_unfolded(monkeypatch):
    """Gradients THROUGH the folded MixFFNSkip module (platform patched
    to tpu, fwd + flash bwd kernels in interpret mode) must match the
    unfolded XLA composition — the exact dispatch path ffn_flash_train
    engages in the train step."""
    import transception_tpu.ops.pallas.mixffn_kernel as mk
    from transception_tpu.ops.pallas import mixffn as fa

    monkeypatch.setattr(fa, "_target_platform", lambda: "tpu")
    for fn in ("fused_mixffn_ln_skip", "fused_mixffn_ln_skip_bwd"):
        orig = getattr(mk, fn)

        def interp(*a, _o=orig, **kw):
            kw["interpret"] = True
            return _o(*a, **kw)

        monkeypatch.setattr(mk, fn, interp)

    s, C, hidden = 8, 64, 256
    x = _rand((1, s * s, C), 71)
    pls, plb, _, _ = _ln_params(C, 1, 72)
    m_fold = MixFFNSkip(C, hidden, use_pallas=True, dtype=jnp.float32)
    m_plain = MixFFNSkip(C, hidden, use_pallas=False, dtype=jnp.float32)
    v = m_fold.init(jax.random.PRNGKey(0), x, s, s,
                    pre_ln=(pls, plb, 1, 1e-5), residual=True)

    def loss(mod, params, xx):
        out = mod.apply(params, xx, s, s, pre_ln=(pls, plb, 1, 1e-5),
                        residual=True)
        return (out.astype(jnp.float32) ** 2).sum()

    g1 = jax.grad(loss, argnums=(1, 2))(m_fold, v, x)
    g2 = jax.grad(loss, argnums=(1, 2))(m_plain, v, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_train_step_model_flash_gating():
    """train_step_model must keep the FFN kernels on (with flash
    backwards) iff cfg.ffn_flash_train — the single source of truth the
    trainer, bench.py and measure_train.py share."""
    from transception_tpu.core.config import TransceptionConfig
    from transception_tpu.models.transception import MSTransception
    from transception_tpu.train.trainer import train_step_model

    base = TransceptionConfig()
    off = train_step_model(MSTransception(base)).cfg
    assert off.bridge_ffn_use_pallas is False
    assert off.use_pallas is False and off.bridge_use_pallas is True
    on = train_step_model(
        MSTransception(TransceptionConfig(ffn_flash_train=True))).cfg
    assert on.bridge_ffn_use_pallas is True
    assert on.etb_ffn_fold is True and on.mhca_ffn_fold is True
    assert on.bridge_attn_fold is False  # eval-only folds stay off


def test_bridge_layer_fold_matches_unfolded():
    """BridgeLayer4's folded FFN section (grouped in-FFN norm2 + residual
    epilogues, engaged when FFN kernels are on) is numerically identical
    to the unfolded stream-LN structure and shares its param tree —
    train (unfolded) and eval (folded) read one checkpoint."""
    from transception_tpu.models.bridge import BridgeGeometry, BridgeLayer4

    rng = np.random.default_rng(1)
    geo = BridgeGeometry(64, (64, 128, 320, 512), 64)  # sides 16,8,4,2
    maps = [jnp.asarray(rng.normal(size=(2, s, s, 64 * m)), jnp.float32)
            for s, m in zip(geo.sides, geo.mults)]
    folded = BridgeLayer4(geo, 8, False, use_pallas=True,
                          dtype=jnp.float32)
    plain = BridgeLayer4(geo, 8, False, use_pallas=True,
                         ffn_use_pallas=False, dtype=jnp.float32)
    v = folded.init(jax.random.PRNGKey(0), maps)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                plain.init(jax.random.PRNGKey(0), maps)))
    np.testing.assert_allclose(
        np.asarray(folded.apply(v, maps)),
        np.asarray(plain.apply(v, maps)), rtol=1e-6, atol=1e-6)


def test_etb_fold_matches_unfolded():
    """EfficientTransformerBlock folds norm2+FFN+residual into the fused
    MixFFN_skip path (groups=1) when use_pallas — identical param tree,
    init values, and (CPU fallback) outputs vs the unfolded block."""
    from transception_tpu.ops.attention import EfficientTransformerBlock

    H = W = 16
    x = _rand((2, H * W, 64), 17)
    folded = EfficientTransformerBlock(64, 64, 64, use_pallas=True,
                                       dtype=jnp.float32)
    plain = EfficientTransformerBlock(64, 64, 64, use_pallas=False,
                                      dtype=jnp.float32)
    v1 = folded.init(jax.random.PRNGKey(0), x, H, W)
    v2 = plain.init(jax.random.PRNGKey(0), x, H, W)
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(v1)[0],
            jax.tree_util.tree_flatten_with_path(v2)[0]):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(folded.apply(v1, x, H, W)),
        np.asarray(plain.apply(v1, x, H, W)), rtol=1e-5, atol=1e-5)


def test_mhca_ffn_fold_matches_unfolded():
    """MHCABlock folds norm2+MixFFN_skip+residual into the fused kernel
    path (groups=1, eps 1e-6) when ffn_fold resolves on — identical param
    tree, init values, and (CPU fallback) outputs vs the unfolded block,
    including under the nn.vmap path-stacking the MHCA stages use."""
    from flax import linen as nn

    from transception_tpu.ops.attention import MHCAEncoder

    P, B, H, W, C = 2, 2, 8, 8, 32

    def venc(ffn_fold):
        return nn.vmap(
            MHCAEncoder, in_axes=(0, None), out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )(C, num_layers=2, num_heads=8, mlp_ratio=3,
          ffn_fold=ffn_fold, dtype=jnp.float32)

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
        np.asarray(plain.apply(v1, x, True)), rtol=1e-5, atol=1e-5)


def test_mhca_ffn_fold_kernel_matches_unfolded(monkeypatch):
    """Same MHCA fold with the REAL kernel path engaged (platform patched
    to tpu, interpret-mode Mosaic): vmapped fold output must match the
    unfolded XLA module chain."""
    import transception_tpu.ops.pallas.mixffn_kernel as mk
    from flax import linen as nn

    from transception_tpu.ops.attention import MHCAEncoder
    from transception_tpu.ops.pallas import mixffn as fa

    monkeypatch.setattr(fa, "_target_platform", lambda: "tpu")
    orig = mk.fused_mixffn_ln_skip

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(mk, "fused_mixffn_ln_skip", interp)

    P, B, H, W, C = 2, 1, 8, 8, 32

    def venc(ffn_fold):
        return nn.vmap(
            MHCAEncoder, in_axes=(0, None), out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )(C, num_layers=1, num_heads=8, mlp_ratio=3,
          ffn_fold=ffn_fold, dtype=jnp.float32)

    x = _rand((P, B, H, W, C), 29)
    folded, plain = venc(True), venc(False)
    v = folded.init(jax.random.PRNGKey(0), x, True)
    np.testing.assert_allclose(
        np.asarray(folded.apply(v, x, True)),
        np.asarray(plain.apply(v, x, True)), rtol=2e-5, atol=2e-5)
