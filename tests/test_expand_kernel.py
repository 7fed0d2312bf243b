"""Fused patch-expand epilogue kernel: numerics vs the XLA path, grads,
and param-tree compatibility between the fused and XLA branches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transception_tpu.ops.common import FinalPatchExpandX4, PatchExpand
from transception_tpu.ops.pallas.expand_kernel import (
    eligible,
    fused_patch_expand,
)
from transception_tpu.ops.pallas.patch_expand import _reference_impl


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), dtype)


def _shuffle(y, H, W, p, c):
    """The XLA-side pixel shuffle applied after the kernel (the kernel
    returns the pre-shuffle (B, N, p²c) tensor)."""
    B = y.shape[0]
    y = y.reshape(B, H, W, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, p * p * H * W, c)


@pytest.mark.parametrize("H,C,p,c", [
    (8, 64, 4, 64),    # FinalPatchExpandX4 geometry (tiny)
    (8, 128, 2, 64),   # PatchExpand geometry
    (56, 64, 4, 64),   # published decoder-head geometry
    (14, 320, 2, 160),  # decoder_2 PatchExpand: whole-map block (rows=H)
])
def test_kernel_matches_reference(H, C, p, c):
    x = _rand((2, H * H, C), 0)
    w = _rand((C, p * p * c), 1)
    scale = _rand((c,), 2) * 0.1 + 1.0
    bias = _rand((c,), 3) * 0.1
    got = _shuffle(fused_patch_expand(x, w, scale, bias, H=H, W=H, p=p,
                                      c=c, interpret=True), H, H, p, c)
    want = _reference_impl(x, w, scale, bias, H, H, p, c, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("H,p,c,ncls", [
    (8, 4, 64, 9),     # tiny decoder-head geometry
    (8, 4, 64, 2),     # ISIC binary head
])
def test_argmax_kernel_matches_reference(H, p, c, ncls):
    """Fused expand+LN+head+argmax == argmax of (reference expand ->
    fp32 head) in pre-shuffle order."""
    from transception_tpu.ops.pallas.expand_kernel import (
        fused_patch_expand_argmax,
    )
    C = c
    x = _rand((2, H * H, C), 0)
    w = _rand((C, p * p * c), 1)
    scale = _rand((c,), 2) * 0.1 + 1.0
    bias = _rand((c,), 3) * 0.1
    hw = _rand((c, ncls), 4)
    hb = _rand((ncls,), 5) * 0.1
    got = fused_patch_expand_argmax(x, w, scale, bias, hw, hb, H=H, W=H,
                                    p=p, c=c, n_class=ncls, interpret=True)
    # reference: pre-shuffle LN output -> fp32 head -> argmax
    y = fused_patch_expand(x, w, scale, bias, H=H, W=H, p=p, c=c,
                           interpret=True)
    y = y.reshape(2, H * H, p * p, c)
    logits = y.astype(jnp.float32) @ hw + hb
    want = jnp.argmax(logits, axis=-1)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(want, np.int32))


def test_decoder_argmax_kernel_branch_matches_conv_branch():
    """DecoderLayer's fused argmax-kernel branch must produce the same
    class ids as the conv+argmax composition (forced via monkeypatched
    can_fuse; interpret-mode kernels on CPU)."""
    import transception_tpu.models.decoder as dec
    import transception_tpu.ops.pallas.patch_expand as pe
    import transception_tpu.ops.pallas.expand_kernel as ek
    from transception_tpu.models.decoder import DecoderLayer
    import functools as ft

    H = 8
    layer = DecoderLayer(32, 64, n_class=9, is_last=True, use_pallas=True,
                         dtype=jnp.bfloat16)  # the kernel branch is bf16-only
    x1 = _rand((2, H * H, 32), 0)
    x2 = _rand((2, H, H, 32), 1)
    v = layer.init(jax.random.PRNGKey(0), x1, x2)

    orig_fuse = pe.can_fuse
    orig_kernel_a = ek.fused_patch_expand_argmax
    orig_kernel_e = ek.fused_patch_expand
    pe.can_fuse = lambda *a, **k: True
    ek.fused_patch_expand_argmax = ft.partial(orig_kernel_a, interpret=True)
    ek.fused_patch_expand = ft.partial(orig_kernel_e, interpret=True)
    try:
        got = layer.apply(v, x1, x2, argmax_head=True)
    finally:
        pe.can_fuse = orig_fuse
        ek.fused_patch_expand_argmax = orig_kernel_a
        ek.fused_patch_expand = orig_kernel_e
    # composition path: XLA pre-shuffle expand + conv + argmax
    want = np.asarray(layer.apply(v, x1, x2, argmax_head=True), np.uint8)
    assert got.shape == want.shape
    # The kernel's head dot runs in the compute dtype (bf16 here) with
    # fp32 accumulation — the weight rounding (~2^-9 relative) can flip
    # argmax near-ties vs the conv branch's fp32 weights, on top of the
    # accumulation-order difference.  On random data that is a small
    # tie-flip fraction, not a systematic error.
    mismatch = (np.asarray(got) != want).mean()
    assert mismatch < 2e-2, mismatch


def test_argmax_kernel_bf16_exact_vs_bf16_reference():
    """In bf16 the kernel's head uses bf16-rounded weights; it must match
    a reference computing the SAME rounded-weight logits exactly."""
    from transception_tpu.ops.pallas.expand_kernel import (
        fused_patch_expand_argmax,
    )
    H, p, c, ncls = 8, 4, 64, 9
    x = _rand((2, H * H, c), 0, jnp.bfloat16)
    w = _rand((c, p * p * c), 1)
    scale = _rand((c,), 2) * 0.1 + 1.0
    bias = _rand((c,), 3) * 0.1
    hw = _rand((c, ncls), 4)
    hb = _rand((ncls,), 5) * 0.1
    got = fused_patch_expand_argmax(x, w, scale, bias, hw, hb, H=H, W=H,
                                    p=p, c=c, n_class=ncls, interpret=True)
    y = fused_patch_expand(x, w, scale, bias, H=H, W=H, p=p, c=c,
                           interpret=True)
    y = y.reshape(2, H * H, p * p, c)
    hw_r = hw.astype(jnp.bfloat16).astype(jnp.float32)
    logits = y.astype(jnp.float32) @ hw_r + hb
    # The kernel emits logits in the compute dtype (bf16 here) and the
    # argmax runs in XLA on the rounded values.
    want = jnp.argmax(logits.astype(jnp.bfloat16), axis=-1)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(want, np.int32))


def test_kernel_bf16():
    H, C, p, c = 8, 64, 4, 64
    x = _rand((1, H * H, C), 0, jnp.bfloat16)
    w = _rand((C, p * p * c), 1)
    scale = jnp.ones((c,))
    bias = jnp.zeros((c,))
    got = _shuffle(fused_patch_expand(x, w, scale, bias, H=H, W=H, p=p,
                                      c=c, interpret=True), H, H, p, c)
    want = _reference_impl(x, w, scale, bias, H, H, p, c, 1e-5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.1, atol=0.1)


def test_eligibility_gate():
    assert eligible((128, 3136, 64), 56, 56, 64, 64, 4, jnp.bfloat16)
    # non-square token count
    assert not eligible((1, 50, 64), 10, 5, 64, 64, 4, jnp.float32)
    # giant weight
    assert not eligible((1, 3136, 2048), 56, 56, 2048, 2048, 4, jnp.float32)
    # non-square map whose N *is* a perfect square must be rejected
    # (ADVICE r2: sqrt(N) inference would wrongly admit 28x112 -> 56x56)
    assert not eligible((1, 3136, 64), 28, 112, 64, 64, 4, jnp.bfloat16)
    # H=W=14 (decoder_2): no small row block divides 14 with rows*W % 8
    # == 0 — must fall back to the whole-map block instead of rejecting
    assert eligible((128, 196, 320), 14, 14, 320, 160, 2, jnp.bfloat16)
    # ... but not when the whole-map tile exceeds VMEM (weight gate
    # passes at in_c=64; 196·4·1664·10 B ≈ 13.0 MB > budget)
    assert not eligible((1, 196, 64), 14, 14, 64, 1664, 2, jnp.bfloat16)


def test_facade_bwd_matches_autodiff():
    from transception_tpu.ops.pallas import patch_expand as fa
    H, C, p, c = 4, 32, 2, 16
    x = _rand((2, H * H, C), 0)
    w = _rand((C, p * p * c), 1)
    scale = _rand((c,), 2) * 0.1 + 1.0
    bias = _rand((c,), 3) * 0.1
    g = _rand((2, p * p * H * H, c), 4)

    def ref(x_, w_, s_, b_):
        return _reference_impl(x_, w_, s_, b_, H, H, p, c, 1e-5)

    _, vjp = jax.vjp(ref, x, w, scale, bias)
    want = vjp(g)
    got = fa._fused_bwd(H, H, p, c, 1e-5, (x, w, scale, bias), g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_param_tree_identical_between_branches(monkeypatch):
    """use_pallas=True must create exactly the same params as the XLA
    branch so checkpoints are interchangeable."""
    from transception_tpu.ops.pallas import patch_expand as fa
    x = jnp.zeros((1, 64, 64), jnp.float32)

    xla = FinalPatchExpandX4(64, use_pallas=False, dtype=jnp.float32)
    v_xla = xla.init(jax.random.PRNGKey(0), x, 8, 8)

    # Force the fused branch on CPU (kernel runs in interpret mode).
    monkeypatch.setattr(fa, "_target_platform", lambda: "tpu")
    import transception_tpu.ops.pallas.expand_kernel as ek
    orig = ek.fused_patch_expand

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(ek, "fused_patch_expand", interp)
    fused = FinalPatchExpandX4(64, use_pallas=True, dtype=jnp.float32)
    v_fused = fused.init(jax.random.PRNGKey(0), x, 8, 8)

    flat_a = jax.tree_util.tree_flatten_with_path(v_xla)[0]
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(v_fused)[0]}
    assert len(flat_a) == len(flat_b)
    for k, va in flat_a:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_b, ks
        assert va.shape == flat_b[ks].shape
        np.testing.assert_array_equal(np.asarray(va),
                                      np.asarray(flat_b[ks]))
    # and the outputs agree
    out_a = xla.apply(v_xla, x, 8, 8)
    out_b = fused.apply(v_fused, x, 8, 8)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=2e-5, atol=2e-5)
