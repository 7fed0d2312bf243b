"""Fused bridge softmax-attention Pallas kernel: numerics vs the XLA path.

Interpreter mode on CPU (the kernel is TPU-only); the compiled path runs in
bench.py on hardware. Shapes mirror the bridge: N-token queries against an
M-token Scale_reduce'd KV (M << N), head=1, d=64 (MSTr.py:2254-2292).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transception_tpu.ops.pallas.bridge_attention_kernel import (
    bridge_softmax_attention,
    eligible,
)


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), dtype)


def _xla_reference(q, k, v, scale):
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@pytest.mark.parametrize("shape", [
    # (B, h, N, M, d): N=124 mirrors the img-32 bridge total; 6076-like
    # non-tile-multiple N exercises the pad/slice path.
    (2, 1, 124, 28, 64),
    (1, 1, 600, 96, 64),
    (1, 2, 512, 128, 32),
])
def test_kernel_matches_xla(shape):
    B, h, N, M, d = shape
    q = _rand((B, h, N, d), 0)
    k = _rand((B, h, M, d), 1)
    v = _rand((B, h, M, d), 2)
    scale = d ** -0.5
    got = bridge_softmax_attention(q, k, v, scale=scale, interpret=True)
    want = _xla_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_bf16_close_to_f32():
    B, h, N, M, d = 1, 1, 300, 49, 64
    q = _rand((B, h, N, d), 0)
    k = _rand((B, h, M, d), 1)
    v = _rand((B, h, M, d), 2)
    want = _xla_reference(q, k, v, d ** -0.5)
    got = bridge_softmax_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), scale=d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.05)


def test_vmem_gate():
    # K/V too large for VMEM residency -> ineligible.
    assert not eligible((1, 1, 6076, 512), (1, 1, 40000, 512), jnp.float32)
    # the published bridge shape is eligible
    assert eligible((128, 1, 6076, 64), (128, 1, 784, 64), jnp.bfloat16)
    q = jnp.zeros((1, 1, 6076, 512), jnp.float32)
    k = jnp.zeros((1, 1, 40000, 512), jnp.float32)
    with pytest.raises(NotImplementedError):
        bridge_softmax_attention(q, k, k, scale=1.0, interpret=True)


@pytest.mark.parametrize("shape", [
    (2, 1, 124, 28, 64),   # non-tile-multiple N: pad path, zero-g rows
    (1, 1, 600, 96, 64),
    (1, 2, 512, 128, 32),  # N divisible by tile
])
def test_bwd_kernel_matches_autodiff(shape):
    """The flash-style Pallas backward (interpret mode) must match
    autodiff through the XLA reference for all of dq/dk/dv, including
    the padded-N path (zero-padded g rows contribute nothing)."""
    from transception_tpu.ops.pallas.bridge_attention_kernel import (
        bridge_softmax_attention_bwd,
    )
    B, h, N, M, d = shape
    q = _rand((B, h, N, d), 7)
    k = _rand((B, h, M, d), 8)
    v = _rand((B, h, M, d), 9)
    g = _rand((B, h, N, d), 10)
    scale = d ** -0.5

    def ref_fn(q, k, v):
        return _xla_reference(q, k, v, scale)

    _, ref_vjp = jax.vjp(ref_fn, q, k, v)
    dq_ref, dk_ref, dv_ref = ref_vjp(g)
    dq, dk, dv = bridge_softmax_attention_bwd(q, k, v, g, scale=scale,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=2e-4, atol=2e-5)


def test_facade_gradients_match_xla():
    """The custom-VJP facade's backward must equal autodiff through the
    XLA reference (CPU: facade returns None, so compare the VJP fns
    directly via the private _fused path in interpret mode)."""
    from transception_tpu.ops.pallas import bridge_attention as fa
    B, h, N, M, d = 1, 1, 96, 24, 32
    q = _rand((B, h, N, d), 3)
    k = _rand((B, h, M, d), 4)
    v = _rand((B, h, M, d), 5)
    scale = d ** -0.5
    g = _rand((B, h, N, d), 6)

    def ref_fn(q, k, v):
        return _xla_reference(q, k, v, scale)

    _, ref_vjp = jax.vjp(ref_fn, q, k, v)
    dq_ref, dk_ref, dv_ref = ref_vjp(g)
    dq, dk, dv = fa._fused_bwd(scale, (q, k, v), g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref),
                               rtol=1e-4, atol=1e-5)


# ---- q/proj/residual-folded variant (r3) ----

def _folded_inputs(B, N, C, heads, M, seed=30, dtype=jnp.bfloat16):
    d = C // heads
    return dict(
        x=_rand((B, N, C), seed, dtype),
        res=_rand((B, N, C), seed + 1, dtype),
        wq=_rand((C, C), seed + 2) * 0.2, bq=_rand((C,), seed + 3) * 0.1,
        wp=_rand((C, C), seed + 4) * 0.2, bp=_rand((C,), seed + 5) * 0.1,
        k=_rand((B, heads, M, d), seed + 6),
        v=_rand((B, heads, M, d), seed + 7))


@pytest.mark.parametrize("B,N,C,heads,M", [
    (2, 1024, 64, 1, 96),    # the PUBLISHED bridge: head=1, d=64
    (2, 1024, 64, 8, 96),    # 8 heads of d=8, tile-multiple N
    (1, 600, 64, 8, 96),     # pad/slice path
    (1, 512, 128, 4, 64),    # d=32
])
def test_folded_kernel_matches_reference(B, N, C, heads, M):
    from transception_tpu.ops.pallas.bridge_attention import (
        _reference_folded,
    )
    from transception_tpu.ops.pallas.bridge_attention_kernel import (
        bridge_attention_folded,
        eligible_folded,
    )
    p = _folded_inputs(B, N, C, heads, M)
    dt = p["x"].dtype
    k, v = p["k"].astype(dt), p["v"].astype(dt)
    d = C // heads
    assert eligible_folded(p["x"].shape, k.shape, heads, dt)
    got = bridge_attention_folded(p["x"], p["res"], p["wq"], p["bq"], k, v,
                                  p["wp"], p["bp"], scale=d ** -0.5,
                                  interpret=True)
    want = _reference_folded(p["x"], p["res"], p["wq"], p["bq"], k, v,
                             p["wp"], p["bp"], d ** -0.5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.02, atol=0.0625)


def test_folded_matches_unfolded_module_composition():
    """The folded reference (and hence the kernel, by the test above) must
    equal the unfolded module composition: q-Dense -> heads -> softmax
    attention -> merge -> proj-Dense -> + residual, at identical rounding
    points."""
    B, N, C, heads, M = 1, 256, 64, 8, 32
    d = C // heads
    from transception_tpu.ops.pallas.bridge_attention import (
        _reference_folded,
    )
    p = _folded_inputs(B, N, C, heads, M, seed=41)
    dt = p["x"].dtype
    k, v = p["k"].astype(dt), p["v"].astype(dt)
    got = _reference_folded(p["x"], p["res"], p["wq"], p["bq"], k, v,
                            p["wp"], p["bp"], d ** -0.5)
    q = (jnp.einsum("bnc,cd->bnd", p["x"], p["wq"].astype(dt),
                    preferred_element_type=jnp.float32)
         + p["bq"]).astype(dt)
    q = q.reshape(B, N, heads, d).transpose(0, 2, 1, 3)
    out = _xla_reference(q, k, v, d ** -0.5)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    proj = (jnp.einsum("bnc,cd->bnd", out, p["wp"].astype(dt),
                       preferred_element_type=jnp.float32)
            + p["bp"]).astype(dt)
    want = proj + p["res"]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.02, atol=0.0625)


def test_bridge_layer_attn_fold_matches_plain():
    """BridgeLayer4 with all folds on (kernels gate off on CPU, but the
    module restructure runs) equals the fully unfolded layer bit-for-bit
    in fp32, with identical param trees AND identical init values."""
    from transception_tpu.models.bridge import BridgeGeometry, BridgeLayer4

    rng = np.random.default_rng(1)
    geo = BridgeGeometry(64, (64, 128, 320, 512), 64)
    maps = [jnp.asarray(rng.normal(size=(2, s, s, 64 * m)), jnp.float32)
            for s, m in zip(geo.sides, geo.mults)]
    folded = BridgeLayer4(geo, 8, False, use_pallas=True,
                          dtype=jnp.float32)
    plain = BridgeLayer4(geo, 8, False, use_pallas=True,
                         ffn_use_pallas=False, attn_fold=False,
                         dtype=jnp.float32)
    v1 = folded.init(jax.random.PRNGKey(0), maps)
    v2 = plain.init(jax.random.PRNGKey(0), maps)
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(v1)[0],
            jax.tree_util.tree_flatten_with_path(v2)[0]):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(folded.apply(v1, maps)),
                               np.asarray(plain.apply(v1, maps)),
                               rtol=1e-6, atol=1e-6)
