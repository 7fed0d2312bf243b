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
