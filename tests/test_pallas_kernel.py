"""Fused linear-attention Pallas kernel: numerics vs the XLA einsum path.

Runs in interpreter mode on CPU (the kernel itself is TPU-only); the real
compiled path is exercised by bench.py / __graft_entry__.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transception_tpu.ops.attention import (
    efficient_linear_attention,
    factorized_attention,
)
from transception_tpu.ops.pallas.linear_attention_kernel import linear_attention


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape), dtype)


@pytest.mark.parametrize("shape", [(2, 1, 64, 64), (1, 2, 49, 128),
                                   (2, 2, 128, 320)])
@pytest.mark.parametrize("q_softmax", [False, True])
def test_kernel_matches_xla(shape, q_softmax):
    q, k, v = (_rand(shape, i) for i in range(3))
    got = linear_attention(q, k, v, q_softmax=q_softmax, interpret=True)
    if q_softmax:
        want = efficient_linear_attention(q, k, v, use_pallas=False)
    else:
        want = factorized_attention(q, k, v, 1.0, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tiny_head_dim_gate_raises():
    q = jnp.zeros((1, 8, 49, 40), jnp.float32)
    with pytest.raises(NotImplementedError):
        linear_attention(q, q, q, interpret=True)


def test_kernel_bf16_close_to_f32():
    shape = (1, 4, 64, 64)
    q, k, v = (_rand(shape, i) for i in range(3))
    want = factorized_attention(q, k, v, 1.0, use_pallas=False)
    got = linear_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                           v.astype(jnp.bfloat16), interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.05)


def test_vmem_guard_raises():
    big = (1, 1, 8192, 512)
    q, k, v = (jnp.zeros(big, jnp.float32) for _ in range(3))
    with pytest.raises(NotImplementedError):
        linear_attention(q, k, v, interpret=True)


def test_dispatch_falls_back_off_tpu():
    """On CPU the facade must return None so callers use the XLA path."""
    from transception_tpu.ops.pallas.linear_attention import (
        fused_linear_attention,
    )
    q = jnp.zeros((1, 1, 16, 16))
    assert fused_linear_attention(q, q, q) is None


@pytest.mark.parametrize("q_softmax", [False, True])
def test_custom_vjp_backward_matches_autodiff(q_softmax):
    """The hand-written einsum backward (used when the fused kernel runs
    under jax.grad) must equal autodiff of the XLA reference path."""
    from transception_tpu.ops.pallas.linear_attention import _fused_bwd
    q, k, v = (_rand((2, 1, 32, 64), i) for i in range(3))
    g = _rand((2, 1, 32, 64), 9)

    def ref(q, k, v):
        if q_softmax:
            out = efficient_linear_attention(q, k, v, use_pallas=False)
        else:
            out = factorized_attention(q, k, v, 1.0, use_pallas=False)
        return jnp.sum(out * g)

    want = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    got = _fused_bwd(q_softmax, (q, k, v), g)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_efficient_attention_use_pallas_flag_safe_on_cpu():
    q, k, v = (_rand((1, 2, 32, 16), i) for i in range(3))
    a = efficient_linear_attention(q, k, v, use_pallas=True)
    b = efficient_linear_attention(q, k, v, use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
