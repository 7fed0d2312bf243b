"""Dispatch facade for the fused Pallas linear-attention kernel.

Returns None when the kernel can't run (non-TPU backend, VMEM-exceeding
shape) so callers fall back to the numerically-identical XLA einsum pair.
"""

from __future__ import annotations

import jax


def _target_platform() -> str:
    # jax_default_device overrides the backend (some TPU plugins ignore
    # JAX_PLATFORMS, so the default device is the reliable signal).
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def fused_linear_attention(q, k, v, q_softmax: bool = False):
    """q, k: (B, h, N, dk) raw (pre-softmax); v: (B, h, N, dv).
    Computes softmax_N(K) internally; optionally softmax_d(Q)."""
    if _target_platform() != "tpu":
        return None
    from transception_tpu.ops.pallas import linear_attention_kernel as lak
    try:
        return lak.linear_attention(q, k, v, q_softmax=q_softmax)
    except NotImplementedError:
        return None
