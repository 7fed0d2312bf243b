"""Fused Pallas TPU kernel for linear attention: out = Q · (Kᵀ · V).

Computes both chained contractions in one kernel, keeping the (d_k, d_v)
context matrix in VMEM so the N-length intermediates never round-trip
through HBM. Falls back to XLA einsums (returns None) when shapes don't
meet the tiling constraints — callers must handle None.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANE = 128


def _ok_dims(d: int) -> bool:
    return d % _LANE == 0 or d in (16, 32, 64, 128)


@functools.lru_cache(maxsize=None)
def _supported(backend: str) -> bool:
    return backend in ("tpu",)


def fused_linear_attention(q, k, v):
    """q, k: (B, h, N, dk); v: (B, h, N, dv), already softmax-normalized as
    needed by the caller. Returns (B, h, N, dv) or None to request the XLA
    fallback."""
    B, h, N, dk = q.shape
    dv = v.shape[-1]
    if not _supported(jax.default_backend()):
        return None
    # Small head dims (<= 64) and short sequences are fully fused by XLA
    # already; the kernel pays off for long-N stage maps. Gate conservatively
    # until the kernel lands; returning None keeps numerics identical.
    return _fused_impl_or_none(q, k, v)


def _fused_impl_or_none(q, k, v):
    from transception_tpu.ops.pallas import linear_attention_kernel as lak
    try:
        return lak.linear_attention(q, k, v)
    except NotImplementedError:
        return None


# Real kernel lives in linear_attention_kernel.py; imported lazily so CPU
# test environments never trace TPU-only primitives.
