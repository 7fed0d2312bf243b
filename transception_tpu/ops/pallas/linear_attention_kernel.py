"""Pallas TPU kernel body for fused linear attention (stub for now).

Raises NotImplementedError until the tuned kernel lands; callers fall back
to the XLA einsum pair, which is numerically identical.
"""

from __future__ import annotations


def linear_attention(q, k, v):
    raise NotImplementedError
