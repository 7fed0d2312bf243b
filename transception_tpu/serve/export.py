"""Serving export: AOT-serialized StableHLO model artifacts.

`export_model` bakes the trained weights into a single serialized
jax.export artifact (StableHLO) for the inference function
(B, H, W, C) -> (B, H, W, num_classes) argmax-ready logits. The artifact is
deployable without the model source: `load_model(path)` returns a callable
backed by the deserialized computation, runnable under jit on any platform
the export targeted (TPU by default, plus CPU for testing).

The reference has no serving story at all; this plus the batched
predictors (eval/inference.py) is the production path.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

MAGIC = b"TXTPU1\n"


def export_model(model, variables, batch: int, img_size: int = 224,
                 in_ch: int = 1,
                 platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the eval-mode forward with weights baked in."""

    def fn(x):
        return model.apply(variables, x, train=False)

    x_spec = jax.ShapeDtypeStruct((batch, img_size, img_size, in_ch),
                                  jnp.float32)
    platforms = list(platforms) if platforms else None
    exported = jexport.export(jax.jit(fn), platforms=platforms)(x_spec)
    return exported.serialize()


def load_model(data: bytes) -> Callable:
    """Deserialize into a jit-callable forward."""
    exported = jexport.deserialize(data)

    def fn(x):
        return exported.call(x)

    return jax.jit(fn)


def save_exported(path: str, data: bytes):
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(data)


def load_exported(path: str) -> Callable:
    with open(path, "rb") as f:
        blob = f.read()
    if not blob.startswith(MAGIC):
        raise ValueError(f"{path} is not a transception export artifact")
    return load_model(blob[len(MAGIC):])
