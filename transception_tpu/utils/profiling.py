"""Profiling / observability utilities.

The reference parses a --throughput flag and never uses it
(train_MSTransception.py:74). Here: a real throughput meter, per-component
device timers, XLA cost analysis, and jax.profiler trace capture for
TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def time_jitted(fn: Callable, *args, iters: int = 20,
                warmup: int = 2) -> float:
    """Median-free simple wall timing of a jitted fn; returns sec/iter."""
    jf = jax.jit(fn)
    for _ in range(warmup):
        out = jf(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def throughput(fn: Callable, *args, batch: int, iters: int = 20) -> float:
    """Images (slices) per second of a jitted fn."""
    return batch / time_jitted(fn, *args, iters=iters)


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """XLA-compiled FLOP / byte estimates for a callable."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {k: float(v) for k, v in ca.items()
            if k in ("flops", "bytes accessed", "optimal_seconds")}


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a TensorBoard profiler trace around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_model_sections(cfg=None, batch: int = 32,
                           log=print) -> Dict[str, float]:
    """Time encoder / bridge / decoder of the flagship model separately.

    Each section is jitted standalone with the real upstream activations as
    inputs, so the numbers sum approximately to the full forward."""
    from transception_tpu.core.config import TransceptionConfig
    from transception_tpu.models.bridge import BridgeBlock4, BridgeGeometry
    from transception_tpu.models.msvit import MSViT
    from transception_tpu.models.transception import MSTransception

    cfg = cfg or TransceptionConfig()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, cfg.img_size, cfg.img_size, 3), jnp.float32)

    results: Dict[str, float] = {}

    backbone = MSViT(cfg)
    vb = jax.jit(backbone.init, static_argnames=("train",))(rng, x, train=False)
    enc_fn = lambda v, x: backbone.apply(v, x, train=False)  # noqa: E731
    results["encoder_s"] = time_jitted(enc_fn, vb, x)
    enc_out = jax.jit(enc_fn)(vb, x)

    geo = BridgeGeometry(cfg.img_size, cfg.dims, cfg.bridge_dim)
    bridge = BridgeBlock4(geo, cfg.bridge_heads, cfg.br_ch_att_list,
                          cfg.reduction_ratios, dtype=cfg.compute_dtype)
    vbr = bridge.init(rng, enc_out)
    results["bridge_s"] = time_jitted(
        lambda v, e: bridge.apply(v, e), vbr, enc_out)

    model = MSTransception(cfg)
    vm = jax.jit(model.init, static_argnames=("train",))(rng, x, train=False)
    results["full_s"] = time_jitted(
        lambda v, x: model.apply(v, x, train=False), vm, x)
    results["decoder_s"] = max(
        results["full_s"] - results["encoder_s"] - results["bridge_s"], 0.0)
    results["slices_per_s"] = batch / results["full_s"]
    if log:
        for k, v in results.items():
            log(f"{k}: {v:.6f}")
    return results


if __name__ == "__main__":
    profile_model_sections()
