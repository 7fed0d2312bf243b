"""Tile-size sweep for the fused bridge-attention kernel (device-trace).

Usage: python scripts/tune_bridge_attn.py [tiles...]   (default 512 768 1024)

The forward kernel runs grid=(B·h, N/tile) with K/V VMEM-resident; per
grid step the MXU work is ~2·tile·M·d·2 FLOP and the VPU runs a 5-pass
fp32 softmax over (tile, M). Larger tiles amortize per-step overheads at
the cost of VMEM (logits tile·M·4 B ×~3 live + double-buffered Q/out).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    tiles = [int(a) for a in sys.argv[1:]] or [512, 768, 1024]

    from transception_tpu.ops.pallas import bridge_attention_kernel as bak
    from transception_tpu.utils.profiling import device_time_per_call

    B, h, N, M, d = 128, 1, 6144, 784, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, h, N, d), jnp.bfloat16)
    k = jax.random.normal(kk, (B, h, M, d), jnp.bfloat16)
    v = jax.random.normal(kv, (B, h, M, d), jnp.bfloat16)
    scale = d ** -0.5

    ref = None
    for tile in tiles:
        bak._TILE_N = tile
        # bridge_softmax_attention is module-level jitted: without clearing
        # its trace cache the sweep would silently re-run the first tile's
        # kernel for every entry (the inner pjit cache is keyed on shapes,
        # not on the mutated global).
        bak.bridge_softmax_attention.clear_cache()
        try:
            fn = jax.jit(lambda q, k, v: bak.bridge_softmax_attention(
                q, k, v, scale))
            out = fn(q, k, v)
            out.block_until_ready()
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(f"tile={tile}: FAILED {type(e).__name__}: {e}")
            continue
        if ref is None:
            ref = out
        else:
            diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                         - ref.astype(jnp.float32))))
            assert diff < 1e-2, f"tile={tile} diverges: {diff}"
        t, _ = device_time_per_call(lambda: fn(q, k, v), iters=5)
        print(f"tile={tile:5d}: {t * 1e3:6.3f} ms/call"
              if t else f"tile={tile}: no trace", flush=True)
    bak._TILE_N = 512


if __name__ == "__main__":
    main()
