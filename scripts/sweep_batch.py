"""Forward-throughput batch sweep (device-trace timed).

Usage: python scripts/sweep_batch.py [batches...]   (default: 64 128 192 256)

Re-checks the r2 note that "b=128 saturates the chip" after the r3 kernel
work — per-batch fixed costs (weight VMEM loads, small-op dispatch) have
dropped, so the optimum may have moved.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    fold = "--block-fold" in sys.argv
    batches = [int(a) for a in sys.argv[1:] if not a.startswith("--")] \
        or [64, 128, 192, 256]

    from transception_tpu.core.config import TransceptionConfig
    from transception_tpu.models.transception import MSTransception
    from transception_tpu.utils.profiling import device_time_per_call

    cfg = TransceptionConfig(mhca_block_fold=True) if fold \
        else TransceptionConfig()
    model = MSTransception(cfg)
    x0 = jnp.zeros((1, 224, 224, 1), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x0, train=False)

    for b in batches:
        x = jnp.zeros((b, 224, 224, 1), jnp.float32)
        compiled = jax.jit(
            lambda v, x: model.apply(v, x, train=False, argmax=True)
        ).lower(variables, x).compile()
        compiled(variables, x).block_until_ready()
        t, _ = device_time_per_call(lambda: compiled(variables, x), iters=5)
        if t is None:
            print(f"b={b}: no device trace")
            continue
        print(f"b={b:4d}: {t * 1e3:7.2f} ms/call -> {b / t:7.1f} slices/s",
              flush=True)


if __name__ == "__main__":
    main()
