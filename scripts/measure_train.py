"""Device-trace measurement of the train step at a given batch size.

Usage: python scripts/measure_train.py [batch] [--std-head] [--flash]
Mirrors Trainer's kernel gating (XLA everywhere except the bridge
attention, which has a real Pallas backward) and its wide-layout loss
(--std-head measures the standard post-shuffle head instead;
--flash keeps the fused MixFFN_skip kernels on with the flash Pallas
backward, cfg.ffn_flash_train).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    wide = "--std-head" not in sys.argv
    flash = "--flash" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 24

    from transception_tpu.core.config import TrainConfig, TransceptionConfig
    from transception_tpu.models.transception import MSTransception
    from transception_tpu.ops.common import set_safe_dwconv_kernel_grad
    from transception_tpu.train.state import create_train_state
    from transception_tpu.train.trainer import make_train_step, train_step_model
    from transception_tpu.utils.profiling import device_time_per_call

    # Single-chip measurement: mirror Trainer's mesh gating (a 1x1 mesh
    # takes XLA's native conv grads — parallel/mesh.py:needs_safe_dwconv_grad).
    set_safe_dwconv_kernel_grad(False)
    cfg = TransceptionConfig(ffn_flash_train=flash)
    # The trainer's exact train-step kernel gating (single source of truth).
    model = train_step_model(MSTransception(cfg))
    x = jnp.zeros((batch, 224, 224, 1), jnp.float32)
    y = jnp.zeros((batch, 224, 224), jnp.int32)
    state = create_train_state(model, TrainConfig(batch_size=batch), 92, x,
                               jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, 9, 0.4, 0.6, wide_head=wide),
                   donate_argnums=(0,))
    state, m = step(state, x, y, jax.random.PRNGKey(1))
    jax.block_until_ready(m)
    holder = {"s": state}

    def call():
        holder["s"], mm = step(holder["s"], x, y, jax.random.PRNGKey(2))
        return mm

    t, _ = device_time_per_call(call, iters=5)
    if t is None:
        print("no device trace")
        return
    print(f"train step bs={batch} ({'wide' if wide else 'std'} head): "
          f"{t * 1e3:.2f} ms -> "
          f"{batch / t:.1f} imgs/s/chip (device trace)")


if __name__ == "__main__":
    main()
