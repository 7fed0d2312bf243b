"""Quick device-trace measurement of the b=128 argmax forward.

Usage: python scripts/measure_fwd.py [batch] [--logits] [--no-pallas]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 128
    use_argmax = "--logits" not in sys.argv

    import dataclasses as dc
    from transception_tpu.core.config import TransceptionConfig
    from transception_tpu.models.transception import MSTransception
    from transception_tpu.utils.profiling import device_time_per_call

    cfg = TransceptionConfig()
    if "--no-pallas" in sys.argv:
        cfg = dc.replace(cfg, use_pallas=False)
    model = MSTransception(cfg)
    x = jnp.zeros((batch, 224, 224, 1), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)

    if use_argmax:
        def fwd(v, x):
            return model.apply(v, x, train=False, argmax=True)
    else:
        def fwd(v, x):
            return jnp.argmax(model.apply(v, x, train=False),
                              axis=-1).astype(jnp.uint8)

    compiled = jax.jit(fwd).lower(variables, x).compile()
    compiled(variables, x).block_until_ready()
    dev_time, _ = device_time_per_call(lambda: compiled(variables, x),
                                       iters=5)
    if dev_time is None:
        print("no device trace")
        return
    print(f"device time: {dev_time * 1e3:.2f} ms/call -> "
          f"{batch / dev_time:.0f} slices/s  (batch {batch}, "
          f"argmax={use_argmax})")


if __name__ == "__main__":
    main()
