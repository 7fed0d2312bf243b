"""Quick device probe: full-graph b=128 argmax forward, default combo
(etb-only) vs default + mhca_block_fold, with argmax-parity check.

First compile of the block-fold graph is cold (~minutes through the
tunnel); run with a generous timeout. Full-grid attribution lives in
scripts/measure_folds.py — this probe answers only "does the whole-block
MHCA kernel compile on real Mosaic and win in the full graph".
"""

from __future__ import annotations

import dataclasses as dc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import numpy as np

    from transception_tpu.core.config import TransceptionConfig
    from transception_tpu.models.transception import MSTransception
    from transception_tpu.utils.profiling import device_time_per_call

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    base = TransceptionConfig()
    x = jnp.zeros((batch, 224, 224, 1), jnp.float32)
    xr = jnp.asarray(
        np.random.default_rng(0).random((batch, 224, 224, 1)), jnp.float32)

    outs = {}
    for name, over in [("default", {}),
                       ("block-on", dict(mhca_block_fold=True))]:
        cfg = dc.replace(base, **over)
        model = MSTransception(cfg)
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), x, train=False)
        compiled = jax.jit(
            lambda v, x: model.apply(v, x, train=False, argmax=True)
        ).lower(variables, x).compile()
        compiled(variables, x).block_until_ready()
        t, _ = device_time_per_call(lambda: compiled(variables, x), iters=5)
        outs[name] = np.asarray(compiled(variables, xr))
        print(f"{name:>9}: {t * 1e3:8.2f} ms/call -> {batch / t:7.0f} "
              f"slices/s", flush=True)
    mism = float((outs["block-on"] != outs["default"]).mean())
    print(f"argmax mismatch block-on vs default: {mism:.6%}")


if __name__ == "__main__":
    main()
