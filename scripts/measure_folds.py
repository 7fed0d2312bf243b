"""Measure the r3 eval folds on TPU: device-time of the b=128 argmax
forward under each fold configuration, so each fold's win is attributed
separately (README perf ledger).

Configs:
  all-on    : default (attn fold + bridge FFN LN fold + ETB fold)
  attn-off  : bridge_attn_fold=False
  ffn-off   : bridge_ffn_use_pallas=False (also disables the bridge LN
              fold, which rides the FFN kernels)
  folds-off : both off (the r3-early 127.8 ms baseline structure)

Usage: python scripts/measure_folds.py [batch]
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
    from transception_tpu.core.config import TransceptionConfig
    from transception_tpu.models.transception import MSTransception
    from transception_tpu.utils.profiling import device_time_per_call

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    base = TransceptionConfig()
    x = jnp.zeros((batch, 224, 224, 1), jnp.float32)

    configs = [
        ("all-on", {}),
        ("attn-off", dict(bridge_attn_fold=False)),
        ("ffn-off", dict(bridge_ffn_use_pallas=False)),
        ("etb-off", dict(etb_attn_fold=False)),
        ("folds-off", dict(bridge_attn_fold=False,
                           bridge_ffn_use_pallas=False,
                           etb_attn_fold=False)),
    ]
    import numpy as np
    xr = jnp.asarray(
        np.random.default_rng(0).random((batch, 224, 224, 1)), jnp.float32)
    outs = {}
    for name, over in configs:
        cfg = dc.replace(base, **over) if over else base
        model = MSTransception(cfg)
        try:
            variables = jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), x, train=False)
            compiled = jax.jit(
                lambda v, x: model.apply(v, x, train=False, argmax=True)
            ).lower(variables, x).compile()
            compiled(variables, x).block_until_ready()
            t, _ = device_time_per_call(lambda: compiled(variables, x),
                                        iters=5)
            outs[name] = np.asarray(compiled(variables, xr))
        except Exception as e:
            print(f"{name:>10}: FAILED - {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        if t is None:
            print(f"{name:>10}: no device trace")
        else:
            print(f"{name:>10}: {t * 1e3:8.2f} ms/call -> "
                  f"{batch / t:7.0f} slices/s")
    # Value parity: argmax class ids vs the unfolded structure (params are
    # identical by construction; bf16-ULP shifts may flip rare near-ties).
    if "folds-off" in outs:
        ref = outs["folds-off"]
        for name, o in outs.items():
            if name == "folds-off":
                continue
            mism = float((o != ref).mean())
            print(f"{name:>10}: argmax mismatch vs folds-off: {mism:.6%}")


if __name__ == "__main__":
    main()
