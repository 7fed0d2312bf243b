"""Measure the r3 eval folds on TPU: device-time of the b=128 argmax
forward under each fold configuration, so each fold's win is attributed
separately (README perf ledger).

Each combo pins all three knobs explicitly (the defaults moved to the
measured winner in r4, so deltas-from-default would be ambiguous):
bridge_attn_fold / bridge_ffn_use_pallas (also carries the bridge LN
fold, which rides the FFN kernels) / etb_attn_fold.

r4 measured table (b=128, v5e device trace; reproducible to 0.01 ms):
  etb-only 124.00 ms (WINNER -> the default), attn-off 125.50,
  all-on 127.33, folds-off 127.36, ffn-only 129.02, etb-off 130.83,
  etbffn-off 131.45, ffn-off 138.54. The one-off deltas are NOT
  additive — XLA fusion interactions across the fold boundaries
  dominate. etbffn-off (the 4th axis: the 14 fused MixFFN_skip
  instances in the ETB blocks handed back to XLA) is a 7.4 ms LOSS
  vs the default, so those kernels stay on.

Usage: python scripts/measure_folds.py [batch]     (--help prints this)

IMPORTANT for future sweeps: because the deltas are non-additive, always
rerun the FULL combination grid above — a one-off delta from the current
default misattributes XLA fusion interactions to the toggled knob (this
is exactly how the r3 defaults shipped two net-loss folds).
"""

from __future__ import annotations

import dataclasses as dc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        return
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from transception_tpu.core.config import TransceptionConfig
    from transception_tpu.models.transception import MSTransception
    from transception_tpu.utils.profiling import device_time_per_call

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    base = TransceptionConfig()
    x = jnp.zeros((batch, 224, 224, 1), jnp.float32)

    def combo(attn, ffn, etb, etb_ffn=True):
        return dict(bridge_attn_fold=attn, bridge_ffn_use_pallas=ffn,
                    etb_attn_fold=etb, etb_ffn_fold=etb_ffn)

    configs = [
        ("all-on", combo(True, True, True)),
        ("attn-off", combo(False, True, True)),
        ("ffn-off", combo(True, False, True)),
        ("etb-off", combo(True, True, False)),
        ("ffn-only", combo(False, True, False)),
        ("etb-only", combo(False, False, True)),  # the r4 default
        # The 4th axis: ETB FFN sub-block fully XLA (fused MixFFN_skip
        # kernels off in the 14 encoder/decoder blocks), rest at default.
        ("etbffn-off", combo(False, False, True, etb_ffn=False)),
        ("folds-off", combo(False, False, False)),
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
