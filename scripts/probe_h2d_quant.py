"""Transfer-cut experiment (VERDICT r4 #7): uint8-quantized raw-slice H2D
for the device_resample volume path.

Measures p50 per-volume latency (bench.py methodology: 148x512² volume,
chunk 74, N=7 runs, materialized uint8 predictions force real D2H) for
bf16 raw H2D (78 MB/volume, the r4 default) vs uint8 (39 MB/volume,
transfer_quant=8, dequantized on device), plus argmax agreement between
the two — quantization error 2e-3 sits at the bf16 input-resolution
scale, so flips should be boundary-pixel noise.

Usage: python scripts/probe_h2d_quant.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import numpy as np

    from transception_tpu.core.config import TransceptionConfig
    from transception_tpu.eval.inference import (
        _resize_pred_back,
        make_predictor,
    )
    from transception_tpu.models.transception import MSTransception

    model = MSTransception(TransceptionConfig())
    x = jnp.zeros((1, 224, 224, 1), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    vol = np.random.default_rng(0).random((148, 512, 512)).astype(np.float32)

    preds = {}
    for name, quant in [("bf16", 0), ("uint8", 8)]:
        p = make_predictor(model, variables, 224, batch=74,
                           device_resample=True, transfer_quant=quant)
        _resize_pred_back(p.predict_volume(vol[:75]), 512, 512)  # warm
        lat = []
        for _ in range(7):
            t0 = time.perf_counter()
            pred = _resize_pred_back(p.predict_volume(vol), 512, 512)
            lat.append(time.perf_counter() - t0)
        preds[name] = pred
        lat = sorted(lat)
        print(f"{name:>6}: p50 {lat[len(lat) // 2]:.3f} s  "
              f"runs {[round(v, 3) for v in lat]}", flush=True)
    agree = float((preds["bf16"] == preds["uint8"]).mean())
    print(f"argmax agreement uint8 vs bf16: {agree:.4%}", flush=True)


if __name__ == "__main__":
    main()
