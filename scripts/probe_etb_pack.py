"""Device probe: lane-packed vs unpacked folded ETB attention kernel at
the production geometry (B=128, N=3136, C=64 — stage-1/decoder blocks).

The packed variant doubles per-row VMEM (fp32 temporaries at (N, 2C));
Mosaic's scoped-vmem stack may reject it — this probe is the compile
check as well as the timing.

Usage: python scripts/probe_etb_pack.py [B N C]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import numpy as np

    from transception_tpu.ops.pallas.linear_attention_kernel import (
        efficient_attention_block_folded as f,
    )
    from transception_tpu.utils.profiling import device_time_per_call

    a = [int(v) for v in sys.argv[1:4]] or [128, 3136, 64]
    B, N, C = a + [128, 3136, 64][len(a):]
    rng = np.random.default_rng(0)
    r = lambda *sh: jnp.asarray(rng.standard_normal(sh) * 0.05,  # noqa: E731
                                jnp.float32)
    x = r(B, N, C).astype(jnp.bfloat16)
    args = (x, r(C), r(C), r(C, C), r(C), r(C, C), r(C), r(C, C), r(C),
            r(C, C), r(C))
    outs = {}
    for pack in (1, 2):
        try:
            out = f(*args, pack=pack)
            out.block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(f"pack={pack}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        outs[pack] = np.asarray(out, np.float32)
        t, _ = device_time_per_call(lambda: f(*args, pack=pack), iters=10)
        print(f"pack={pack}: {t * 1e3:7.3f} ms", flush=True)
    if len(outs) == 2:
        d = np.abs(outs[1] - outs[2]).max()
        print(f"max|pack2 - pack1| = {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
