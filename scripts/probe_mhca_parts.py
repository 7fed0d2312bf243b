"""Stripped-kernel attribution of the whole-block MHCA kernel.

Times fused_mhca_block standalone at the two production geometries
(stage-2: s=28 C=64 h8 hidden=256; stage-3: s=14 C=128 h8 hidden=512,
both at the vmapped grid 3x128) with pieces of the block compiled out
(strip sets), to locate where the 6.38 / 2.38 ms per call go before
optimizing. Deltas, not absolutes, are the signal (stripping changes
Mosaic's scheduling).

Usage: python scripts/probe_mhca_parts.py [stage2|stage3 ...]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

GEOMS = {
    "stage2": dict(B=384, s=28, C=64, heads=8, hidden=256),
    "stage3": dict(B=384, s=14, C=128, heads=8, hidden=512),
}

STRIPS = [
    ("full", frozenset()),
    ("-cpe", frozenset({"cpe"})),
    ("-crpe", frozenset({"crpe"})),
    ("-ffn", frozenset({"ffn"})),
    ("-attn", frozenset({"attn"})),
    ("-attn-ffn", frozenset({"attn", "ffn"})),
    ("bf16taps", frozenset({"bf16taps"})),
]


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from transception_tpu.ops.pallas.mhca_block_kernel import fused_mhca_block
    from transception_tpu.utils.profiling import device_time_per_call

    names = [a for a in sys.argv[1:] if a in GEOMS] or list(GEOMS)
    key = jax.random.PRNGKey(0)
    window = ((3, 2), (5, 3), (7, 3))
    for gname in names:
        g = GEOMS[gname]
        B, s, C, heads, hidden = (g[k] for k in ("B", "s", "C", "heads",
                                                 "hidden"))
        N = s * s
        dt = jnp.bfloat16
        ks = iter(jax.random.split(key, 32))
        r = lambda *sh: (jax.random.normal(next(ks), sh, jnp.float32)  # noqa: E731
                         * 0.05)
        x = r(B, N, C).astype(dt)
        crpe_ks = tuple(r(w, w, 1, h * (C // heads)) for w, h in window)
        crpe_bs = tuple(r(h * (C // heads)) for w, h in window)
        args = (x, r(3, 3, 1, C), r(C), r(C), r(C), r(C, 3 * C), r(3 * C),
                crpe_ks, crpe_bs, r(C, C), r(C), r(C), r(C),
                r(C, hidden), r(hidden), r(3, 3, 1, hidden), r(hidden),
                r(hidden), r(hidden), r(hidden, C), r(C))
        base = None
        for sname, strip in STRIPS:
            fn = functools.partial(fused_mhca_block, s=s, heads=heads,
                                   hidden=hidden, window=window, strip=strip)
            try:
                out = fn(*args)
                out.block_until_ready()
            except Exception as e:  # noqa: BLE001
                print(f"{gname} {sname:>10}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            t, _ = device_time_per_call(lambda: fn(*args), iters=10)
            if t is None:
                print(f"{gname} {sname:>10}: no trace", flush=True)
                continue
            ms = t * 1e3
            if sname == "full":
                base = ms
            delta = f"  (delta {base - ms:+.2f} ms)" if base and sname != \
                "full" else ""
            print(f"{gname} {sname:>10}: {ms:7.3f} ms{delta}", flush=True)


if __name__ == "__main__":
    main()
