"""Per-op / per-component device-time profile of the b=128 forward.

Captures a jax.profiler trace of the flagship argmax forward on the TPU,
parses the device xplane's "XLA Ops" line, and prints:
  1. the top ops by total device time (with bytes_accessed and achieved
     HBM bandwidth where the stats carry them),
  2. device time aggregated by model component (flax scope prefix from
     the op's tf_op/op_name attribution).

This is the measurement tool behind README "Per-component device time";
wall-clock through the tunnel is unreliable (CLAUDE.md), so everything
here is trace-derived.

Usage: python scripts/profile_forward.py [batch] [--train]
"""

from __future__ import annotations

import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def collect_ops(trace_dir: str):
    """Parse XLA Ops events incl. per-event stats (tf_op, bytes)."""
    import glob
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        return None
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    ops = {}
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        smeta = plane.stat_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                stats = {}
                for st in ev.stats:
                    key = smeta[st.metadata_id].name
                    val = (st.str_value or st.int64_value or st.uint64_value
                           or st.double_value)
                    stats[key] = val
                rec = ops.setdefault(name, {
                    "t": 0.0, "n": 0, "bytes": 0.0,
                    "tf_op": stats.get("tf_op", ""),
                    "long_name": stats.get("long_name", ""),
                })
                rec["t"] += ev.duration_ps / 1e12
                rec["n"] += 1
                try:
                    rec["bytes"] += float(stats.get("bytes_accessed", 0) or 0)
                except (TypeError, ValueError):
                    pass
    return ops


_COMPONENT_PATTERNS = [
    ("stage1", r"(patch_embed1|block1|norm1_stage|stage1)"),
    ("mhca_stage2", r"(mhca_stage1/|patch_embed_stages_0|mhca_stages_0)"),
    ("mhca_stage3", r"(mhca_stage2/|patch_embed_stages_1|mhca_stages_1)"),
    ("mhca_stage4", r"(mhca_stage3/|patch_embed_stages_2|mhca_stages_2)"),
    ("bridge", r"bridge"),
    ("decoder_3", r"decoder_3|decoders_0"),
    ("decoder_2", r"decoder_2|decoders_1"),
    ("decoder_1", r"decoder_1|decoders_2"),
    ("decoder_0", r"decoder_0|decoders_3|last_layer"),
]


def component_of(tf_op: str) -> str:
    for comp, pat in _COMPONENT_PATTERNS:
        if re.search(pat, tf_op):
            return comp
    return "other"


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    batch = 128
    train = "--train" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        batch = int(args[0])

    from transception_tpu.core.config import TransceptionConfig
    from transception_tpu.models.transception import MSTransception

    cfg = TransceptionConfig()
    if "--no-attn-fold" in sys.argv:
        # The fold-attribution sweep (scripts/measure_folds.py) measured
        # the bridge-attention fold as a small LOSS at b=128; profile the
        # without-it graph to find the next target.
        import dataclasses as dc
        cfg = dc.replace(cfg, bridge_attn_fold=False)
    if "--block-fold" in sys.argv:
        # Whole-block MHCA kernel engaged (stages 2-3) for attribution.
        import dataclasses as dc
        cfg = dc.replace(cfg, mhca_block_fold=True)
    model = MSTransception(cfg)
    x = jnp.zeros((batch, 224, 224, 1), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)

    if train:
        from transception_tpu.core.config import TrainConfig
        from transception_tpu.train.state import create_train_state
        from transception_tpu.train.trainer import (
            make_train_step,
            train_step_model,
        )
        tmodel = train_step_model(model)
        y = jnp.zeros((batch, 224, 224), jnp.int32)
        state = create_train_state(tmodel, TrainConfig(batch_size=batch),
                                   92, x, jax.random.PRNGKey(0))
        # Wide-layout loss to match the Trainer (pass --std-head for the
        # standard post-shuffle head).
        step = jax.jit(make_train_step(tmodel, 9, 0.4, 0.6,
                                       wide_head="--std-head"
                                       not in sys.argv),
                       donate_argnums=(0,))
        state, m = step(state, x, y, jax.random.PRNGKey(1))
        jax.block_until_ready(m)
        holder = {"s": state}

        def call():
            holder["s"], mm = step(holder["s"], x, y, jax.random.PRNGKey(2))
            return mm
    else:
        use_fused = "--logits" not in sys.argv

        def fwd(v, x):
            if use_fused:
                return model.apply(v, x, train=False, argmax=True)
            return jnp.argmax(model.apply(v, x, train=False),
                              axis=-1).astype(jnp.uint8)
        compiled = jax.jit(fwd).lower(variables, x).compile()
        compiled(variables, x).block_until_ready()

        def call():
            return compiled(variables, x)

    trace_dir = "/tmp/profile_forward_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    try:
        for _ in range(3):
            out = call()
        jax.block_until_ready(out)
    finally:
        jax.profiler.stop_trace()

    ops = collect_ops(trace_dir)
    if ops is None:
        print("no device trace captured")
        return
    iters = 3
    total = sum(r["t"] for r in ops.values()) / iters
    print(f"\n=== total device time: {total * 1e3:.1f} ms/call "
          f"({batch} slices -> {batch / total:.0f} slices/s) ===\n")

    rows = sorted(ops.items(), key=lambda kv: -kv[1]["t"])
    print(f"{'ms':>8} {'GB':>7} {'GB/s':>6}  op / tf_op")
    for name, r in rows[:160]:
        t = r["t"] / iters
        gb = r["bytes"] / iters / 1e9
        bw = (gb / t) if t > 0 else 0
        print(f"{t * 1e3:8.2f} {gb:7.2f} {bw:6.0f}  {name}  "
              f"[{r['tf_op'][:110]}]")

    # fp32-materialization audit: any op whose HLO result is a large f32
    # tensor writes 2x the bytes a bf16 residual stream would (VERDICT r3
    # #1: "audit for fp32 materializations at layer boundaries").
    sig = re.compile(r"= (f32|bf16|u8|s8|s32|u32|pred)\[([\d,]*)\]")
    by_dtype = {}
    f32_rows = []
    for name, r in ops.items():
        m = sig.search(name)
        if not m:
            continue
        dt, dims = m.groups()
        elems = 1
        for d in dims.split(","):
            if d:
                elems *= int(d)
        width = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2,
                 "u8": 1, "s8": 1, "pred": 1}[dt]
        out_gb = elems * width / 1e9
        d = by_dtype.setdefault(dt, {"t": 0.0, "out_gb": 0.0, "n": 0})
        d["t"] += r["t"] / iters
        d["out_gb"] += out_gb * r["n"] / iters
        d["n"] += 1
        if dt in ("f32", "s32") and out_gb * r["n"] / iters > 0.01:
            f32_rows.append((out_gb * r["n"] / iters, r["t"] / iters, name))
    print("\n=== by result dtype (time / output GB written) ===")
    for dt, d in sorted(by_dtype.items(), key=lambda kv: -kv[1]["t"]):
        print(f"{d['t'] * 1e3:8.2f} ms {d['out_gb']:7.2f} GB out "
              f"({d['n']} ops)  {dt}")
    if f32_rows:
        print("\n=== fp32/int32 materializations > 10 MB/call ===")
        for gb, t, name in sorted(f32_rows, reverse=True)[:20]:
            print(f"{gb * 1e3:8.1f} MB {t * 1e3:7.2f} ms  {name[:160]}")

    print("\n=== by component ===")
    comp = {}
    for name, r in ops.items():
        c = component_of(r["tf_op"] or name)
        d = comp.setdefault(c, {"t": 0.0, "bytes": 0.0})
        d["t"] += r["t"] / iters
        d["bytes"] += r["bytes"] / iters
    for c, d in sorted(comp.items(), key=lambda kv: -kv[1]["t"]):
        bw = d["bytes"] / 1e9 / d["t"] if d["t"] else 0
        print(f"{d['t'] * 1e3:8.2f} ms {d['bytes'] / 1e9:7.2f} GB "
              f"{bw:6.0f} GB/s  {c}")


if __name__ == "__main__":
    main()
