"""Training CLI — the train_MSTransception.py equivalent.

    python -m transception_tpu.cli.train --dataset Synapse \
        --root_path .../train_npz --test_path .../test_vol_h5 \
        --batch_size 16 --base_lr 0.05 --max_epochs 500

Differences from the reference CLI: --accumulation_steps / resume / bf16
actually work (they were dead flags, train_MSTransception.py:66-74), the
mesh knobs (--dp_size/--tp_size) select real GSPMD sharding, and --profile
captures a TensorBoard trace.
"""

from __future__ import annotations

import argparse
import logging

from transception_tpu.cli.common import (
    add_data_args,
    add_model_args,
    add_train_args,
    build_configs,
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    add_data_args(p)
    add_train_args(p)
    p.add_argument("--throughput", action="store_true",
                   help="measure train-step imgs/sec and exit (the "
                        "reference parsed-but-dead flag, made real)")
    args = p.parse_args(argv)

    import jax
    from transception_tpu.cli.common import setup_jax_cache
    from transception_tpu.models.registry import create_model
    from transception_tpu.train.trainer import Trainer

    setup_jax_cache()
    model_cfg, data_cfg, train_cfg = build_configs(args)
    model = create_model(args.model, model_cfg)

    if args.throughput:
        import time
        import jax.numpy as jnp
        from transception_tpu.train.state import create_train_state
        from transception_tpu.train.trainer import make_train_step
        b = train_cfg.batch_size
        x = jnp.zeros((b, args.img_size, args.img_size, 1), jnp.float32)
        y = jnp.zeros((b, args.img_size, args.img_size), jnp.int32)
        state = create_train_state(model, train_cfg, 100, x,
                                   jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, model_cfg.num_classes,
                                       train_cfg.ce_weight,
                                       train_cfg.dice_weight),
                       donate_argnums=(0,))
        state, m = step(state, x, y, jax.random.PRNGKey(1))
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(20):
            state, m = step(state, x, y, jax.random.PRNGKey(1))
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / 20
        print(f"train throughput: {b / dt:.1f} imgs/s "
              f"({dt * 1000:.1f} ms/step at batch {b})")
        return None, None

    trainer = Trainer(model_cfg, train_cfg, data_cfg, model=model)

    if args.profile:
        jax.profiler.start_trace(f"{train_cfg.output_dir}/profile")
        try:
            state, hist = trainer.train(max_steps=args.max_steps or 10)
        finally:
            jax.profiler.stop_trace()
    else:
        state, hist = trainer.train(max_steps=args.max_steps)
    logging.getLogger("transception_tpu").info("Training Finished!")
    return state, hist


if __name__ == "__main__":
    main()
