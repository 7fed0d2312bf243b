"""Serving-export CLI: bake trained weights into a StableHLO artifact.

    python -m transception_tpu.cli.export --weight_pth path/to/ckpt \
        --out model.stablehlo --export_batch 32 [--platforms tpu,cpu]

The artifact (serve/export.py) is deployable without the model source:
`load_exported(path)` returns a jit-callable forward. The reference has
no serving story at all (SURVEY §5); this is the deployment path.

--plain_xla exports without the custom Pallas kernels so the artifact
lowers on any listed platform (the TPU kernels only lower on TPU).
"""

from __future__ import annotations

import argparse
import logging

from transception_tpu.cli.common import add_data_args, add_model_args, build_configs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    add_data_args(p)
    p.add_argument("--weight_pth", type=str, required=True,
                   help=".pth (auto-converted) or orbax checkpoint dir")
    p.add_argument("--out", type=str, required=True,
                   help="output artifact path (e.g. model.stablehlo)")
    p.add_argument("--export_batch", type=int, default=32)
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated lowering targets, e.g. 'tpu,cpu' "
                        "(default: the current backend only)")
    p.add_argument("--plain_xla", action="store_true",
                   help="export without custom Pallas kernels (portable "
                        "across the listed platforms)")
    args = p.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    from transception_tpu.cli.common import setup_jax_cache
    from transception_tpu.cli.test import load_weights
    from transception_tpu.models.registry import create_model
    from transception_tpu.serve.export import export_model, save_exported

    setup_jax_cache()
    logging.basicConfig(level=logging.INFO)
    model_cfg, _, _ = build_configs(args)
    if args.plain_xla:
        model_cfg = dataclasses.replace(model_cfg, use_pallas=False)
    model = create_model(args.model, model_cfg)

    x = jnp.zeros((1, args.img_size, args.img_size, 1), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    variables = load_weights(args.weight_pth, model, variables)

    platforms = args.platforms.split(",") if args.platforms else None
    data = export_model(model, variables, args.export_batch, args.img_size,
                        platforms=platforms)
    save_exported(args.out, data)
    logging.info("wrote %s (%d bytes, batch=%d, img=%d, platforms=%s)",
                 args.out, len(data), args.export_batch, args.img_size,
                 platforms or "current")
    return args.out


if __name__ == "__main__":
    main()
