"""Serving export: serialize -> file -> deserialize -> identical outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config
from transception_tpu.models.transception import MSTransception
from transception_tpu.serve.export import (
    export_model,
    load_exported,
    save_exported,
)


def test_export_roundtrip(tmp_path):
    cfg = tiny_config()
    model = MSTransception(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 1)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    want = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x))

    blob = export_model(model, variables, batch=2, img_size=32, in_ch=1,
                        platforms=["cpu"])
    path = tmp_path / "model.txtpu"
    save_exported(str(path), blob)
    fn = load_exported(str(path))
    got = np.asarray(fn(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_rejects_garbage(tmp_path):
    p = tmp_path / "bad.txtpu"
    p.write_bytes(b"nonsense")
    import pytest
    with pytest.raises(ValueError):
        load_exported(str(p))


def test_cli_export_smoke(tmp_path):
    """End-to-end: export CLI from an orbax checkpoint to an artifact."""
    import argparse
    import os

    import orbax.checkpoint as ocp

    from transception_tpu.cli.common import add_data_args, add_model_args, build_configs
    from transception_tpu.cli.export import main
    from transception_tpu.models.registry import create_model

    flags = ["--dataset", "synthetic", "--img_size", "32",
             "--dtype", "float32", "--no_pallas",
             "--num_layers", "1,1,1", "--num_path", "2,2,2",
             "--stage1_layers", "1"]
    p = argparse.ArgumentParser()
    add_model_args(p)
    add_data_args(p)
    cfg, _, _ = build_configs(p.parse_args(flags))
    model = create_model("mstransception", cfg)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    ckpt = os.path.abspath(tmp_path / "ckpt")
    ocp.StandardCheckpointer().save(
        ckpt, {"params": jax.device_get(v["params"]),
               "batch_stats": jax.device_get(v.get("batch_stats", {}))})

    out = tmp_path / "model.stablehlo"
    main(flags + ["--weight_pth", ckpt, "--out", str(out),
                  "--export_batch", "2", "--platforms", "cpu"])
    fn = load_exported(str(out))
    y = np.asarray(fn(jnp.zeros((2, 32, 32, 1), jnp.float32)))
    assert y.shape == (2, 32, 32, cfg.num_classes)
