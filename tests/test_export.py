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
