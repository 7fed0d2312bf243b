"""vectorize_paths: the vmapped path-stacked encoder must match the
sequential layout exactly (same math, different param tree)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config
from transception_tpu.models.msvit import MHCAStage
from transception_tpu.models.transception import MSTransception


def _stack_params(seq_params, num_path):
    """sequential mhca_blks_{i} trees -> stacked mhca_blks_stacked tree."""
    out = {k: v for k, v in seq_params.items()
           if not k.startswith("mhca_blks_")}
    per_path = [seq_params[f"mhca_blks_{i}"] for i in range(num_path)]
    out["mhca_blks_stacked"] = jax.tree_util.tree_map(
        lambda *a: jnp.stack(a), *per_path)
    return out


def test_stage_vectorized_matches_sequential():
    P, dim, out_dim = 3, 32, 64
    seq = MHCAStage(dim, out_dim, num_layers=2, num_heads=8, mlp_ratio=2,
                    num_path=P, concat="coord", dtype=jnp.float32)
    vec = dataclasses.replace(seq, vectorize_paths=True)
    rng = np.random.default_rng(0)
    inputs = [jnp.asarray(rng.normal(size=(2, 8, 8, dim)), jnp.float32)
              for _ in range(P)]
    v_seq = jax.jit(seq.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), inputs, train=False)
    stacked_params = _stack_params(v_seq["params"], P)
    v_vec = {"params": stacked_params,
             "batch_stats": v_seq.get("batch_stats", {})}
    a = jax.jit(lambda v, x: seq.apply(v, x, train=False))(v_seq, inputs)
    b = jax.jit(lambda v, x: vec.apply(v, x, train=False))(v_vec, inputs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_full_model_vectorized_runs_and_trains():
    cfg = tiny_config(vectorize_paths=True)
    model = MSTransception(cfg)
    x = jnp.ones((2, 32, 32, 1), jnp.float32)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    assert any("mhca_blks_stacked" in "/".join(map(str, p))
               for p in [jax.tree_util.tree_leaves_with_path(v["params"])[0][0]]
               ) or True  # structural presence checked below
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    paths = ["/".join(str(getattr(k, "key", k)) for k in kp)
             for kp, _ in flat]
    assert any("mhca_blks_stacked" in p for p in paths)
    out, updates = jax.jit(lambda v, x: model.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)}))(v, x)
    assert out.shape == (2, 32, 32, 9)


def test_converter_handles_stacked_layout():
    """Converting the same torch weights into both layouts must give
    matching model outputs."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from reference_shim import load_reference_mstr
    mstr = load_reference_mstr()
    if mstr is None:
        import pytest
        pytest.skip("reference not importable")
    import torch
    from transception_tpu.convert.torch2flax import convert_state_dict
    from transception_tpu.core.config import TransceptionConfig
    torch.manual_seed(0)
    ref = mstr.MSTransception(num_classes=9).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 224, 224, 1)).astype(np.float32))
    outs = {}
    for vecp in (False, True):
        cfg = TransceptionConfig(dtype="float32", use_pallas=False,
                                 vectorize_paths=vecp)
        m = MSTransception(cfg)
        v = jax.jit(m.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), x, train=False)
        cv, _ = convert_state_dict(sd, v)
        outs[vecp] = np.asarray(
            jax.jit(lambda v, x: m.apply(v, x, train=False))(cv, x))
    np.testing.assert_allclose(outs[False], outs[True], rtol=1e-4, atol=1e-4)
