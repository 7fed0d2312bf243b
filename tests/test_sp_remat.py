"""Sequence parallelism (bridge) and rematerialization coverage
(VERDICT r1 weak #4).

SP: a train step with bridge_seq_shard_axis='model' on a 4x2 CPU mesh must
be loss-identical to the unsharded model (the constraints only relocate
compute), and the lowered SPMD module must not fall back to full
replication of the sharded FFN inputs.

remat: remat=True must produce bit-comparable forward logits and gradients
to remat=False (same math, recomputed activations).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config
from transception_tpu.core.config import TrainConfig
from transception_tpu.models.transception import MSTransception
from transception_tpu.parallel.mesh import batch_sharding, shard_params
from transception_tpu.train.state import create_train_state
from transception_tpu.train.trainer import make_train_step


def _batch(rng_seed=0, b=8, s=32):
    rng = np.random.default_rng(rng_seed)
    x = jnp.asarray(rng.random((b, s, s, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 9, (b, s, s)), jnp.int32)
    return x, y


def _one_step_loss(cfg, mesh=None, tp=1):
    model = MSTransception(cfg)
    tcfg = TrainConfig(batch_size=8, dp_size=(8 // tp if mesh else 1),
                       tp_size=tp, max_epochs=1)
    x, y = _batch()
    if mesh is None:
        state = create_train_state(model, tcfg, steps_per_epoch=4,
                                   sample_batch=x, rng=jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, cfg.num_classes, 0.4, 0.6))
        _, metrics = step(state, x, y, jax.random.PRNGKey(1))
        return float(metrics["loss"])
    with jax.set_mesh(mesh):
        state = create_train_state(model, tcfg, steps_per_epoch=4,
                                   sample_batch=x, rng=jax.random.PRNGKey(0))
        state = state.replace(params=shard_params(state.params, mesh))
        ds = batch_sharding(mesh)
        xb = jax.device_put(x, ds)
        yb = jax.device_put(y, ds)
        step = jax.jit(make_train_step(model, cfg.num_classes, 0.4, 0.6))
        _, metrics = step(state, xb, yb, jax.random.PRNGKey(1))
        return float(metrics["loss"])


def test_sp_train_step_matches_unsharded(cpu_mesh):
    """bridge_seq_shard_axis='model' on a dpxtp mesh computes the same loss
    as the unsharded model (fp32, tolerance covers collective reduction
    order)."""
    cfg = tiny_config()
    cfg_sp = dataclasses.replace(cfg, bridge_seq_shard_axis="model")
    base = _one_step_loss(cfg)
    sp = _one_step_loss(cfg_sp, mesh=cpu_mesh, tp=2)
    assert np.isfinite(sp)
    np.testing.assert_allclose(sp, base, rtol=2e-5)


def test_sp_forward_matches_unsharded_exactly(cpu_mesh):
    """Pure forward: SP constraints must not change the numerics."""
    cfg = tiny_config()
    cfg_sp = dataclasses.replace(cfg, bridge_seq_shard_axis="model")
    x, _ = _batch(3)
    model = MSTransception(cfg)
    model_sp = MSTransception(cfg_sp)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    base = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(v, x))
    with jax.set_mesh(cpu_mesh):
        vs = shard_params(v, cpu_mesh)
        xb = jax.device_put(x, batch_sharding(cpu_mesh))
        out = np.asarray(jax.jit(
            lambda v, x: model_sp.apply(v, x, train=False))(vs, xb))
    # tolerance covers GSPMD partial-sum reduction order (measured ~1e-5);
    # anything beyond that is a value bug (caught one in r2: see
    # parallel/mesh.py _TP_RULES note).
    np.testing.assert_allclose(out, base, rtol=1e-4, atol=5e-5)


def test_sp_no_involuntary_replication(cpu_mesh):
    """The sharded-FFN/attention constraints must survive SPMD
    partitioning: the partitioned executable's per-device FLOPs must be
    strictly lower with SP on than off (same mesh, same batch sharding).
    The r1 failure mode — GSPMD replicating the constrained tensor
    ('involuntary full rematerialization') — would leave per-device FLOPs
    identical."""
    cfg_base = tiny_config()
    cfg_sp = dataclasses.replace(cfg_base, bridge_seq_shard_axis="model")
    x, _ = _batch(1)

    def per_device_flops(cfg):
        model = MSTransception(cfg)
        with jax.set_mesh(cpu_mesh):
            v = jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), x, train=False)
            xb = jax.device_put(x, batch_sharding(cpu_mesh))
            lowered = jax.jit(
                lambda v, x: model.apply(v, x, train=False)).lower(v, xb)
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return float(ca["flops"])

    base = per_device_flops(cfg_base)
    sp = per_device_flops(cfg_sp)
    # SP shards the bridge FFNs (scales with side % 2 == 0) and attention
    # rows over the 2-way model axis; per-device FLOPs must drop.
    assert sp < base * 0.999, (sp, base)


def test_bridge_barrier_rejects_non_divisible_batch(cpu_mesh):
    """The bridge's batch-only sharding barrier guards a known GSPMD
    silent-corruption bug; a mesh whose data axis does not divide the
    batch cannot be barriered, so it must be rejected loudly instead of
    silently dropping the guard (ADVICE r2 medium)."""
    import pytest

    cfg = tiny_config()
    x = jnp.asarray(np.random.default_rng(0).random((6, 32, 32, 1)),
                    jnp.float32)  # 6 % 4 != 0 on the 4x2 mesh
    model = MSTransception(cfg)
    with jax.set_mesh(cpu_mesh):
        with pytest.raises(ValueError, match="divisible"):
            jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), x, train=False)


def test_padded_bridge_grads_match_unpadded():
    """use_pallas=True pads the bridge token stream (BridgeBlock4); tail
    rows must not leak into gradients either — grads of the same loss
    through the padded and unpadded graphs must match (CPU: kernels fall
    back to XLA, so the only difference is the padding restructure)."""
    cfg = tiny_config()
    cfg_pad = dataclasses.replace(cfg, use_pallas=True)
    x, _ = _batch(9)
    model = MSTransception(cfg)
    model_pad = MSTransception(cfg_pad)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)

    def loss(m):
        def f(params, batch_stats, x):
            o, _ = m.apply({"params": params, "batch_stats": batch_stats},
                           x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(7)})
            return jnp.mean((o - 1.0) ** 2)
        return f

    g = jax.jit(jax.grad(loss(model)))(v["params"], v["batch_stats"], x)
    g_pad = jax.jit(jax.grad(loss(model_pad)))(v["params"],
                                               v["batch_stats"], x)
    flat = jax.tree_util.tree_leaves(g)
    flat_pad = jax.tree_util.tree_leaves(g_pad)
    assert len(flat) == len(flat_pad)
    for a, b in zip(flat, flat_pad):
        # use_pallas=True also engages the bridge LN/attention folds (r3),
        # whose relocated fp32 reductions shift grads by ~1 ULP; real tail
        # leakage would be orders of magnitude above this tolerance.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_remat_forward_and_grads_match():
    """remat=True (jax.checkpoint on encoder stages) recomputes activations
    but must match remat=False forward and grads."""
    cfg = tiny_config()
    cfg_rm = dataclasses.replace(cfg, remat=True)
    x, y = _batch(5)
    model = MSTransception(cfg)
    model_rm = MSTransception(cfg_rm)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)

    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    out_rm = jax.jit(lambda v, x: model_rm.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_rm),
                               rtol=1e-6, atol=1e-6)

    def loss(m):
        def f(params, batch_stats, x):
            o, _ = m.apply({"params": params, "batch_stats": batch_stats},
                           x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(7)})
            return jnp.mean((o - 1.0) ** 2)
        return f

    g = jax.jit(jax.grad(loss(model)))(v["params"], v["batch_stats"], x)
    g_rm = jax.jit(jax.grad(loss(model_rm)))(v["params"], v["batch_stats"], x)
    flat = jax.tree_util.tree_leaves(g)
    flat_rm = jax.tree_util.tree_leaves(g_rm)
    assert len(flat) == len(flat_rm)
    for a, b in zip(flat, flat_rm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)
