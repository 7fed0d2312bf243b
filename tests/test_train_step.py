"""Training-step tests: loss decreases, BN stats update, sharded execution
on a virtual 8-device CPU mesh, grad accumulation, schedules."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from conftest import tiny_config
from transception_tpu.core.config import TrainConfig
from transception_tpu.models.transception import MSTransception
from transception_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
from transception_tpu.train.state import (
    create_train_state,
    make_lr_schedule,
    make_optimizer,
)
from transception_tpu.train.trainer import make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=8, base_lr=0.05, max_epochs=2)
    model = MSTransception(cfg)
    x = jnp.zeros((8, 32, 32, 1), jnp.float32)
    state = create_train_state(model, tcfg, steps_per_epoch=4,
                               sample_batch=x, rng=jax.random.PRNGKey(0))
    return cfg, tcfg, model, state


def test_train_step_runs_and_decreases_loss(setup):
    cfg, tcfg, model, state = setup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, 32, 32, 1)), jnp.float32)
    y = jnp.asarray((rng.random((8, 32, 32)) > 0.7).astype(np.int32))
    step = jax.jit(make_train_step(model, cfg.num_classes, 0.4, 0.6))
    losses = []
    for i in range(5):
        state, metrics = step(state, x, y, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5
    assert np.isfinite(losses).all()


def test_sharded_train_step(cpu_mesh):
    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=8, dp_size=4, tp_size=2, max_epochs=1)
    model = MSTransception(cfg)
    x = jnp.zeros((8, 32, 32, 1), jnp.float32)
    state = create_train_state(model, tcfg, steps_per_epoch=4,
                               sample_batch=x, rng=jax.random.PRNGKey(0))
    with cpu_mesh:
        state = state.replace(params=shard_params(state.params, cpu_mesh))
        ds = batch_sharding(cpu_mesh)
        xb = jax.device_put(x, ds)
        yb = jax.device_put(jnp.zeros((8, 32, 32), jnp.int32), ds)
        step = jax.jit(make_train_step(model, cfg.num_classes, 0.4, 0.6))
        state, metrics = step(state, xb, yb, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1


def test_cosine_schedule_matches_formula():
    tcfg = TrainConfig(base_lr=0.05, batch_size=24, max_epochs=10)
    sched = make_lr_schedule(tcfg, steps_per_epoch=10)
    total = 100
    for t in (0, 50, 99):
        want = 0.05 * 0.5 * (1 + np.cos(np.pi * t / total))
        assert abs(float(sched(t)) - want) < 1e-7


def test_poly_schedule():
    tcfg = TrainConfig(base_lr=0.05, batch_size=24, max_epochs=10,
                       use_scheduler=False)
    sched = make_lr_schedule(tcfg, steps_per_epoch=10)
    assert abs(float(sched(0)) - 0.05) < 1e-8
    want = 0.05 * (1 - 50 / 100) ** 0.9
    assert abs(float(sched(50)) - want) < 1e-7


def test_lr_scaling_rule():
    # batch 30 -> scaled; batch 24 -> base; batch 16 -> base (not %5==0).
    assert TrainConfig(base_lr=0.05, batch_size=30).scaled_lr() == pytest.approx(
        0.05 * 30 / 24)
    assert TrainConfig(base_lr=0.05, batch_size=24).scaled_lr() == 0.05
    assert TrainConfig(base_lr=0.05, batch_size=16).scaled_lr() == 0.05


def test_grad_accumulation_equivalence():
    """k micro-steps with MultiSteps == one step on the concatenated batch
    (for loss functions that average over the batch)."""
    params = {"w": jnp.ones((4,)) * 0.5}

    def loss_fn(p, x):
        return jnp.mean((x @ p["w"]) ** 2)

    tcfg_base = TrainConfig(base_lr=0.1, batch_size=24, max_epochs=1,
                            use_scheduler=False, weight_decay=0.0)
    tx_full, _ = make_optimizer(tcfg_base, steps_per_epoch=100)
    tcfg_acc = dataclasses.replace(tcfg_base, grad_accum_steps=2)
    tx_acc, _ = make_optimizer(tcfg_acc, steps_per_epoch=100)

    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    xb = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    xfull = jnp.concatenate([xa, xb])

    s_full = tx_full.init(params)
    g_full = jax.grad(loss_fn)(params, xfull)
    upd_full, _ = tx_full.update(g_full, s_full, params)
    p_full = optax.apply_updates(params, upd_full)

    s_acc = tx_acc.init(params)
    p_acc = params
    for x in (xa, xb):
        g = jax.grad(loss_fn)(p_acc, x)
        upd, s_acc = tx_acc.update(g, s_acc, p_acc)
        p_acc = optax.apply_updates(p_acc, upd)

    np.testing.assert_allclose(p_full["w"], p_acc["w"], rtol=1e-6)


def test_weight_decay_is_coupled_torch_style():
    """decay enters the momentum buffer like torch SGD (grad + wd*p)."""
    tcfg = TrainConfig(base_lr=1.0, batch_size=24, max_epochs=1,
                       use_scheduler=False, weight_decay=0.1, momentum=0.0)
    tx, _ = make_optimizer(tcfg, steps_per_epoch=10)
    params = {"w": jnp.asarray([2.0])}
    grads = {"w": jnp.asarray([1.0])}
    s = tx.init(params)
    upd, _ = tx.update(grads, s, params)
    # update = -lr * (grad + wd * p) = -(1 + 0.1*2) = -1.2
    np.testing.assert_allclose(upd["w"], [-1.2], rtol=1e-6)


def test_trainer_train_step_kernel_gating(tmp_path):
    """The trainer's train-step model keeps the bridge ATTENTION kernels on
    (they have a flash-style Pallas backward — a measured train-step win)
    while gating the bridge FFN kernels OFF (their custom-VJP backward
    loses to XLA's joint fwd+bwd; README perf ledger). The eval model is
    untouched. Guards the bridge_ffn_use_pallas plumbing end-to-end."""
    from transception_tpu.core.config import DataConfig
    from transception_tpu.train.trainer import Trainer
    cfg = tiny_config(use_pallas=True)
    tr = Trainer(cfg, TrainConfig(batch_size=2, output_dir=str(tmp_path)),
                 DataConfig(dataset="synthetic", synthetic_len=4))
    tm = tr.train_model.cfg
    assert tm.use_pallas is False
    assert tm.bridge_use_pallas is True
    assert tm.bridge_ffn_use_pallas is False
    assert tm.bridge_attn_fold is False  # fold's bwd would lose to flash
    assert tr.model.cfg.use_pallas is True  # eval model keeps all kernels


def test_bridge_ffn_pallas_override(monkeypatch):
    """BridgeLayer4.ffn_use_pallas=False keeps MixFFN_skip off the kernel
    path even when the layer's use_pallas is True; None follows
    use_pallas. Detected by whether the kernel gate (can_fuse) is ever
    consulted — the only entry to the fused path."""
    import transception_tpu.ops.pallas.mixffn as mixffn_mod
    from transception_tpu.models.bridge import BridgeGeometry, BridgeLayer4

    calls = []
    # Either kernel gate counts: plain (can_fuse) or the LN-folded one
    # (can_fuse_ln, consulted when ffn kernels are on and the bridge
    # folds norm2 into the FFNs).
    monkeypatch.setattr(mixffn_mod, "can_fuse",
                        lambda *a, **k: (calls.append(1), False)[1])
    monkeypatch.setattr(mixffn_mod, "can_fuse_ln",
                        lambda *a, **k: (calls.append(1), False)[1])
    geo = BridgeGeometry(32, (64, 128, 320, 512), 64)
    maps = [jnp.zeros((1, s, s, 64 * m), jnp.float32)
            for s, m in zip(geo.sides, geo.mults)]

    def init_layer(**kw):
        layer = BridgeLayer4(geo, 8, False, dtype=jnp.float32, **kw)
        layer.init(jax.random.PRNGKey(0), maps)

    init_layer(use_pallas=True, ffn_use_pallas=False)
    assert not calls  # FFN kernel gate never consulted
    init_layer(use_pallas=True, ffn_use_pallas=None)
    assert calls  # None -> follows use_pallas: gate consulted
