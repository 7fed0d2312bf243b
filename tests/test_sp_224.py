"""Multi-device value parity at the PUBLISHED 224² geometry (VERDICT r3 #5).

The GSPMD silent-corruption bugs this repo bisected (|Δlogit| 0.73 and
0.45 — see parallel/mesh.py and models/bridge.py) were shape-dependent
sharding-propagation bugs; the 32² parity tests in test_sp_remat.py do not
cover the published bridge token splits (3136/1568/980/392). This test
compiles and RUNS the 224² forward under the dp4×tp2 CPU mesh with bridge
sequence parallelism on, and asserts logits parity against the unsharded
model on one real batch.

Reference geometry: networks/MSTr.py:2394-2397 (hardcoded 224 splits).
Marked slow: two 224² fp32 forwards + their SPMD compiles on the 1-CPU
host (~minutes; cached reruns are fast).
"""

import dataclasses

import jax
import numpy as np
import pytest

from conftest import tiny_config
from transception_tpu.core.config import TrainConfig
from transception_tpu.models.transception import MSTransception
from transception_tpu.parallel.mesh import batch_sharding, shard_params
from transception_tpu.train.state import create_train_state
from transception_tpu.train.trainer import make_train_step


@pytest.mark.slow
def test_sp_tp_224_forward_matches_unsharded(cpu_mesh):
    cfg = tiny_config(img_size=224)
    cfg_sp = dataclasses.replace(cfg, bridge_seq_shard_axis="model")
    rng = np.random.default_rng(7)
    x = np.asarray(rng.random((4, 224, 224, 1)), np.float32)
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
    assert np.isfinite(out).all()
    # Tolerance covers GSPMD partial-sum reduction order only; the
    # bisected miscompiles were |Δ| ~0.45-0.73 and would fail loudly.
    np.testing.assert_allclose(out, base, rtol=1e-4, atol=5e-5)


@pytest.mark.slow
def test_sp_tp_224_train_step_matches_unsharded(cpu_mesh):
    """One dp4×tp2 (+bridge-SP) TRAIN step at the published 224² geometry
    (VERDICT r4 #3): the bisected GSPMD value bugs were shape-dependent
    and the backward has its own sharding propagation, so the 32² sharded
    train-step coverage (test_wide_head.py, __graft_entry__ dryrun) does
    not close this. Asserts loss AND every updated-param leaf match the
    unsharded step (one SGD step = init - lr·grad, so any sharded-grad
    corruption lands in the params). wide_head=True mirrors the Trainer's
    default loss layout. Reference geometry: networks/MSTr.py:2394-2397."""
    cfg = tiny_config(img_size=224)
    cfg_sp = dataclasses.replace(cfg, bridge_seq_shard_axis="model")
    rng = np.random.default_rng(11)
    x = np.asarray(rng.random((4, 224, 224, 1)), np.float32)
    y = np.asarray(rng.integers(0, cfg.num_classes, (4, 224, 224)), np.int32)
    tcfg = TrainConfig(batch_size=4, dp_size=4, tp_size=2, max_epochs=1)

    def one_step(model, mesh):
        state = create_train_state(model, tcfg, steps_per_epoch=4,
                                   sample_batch=x,
                                   rng=jax.random.PRNGKey(0))
        init = jax.device_get(state.params)
        step = make_train_step(model, cfg.num_classes, 0.4, 0.6,
                               wide_head=True)
        if mesh is None:
            state, m = jax.jit(step)(state, x, y, jax.random.PRNGKey(1))
        else:
            with jax.set_mesh(mesh):
                state = state.replace(params=shard_params(state.params,
                                                           mesh))
                ds = batch_sharding(mesh)
                state, m = jax.jit(step)(state, jax.device_put(x, ds),
                                         jax.device_put(y, ds),
                                         jax.random.PRNGKey(1))
        upd = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                           jax.device_get(state.params), init)
        return upd, {k: float(v) for k, v in m.items()}

    u0, m0 = one_step(MSTransception(cfg), None)
    u1, m1 = one_step(MSTransception(cfg_sp), cpu_mesh)
    assert np.isfinite(m1["loss"])
    np.testing.assert_allclose(m1["loss"], m0["loss"], rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(u0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(u1))
    assert len(flat0) == len(flat1)
    # Compare the SGD UPDATES (new - init). Tolerance has two regimes:
    # 2% of the leaf's own max|update| for significant leaves, floored at
    # 1% of the GLOBAL max|update| for near-zero-gradient leaves — a
    # depthwise conv feeding straight into BatchNorm has a BN-invariant
    # kernel scale, so its gradient is pure cancellation residue
    # (measured: stage-2 inv_res dwconv update 2.8e-4 with 100%
    # reassociation noise) and GSPMD's different reduction order
    # legitimately perturbs all of it. The bisected miscompile class
    # (|Δ|~0.7 activations) corrupts updates at the global scale and
    # fails both regimes loudly.
    global_scale = max(np.abs(u).max() for _, u in flat0)
    for path, upd in flat0:
        scale = np.abs(upd).max()
        diff = np.abs(upd - flat1[path]).max()
        tol = max(0.02 * scale, 0.01 * global_scale)
        assert diff <= tol, (
            f"{jax.tree_util.keystr(path)}: max|Δupdate| {diff:.3e} vs "
            f"tol {tol:.3e} (leaf scale {scale:.3e}, "
            f"global {global_scale:.3e})")
